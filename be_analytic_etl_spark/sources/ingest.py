"""Messy-spreadsheet ingest: headerless wide files -> typed long fact table.

Re-expresses the reference's extract/transform chain
(``/root/reference/main.py:202-590``) as lazy DataFrame transforms:

    read headerless all-string                    (main.py:273,320)
    -> header-row discovery by marker             (main.py:202-218)  P5
    -> header promotion + slice                   (main.py:226-237)  P6
    -> metadata-row removal (pattern list)        (main.py:239-251)  P7
    -> drop all-null rows                         (main.py:254)      P8
    -> first-two-column rename                    (main.py:286-291)  P9
    -> date-column-name normalization             (main.py:398-428)  P10
    -> decimal-string tidy                        (main.py:431-479)  P11
    -> unpivot wide->long                         (main.py:482-518)  R1
    -> month parse, value parse (BR locale), service tag
                                                  (main.py:520-582)  R2-R4

Scale notes:
- Each raw file is small (a spreadsheet), so header discovery does one
  cheap action per file; the *fleet* of files is processed as independent
  lazy plans unioned on the fixed long schema (SURVEY §7.4.4: unpivot
  FIRST, then union — per-file month columns differ, the long schema
  doesn't).
- All value cleaning is native column expressions (codegen); the only
  pandas bridge is ODS parsing, which has no Spark source (SURVEY §7.3).
"""

from __future__ import annotations

import datetime as _dt
import io
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from be_analytic_etl_spark.functions import (
    br_number_to_double,
    strip_trailing_zeros,
)

#: Metadata phrases marking preamble rows to drop (main.py:240-243).
METADATA_PATTERNS = [
    "SERVIÇO:",
    "PERÍODO:",
    "FONTE:",
    "PARA MAIORES INFORMAÇÕES",
    "ÍNDICE DE DESEMPENHO NO ATENDIMENTO",
    "ANATEL",
]

#: Header-row discovery markers (main.py:215).
HEADER_MARKERS = ["GRUPO ECONÔMICO", "GRUPO_ECON"]

#: Encodings tried for CSV ingest, in order (main.py:315).
CSV_ENCODINGS = ["utf-8", "latin-1", "iso-8859-1", "cp1252"]

_ROWNUM = "__rownum"


def read_headerless_csv(
    spark: SparkSession, path: str, sep: str = "\t", encoding: str | None = None
) -> DataFrame:
    """All-string headerless CSV read with encoding fallback.

    Spark reads one charset per load, so we probe encodings with a cheap
    driver-side read of the first KB (SURVEY §7.4.6) and then issue a single
    correctly-configured distributed read.
    """
    enc = encoding or probe_encoding(path)
    return spark.read.csv(path, sep=sep, header=False, inferSchema=False, encoding=enc)


def read_typed_csv(
    spark: SparkSession, path: str, sep: str = ",", encoding: str = "utf-8"
) -> DataFrame:
    """S8: header CSV re-read with type inference — the consolidated-CSV
    reload step (``/root/reference/connect_postgre.py:224-226``,
    ``pd.read_csv`` with default dtype inference).

    Scale note: ``inferSchema`` costs one extra pass over the file; for
    repeated loads of a known table, pass an explicit schema via
    ``spark.read.schema(...)`` instead. Fine here — the reference reloads
    one consolidated export.
    """
    return spark.read.csv(
        path, sep=sep, header=True, inferSchema=True, encoding=encoding
    )


def probe_encoding(path: str, candidates: list[str] | None = None) -> str:
    """Pick the first encoding that decodes the file head cleanly.

    A multi-byte sequence cut by the 4 KiB probe window is not evidence
    against the encoding (UTF-8 code points span up to 4 bytes): a decode
    error confined to the last 3 bytes of the window is treated as a clean
    decode, so a valid UTF-8 file can't fall through to latin-1 (which
    never fails) and come back mojibake'd.
    """
    head = open(path, "rb").read(4096)
    for enc in candidates or CSV_ENCODINGS:
        try:
            head.decode(enc)
            return enc
        except UnicodeDecodeError as e:
            if len(head) == 4096 and e.start >= len(head) - 3:
                return enc
            continue
    return "utf-8"


_ODS_TABLE = "{urn:oasis:names:tc:opendocument:xmlns:table:1.0}"
_ODS_OFFICE = "{urn:oasis:names:tc:opendocument:xmlns:office:1.0}"
_ODS_TEXT = "{urn:oasis:names:tc:opendocument:xmlns:text:1.0}"


def _parse_ods(data: bytes) -> list[list[str | None]]:
    """Dependency-free ODS parse: an .ods is a zip whose ``content.xml``
    holds the sheet; cells are ``table:table-cell`` elements with
    ``table:number-columns-repeated`` run-length encoding and values as
    ``text:p`` children (or an ``office:value`` attribute). First sheet
    only, like the reference's ``pd.read_excel`` default (main.py:283).

    Spreadsheet writers RLE-pad rows/columns to the 16k grid edge; repeats
    of EMPTY cells/rows above 256 are clamped and trailing empties trimmed,
    so the grid stays data-sized."""
    import zipfile
    from xml.etree import ElementTree as ET

    with zipfile.ZipFile(io.BytesIO(data)) as z:
        root = ET.fromstring(z.read("content.xml"))
    table = root.find(f".//{_ODS_TABLE}table")
    if table is None:
        return []
    rows: list[list[str | None]] = []
    for tr in table.findall(f"{_ODS_TABLE}table-row"):
        row_rep = int(tr.get(f"{_ODS_TABLE}number-rows-repeated", "1"))
        cells: list[str | None] = []
        for tc in tr.findall(f"{_ODS_TABLE}table-cell"):
            rep = int(tc.get(f"{_ODS_TABLE}number-columns-repeated", "1"))
            ps = tc.findall(f"{_ODS_TEXT}p")
            if ps:
                val: str | None = "\n".join("".join(p.itertext()) for p in ps)
            else:
                val = tc.get(f"{_ODS_OFFICE}value")
            if val is None and rep > 256:
                rep = 1
            cells.extend([val] * rep)
        while cells and cells[-1] is None:
            cells.pop()
        if not cells and row_rep > 256:
            row_rep = 1
        rows.extend(list(cells) for _ in range(row_rep))
    while rows and not rows[-1]:
        rows.pop()
    return rows


def read_ods(spark: SparkSession, path_or_bytes) -> DataFrame:
    """S4: ODS reader. No native Spark source exists, so the (spreadsheet-
    sized) file parses on the driver and lifts to an all-string DataFrame
    (main.py:259-305 semantics: ``header=None, dtype=str``).

    Primary path is the dependency-free zip+XML parser (``_parse_ods``);
    pandas/odfpy, when installed, is used instead for full-fidelity edge
    cases (formulas, covered cells)."""
    if isinstance(path_or_bytes, bytes):
        data = path_or_bytes
    else:
        with open(path_or_bytes, "rb") as f:
            data = f.read()

    from pyspark.sql.types import StringType, StructField, StructType

    try:
        import odf  # type: ignore  # noqa: F401
        import pandas as pd

        pdf = pd.read_excel(io.BytesIO(data), engine="odf", header=None, dtype=str)
        pdf.columns = [f"_c{i}" for i in range(len(pdf.columns))]
        pdf = pdf.astype("object").where(pd.notna(pdf), None)
        schema = StructType(
            [StructField(c, StringType(), True) for c in pdf.columns]
        )
        return spark.createDataFrame(pdf, schema=schema)
    except ImportError:
        pass

    rows = _parse_ods(data)
    width = max((len(r) for r in rows), default=0)
    padded = [r + [None] * (width - len(r)) for r in rows]
    schema = StructType(
        [StructField(f"_c{i}", StringType(), True) for i in range(width)]
    )
    return spark.createDataFrame(padded, schema=schema)


def _with_rownum(df: DataFrame) -> DataFrame:
    # Order-stable within a single-file read; used only for per-file header
    # slicing where the file fits few partitions.
    return df.withColumn(_ROWNUM, F.monotonically_increasing_id())


def discover_header(df: DataFrame, markers: list[str] | None = None) -> tuple[DataFrame, list[str]]:
    """P5+P6: find the header row by marker, promote its values to column
    names, return (data rows below the header, promoted names)."""
    markers = markers or HEADER_MARKERS
    cols = df.columns
    dfn = _with_rownum(df)

    concat_upper = F.upper(F.concat_ws(" ", *[F.coalesce(F.col(c), F.lit("")) for c in cols]))
    cond = F.lit(False)
    for m in markers:
        cond = cond | concat_upper.contains(m.upper())
    hdr_row = dfn.filter(cond).agg(F.min(_ROWNUM).alias("m")).first()["m"]
    if hdr_row is None:
        hdr_row = -1  # default: first row is already the header? reference defaults to 0
        header_vals = [None] * len(cols)
    else:
        header_vals = list(dfn.filter(F.col(_ROWNUM) == hdr_row).first()[: len(cols)])

    names, seen = [], set()
    for i, v in enumerate(header_vals):
        name = str(v).strip() if v is not None and str(v).strip() else f"col_{i}"
        base = name
        k = 1
        while name in seen:
            k += 1
            name = f"{base}_{k}"
        seen.add(name)
        names.append(name)

    data = dfn.filter(F.col(_ROWNUM) > hdr_row).drop(_ROWNUM) if hdr_row >= 0 else df
    return data.toDF(*names), names


def remove_metadata_rows(df: DataFrame, patterns: list[str] | None = None) -> DataFrame:
    """P7: drop any row where ANY column contains a metadata phrase
    (case-insensitive, null-safe)."""
    patterns = patterns or METADATA_PATTERNS
    cond = F.lit(False)
    for c in df.columns:
        u = F.upper(F.col(c))
        for p in patterns:
            cond = cond | F.coalesce(u.contains(p.upper()), F.lit(False))
    return df.filter(~cond)


def drop_all_null_rows(df: DataFrame) -> DataFrame:
    """P8: pandas dropna(how='all') twin; empty strings count as null here
    because raw ingest is all-string."""
    any_value = F.lit(False)
    for c in df.columns:
        any_value = any_value | (F.coalesce(F.trim(F.col(c)), F.lit("")) != "")
    return df.filter(any_value)


_DATE_COL_FULL = re.compile(r"^\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}$")
_DATE_COL_YM = re.compile(r"^\d{4}-\d{2}$")


def normalize_date_column_names(df: DataFrame) -> DataFrame:
    """P10: rename 'YYYY-MM-DD HH:MM:SS' column labels to 'YYYY-MM' (schema
    op on the driver, not a data op)."""
    new_names = []
    for c in df.columns:
        cs = c.strip()
        if _DATE_COL_FULL.match(cs):
            new_names.append(_dt.datetime.strptime(cs, "%Y-%m-%d %H:%M:%S").strftime("%Y-%m"))
        else:
            new_names.append(c)
    return df.toDF(*new_names)


def classify_columns(columns: list[str]) -> tuple[list[str], list[str]]:
    """R1 column classification: id columns vs month ('YYYY-MM') columns."""
    id_candidates = {"GRUPO_ECONOMICO", "VARIAVEL", "OPERADORA"}
    id_cols = [c for c in columns if c.upper() in id_candidates]
    date_cols = [c for c in columns if _DATE_COL_YM.match(c.strip())]
    return id_cols, date_cols


def tidy_decimal_strings(df: DataFrame, skip_cols: list[str]) -> DataFrame:
    """P11: trailing-zero strip on every non-id column (string cosmetics)."""
    return df.select(
        *[
            F.col(c) if c in skip_cols else strip_trailing_zeros(F.col(c)).alias(c)
            for c in df.columns
        ]
    )


LONG_SCHEMA_COLS = ["GRUPO_ECONOMICO", "VARIAVEL", "OPERADORA", "REFERENCIA_MES", "VALOR", "SERVICO"]


def to_long(df: DataFrame, service: str) -> DataFrame:
    """R1-R4: unpivot month columns into (REFERENCIA_MES, VALOR), parse the
    month to DateType and the value through the Brazilian-number normalizer,
    and tag the source service. Falls back to pass-through + SERVICO when no
    id/date columns exist (main.py:505-508).

    ALL id columns survive the unpivot (main.py:499 keeps OPERADORA through
    the melt): files keyed by operator would otherwise lose that column and
    consolidate().dropDuplicates() could merge rows from different operators
    that agree on the remaining columns. Files without OPERADORA null-fill
    it at union time (``unionByName(allowMissingColumns=True)``).

    Values parse BEFORE the unpivot: each month column runs the BR-number
    expression once in a narrow Project, and the Expand then fans out plain
    double columns. Parsing after the unpivot would make every Expand
    branch carry the whole regex tree (duplicated work), and the combined
    Expand x parse x subexpression-elimination expression tree is big
    enough to trip a Spark codegen bug (invalid generated parameter name
    when mutable state compacts to arrays -> interpreted fallback).
    Identical per-cell semantics either way."""
    id_cols, date_cols = classify_columns(df.columns)
    if not id_cols or not date_cols:
        return df.withColumn("SERVICO", F.lit(service))
    parsed = df.select(
        *[F.col(c) for c in id_cols],
        *[br_number_to_double(F.col(c)).alias(c) for c in date_cols],
    )
    long_df = parsed.unpivot(
        ids=id_cols,
        values=date_cols,
        variableColumnName="REFERENCIA_MES",
        valueColumnName="VALOR",
    )
    return long_df.select(
        *[F.col(c) for c in id_cols],
        F.to_date(F.col("REFERENCIA_MES"), "yyyy-MM").alias("REFERENCIA_MES"),
        F.col("VALOR"),
        F.lit(service).alias("SERVICO"),
    )


def transform_wide(raw: DataFrame, service: str) -> DataFrame:
    """The full P5-P11 + R1-R4 transform chain over an already-read raw
    frame: discover header -> drop metadata/null rows -> positional rename
    -> date-label normalize -> decimal tidy -> unpivot long. Shared by
    ``ingest_wide_file`` (production) and the ``ingest_e2e`` registered
    oracle query (synthetic fixture) so the oracle checks EXACTLY the
    production chain."""
    data, names = discover_header(raw)
    data = remove_metadata_rows(data)
    data = drop_all_null_rows(data)
    # P9: first two columns are (group, variable)
    renames = {}
    if len(data.columns) >= 2:
        renames[data.columns[0]] = "GRUPO_ECONOMICO"
        renames[data.columns[1]] = "VARIAVEL"
    data = data.withColumnsRenamed(renames)
    data = normalize_date_column_names(data)
    id_cols, _ = classify_columns(data.columns)
    data = tidy_decimal_strings(data, skip_cols=id_cols)
    return to_long(data, service)


def ingest_wide_file(
    spark: SparkSession,
    path: str,
    service: str,
    fmt: str = "csv",
    sep: str = "\t",
) -> DataFrame:
    """Full per-file pipeline: read -> discover header -> clean -> long."""
    if fmt.lower() == "ods":
        raw = read_ods(spark, path)
    else:
        raw = read_headerless_csv(spark, path, sep=sep)
    return transform_wide(raw, service)


# --- manifest filtering (P1-P4, main.py:138-199) --------------------------


def filter_manifest(resources: DataFrame) -> DataFrame:
    """P1-P4 over a resource-manifest DataFrame with columns
    (titulo, url, formato): keep SCM/SMP/STFC ODS/CSV resources, fix
    backslash URLs, classify service, extract year."""
    from be_analytic_etl_spark.functions import classify_service, extract_year

    t = F.upper(F.coalesce(F.col("titulo"), F.lit("")))
    u = F.upper(F.coalesce(F.col("url"), F.lit("")))
    fmt = F.upper(F.coalesce(F.col("formato"), F.lit("")))
    keep = (t.contains("SCM") | t.contains("SMP") | t.contains("STFC")) & (
        fmt.contains("ODS") | u.contains(".ODS") | u.contains(".CSV")
    )
    return (
        resources.filter(keep)
        .withColumn("url", F.regexp_replace("url", r"\\", "/"))
        .withColumn("servico", classify_service(F.col("titulo")))
        .withColumn("ano", extract_year(F.col("titulo")))
    )
