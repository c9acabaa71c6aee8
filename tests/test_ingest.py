"""End-to-end ingest tests on synthetic ANATEL-layout wide files
(FIXTURES.md §2): header discovery, metadata removal, unpivot, BR-number
parse, consolidation, final schema, and the flagship view on the result.
"""

from __future__ import annotations

import datetime

import pytest

from be_analytic_etl_spark.operators.consolidate import (
    FINAL_RENAMES,
    add_dense_id,
    consolidate,
    finalize,
)
from be_analytic_etl_spark.sources.ingest import (
    filter_manifest,
    ingest_wide_file,
)

FILE_A = """ÍNDICE DE DESEMPENHO NO ATENDIMENTO\t\t\t
SERVIÇO: SMP\t\t\t
PERÍODO: 2020\t\t\t
GRUPO ECONÔMICO\tVARIAVEL\t2020-01\t2020-02-01 00:00:00
CLARO\tIDA\t85,5\t90,00
VIVO\tIDA\t1.234,56\t2.000
TIM\tIDA\tND\t15.50
\t\t\t
FONTE: ANATEL\t\t\t
"""

FILE_B = """ANATEL - dados\t\t\t
GRUPO_ECON\tVARIAVEL\t2020-02\t2020-03
CLARO\tIDA\t91\t92,5
VIVO\tIDA\t2.000\t1.999,9
CLARO\tIDA\t91\t92,5
"""


@pytest.fixture(scope="module")
def wide_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("wide")
    a = d / "ida_smp_2020.csv"
    a.write_text(FILE_A, encoding="utf-8")
    b = d / "ida_scm_2020.csv"
    b.write_text(FILE_B, encoding="latin-1")
    return str(a), str(b)


def test_ingest_single_file(spark, wide_files):
    path_a, _ = wide_files
    df = ingest_wide_file(spark, path_a, service="SMP")
    rows = {(r["GRUPO_ECONOMICO"], str(r["REFERENCIA_MES"])): r["VALOR"] for r in df.collect()}
    assert rows[("CLARO", "2020-01-01")] == 85.5
    assert rows[("CLARO", "2020-02-01")] == 90.0  # date-colname normalization
    assert rows[("VIVO", "2020-01-01")] == 1234.56  # BR locale parse
    # single-dot rule: '2.000' is a plain decimal point (reference branch
    # main.py:570-572), NOT a thousands separator -> 2.0
    assert rows[("VIVO", "2020-02-01")] == 2.0
    assert rows[("TIM", "2020-01-01")] is None  # 'ND' invalid token
    assert rows[("TIM", "2020-02-01")] == 15.5
    # metadata + empty rows removed: 3 groups x 2 months only
    assert df.count() == 6
    svc = {r["SERVICO"] for r in df.collect()}
    assert svc == {"SMP"}


def test_consolidate_and_finalize(spark, wide_files):
    path_a, path_b = wide_files
    df_a = ingest_wide_file(spark, path_a, service="SMP")
    df_b = ingest_wide_file(spark, path_b, service="SCM")
    fact = finalize(consolidate([df_a, df_b]))
    assert fact.columns[:6] == ["id", "grupo_economico", "servico", "mes_referencia", "valor", "tipo_servico"]
    n = fact.count()
    # file A: 6 rows; file B: 6 rows - 2 duplicate rows (CLARO repeated) = 4
    assert n == 10
    ids = sorted(r["id"] for r in fact.select("id").collect())
    assert ids == list(range(1, n + 1))  # dense 1..N
    # rename trap: VARIAVEL -> servico, file tag -> tipo_servico
    assert {r["servico"] for r in fact.collect()} == {"IDA"}
    assert {r["tipo_servico"] for r in fact.collect()} == {"SMP", "SCM"}


def test_add_dense_id_parallel(spark):
    df = spark.range(0, 10_000).repartition(16)
    out = add_dense_id(df.withColumnRenamed("id", "x"), order_cols=["x"])
    rows = out.orderBy("x").collect()
    assert [r["id"] for r in rows] == list(range(1, 10_001))
    # ordered path: id follows the global order of x
    assert all(r["id"] == r["x"] + 1 for r in rows)


def test_add_dense_id_is_map_only(spark):
    """The id pass must not shuffle the data: without order_cols the plan
    has NO Exchange and NO Window — it is a projection over the cached
    input (the point of the zip-with-index design)."""
    df = spark.range(0, 5_000).repartition(8).withColumnRenamed("id", "x")
    out = add_dense_id(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    # the only allowed exchange is the pre-existing repartition, which sits
    # below the InMemoryRelation; nothing above the cache may shuffle
    above_cache = plan.split("InMemoryTableScan", 1)[0]
    assert "Exchange" not in above_cache, above_cache
    ids = sorted(r["id"] for r in out.collect())
    assert ids == list(range(1, 5_001))


def test_to_long_keeps_operadora(spark, tmp_path):
    """main.py:499 keeps OPERADORA through the melt: rows that differ only
    by operator must survive consolidate().dropDuplicates()."""
    content = (
        "SERVIÇO: SMP\t\t\t\n"
        "GRUPO ECONÔMICO\tVARIAVEL\tOPERADORA\t2020-01\n"
        "CLARO\tIDA\tCLARO SA\t10,5\n"
        "CLARO\tIDA\tCLARO NXT\t10,5\n"
    )
    p = tmp_path / "ida_operadora.csv"
    p.write_text(content, encoding="utf-8")
    df = ingest_wide_file(spark, str(p), service="SMP")
    assert "OPERADORA" in df.columns
    rows = df.collect()
    assert len(rows) == 2
    assert {r["OPERADORA"] for r in rows} == {"CLARO SA", "CLARO NXT"}
    # without OPERADORA these two rows are identical — dropDuplicates must
    # NOT merge them now that the column survives
    assert consolidate([df]).count() == 2


def _make_ods(rows: list[list[str | None]]) -> bytes:
    """Minimal valid ODS: zip with mimetype + content.xml (first sheet),
    exercising number-columns-repeated RLE and empty cells."""
    import io
    import zipfile
    from xml.sax.saxutils import escape

    body = []
    for r in rows:
        cells = []
        for v in r:
            if v is None:
                cells.append("<table:table-cell/>")
            else:
                cells.append(
                    '<table:table-cell office:value-type="string">'
                    f"<text:p>{escape(v)}</text:p></table:table-cell>"
                )
        # RLE-pad to the grid edge like real writers do (must be clamped)
        cells.append('<table:table-cell table:number-columns-repeated="16384"/>')
        body.append("<table:table-row>" + "".join(cells) + "</table:table-row>")
    content = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        "<office:document-content "
        'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
        'xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0" '
        'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">'
        "<office:body><office:spreadsheet>"
        '<table:table table:name="Sheet1">'
        + "".join(body)
        + '</table:table><table:table table:name="Sheet2">'
        "<table:table-row><table:table-cell office:value-type=\"string\">"
        "<text:p>second sheet must be ignored</text:p>"
        "</table:table-cell></table:table-row>"
        "</table:table></office:spreadsheet></office:body>"
        "</office:document-content>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("mimetype", "application/vnd.oasis.opendocument.spreadsheet")
        z.writestr("content.xml", content)
    return buf.getvalue()


def test_ingest_ods_end_to_end(spark, tmp_path):
    """S4+S6: the ODS reader (dependency-free zip+XML path) through the full
    wide->long chain."""
    from be_analytic_etl_spark.sources.ingest import read_ods

    ods = _make_ods(
        [
            ["SERVIÇO: SMP", None, None],
            ["GRUPO ECONÔMICO", "VARIAVEL", "2021-03-01 00:00:00"],
            ["CLARO", "IDA", "7,5"],
            ["VIVO", "IDA", "1.250,25"],
        ]
    )
    p = tmp_path / "ida_2021.ods"
    p.write_bytes(ods)

    raw = read_ods(spark, str(p))
    assert raw.columns == ["_c0", "_c1", "_c2"]  # RLE padding clamped
    assert raw.count() == 4

    out = ingest_wide_file(spark, str(p), service="SMP", fmt="ods")
    rows = {r["GRUPO_ECONOMICO"]: r for r in out.collect()}
    assert rows["CLARO"]["VALOR"] == 7.5
    assert rows["VIVO"]["VALOR"] == 1250.25
    assert str(rows["CLARO"]["REFERENCIA_MES"]) == "2021-03-01"
    assert {r["SERVICO"] for r in rows.values()} == {"SMP"}
    # bytes input path (the S3 download handoff shape)
    assert read_ods(spark, ods).count() == 4


def test_filter_manifest(spark):
    res = spark.createDataFrame(
        [
            ("IDA SMP 2020", "http://x\\y\\a.ods", "ODS"),
            ("IDA STFC 2019", "http://x/b.csv", "CSV"),
            ("IDA SMP 2020", "http://x/b.pdf", "PDF"),
            ("Outra coisa", "http://x/c.csv", "CSV"),
        ],
        "titulo string, url string, formato string",
    )
    out = filter_manifest(res).collect()
    assert len(out) == 2
    by_title = {r["titulo"]: r for r in out}
    assert by_title["IDA SMP 2020"]["url"] == "http://x/y/a.ods"
    assert by_title["IDA SMP 2020"]["servico"] == "SMP"
    assert by_title["IDA SMP 2020"]["ano"] == 2020
    assert by_title["IDA STFC 2019"]["servico"] == "STFC"


def test_flagship_view_on_ingested_fact(spark, wide_files):
    """The full reference pipeline: ingest -> consolidate -> finalize ->
    consolidacao_de_metricas (with the fact's 'servico' being the indicator
    filtered on)."""
    from be_analytic_etl_spark.plans.flagship import mom_variation_pivot

    import pyspark.sql.functions as F

    path_a, path_b = wide_files
    fact = finalize(
        consolidate(
            [
                ingest_wide_file(spark, path_a, service="SMP"),
                ingest_wide_file(spark, path_b, service="SCM"),
            ]
        )
    )
    out = mom_variation_pivot(
        fact.filter(F.col("servico") == "IDA"),
        time_col="mes_referencia",
        group_col="grupo_economico",
        value_col="valor",
        pivot={"CLARO": "claro", "VIVO": "vivo", "TIM": "tim"},
    )
    rows = {r["mes"]: r for r in out.collect()}
    assert set(rows) <= {"2020-02", "2020-03"}
    # 2020-02: CLARO avg (90+91)/2=90.5 vs prev 85.5 -> +5.8%
    assert rows["2020-02"]["claro"] == pytest.approx(5.8)
    # VIVO: 2.0 vs prev 1234.56 -> -99.8%
    assert rows["2020-02"]["vivo"] == pytest.approx(-99.8)
