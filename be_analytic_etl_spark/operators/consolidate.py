"""Consolidation: union-by-name, distinct, final schema, dense ids.

Reference behavior being matched (file:line):
- union of per-file frames with name alignment + null fill:
  ``pd.concat(ignore_index=True)`` — ``/root/reference/main.py:627-644``;
- exact-duplicate removal: ``drop_duplicates`` — ``main.py:646-647``;
- final snake_case schema (note the rename trap: VARIAVEL -> servico,
  SERVICO -> tipo_servico) — ``main.py:672-692``;
- dense sequential id 1..N as first column — ``main.py:694-696``;
- canonical column order — ``main.py:698-704``.

Scale design — dense ids (SURVEY §7.4.2): ``row_number`` over a global
window is exact but single-partition. ``add_dense_id`` instead computes
per-partition counts (one tiny job), cumulative offsets on the driver
(|partitions| integers), and a per-partition running index — fully
parallel, two passes, no shuffle. With ``order_cols`` it first
``repartitionByRange + sortWithinPartitions`` so the dense id follows the
global sort order (range partitioning gives globally ordered partitions).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Final rename map (main.py:673-692). VARIAVEL becomes *servico* (the
#: indicator name) and the file-level SERVICO tag becomes *tipo_servico*.
FINAL_RENAMES = {
    "GRUPO_ECONOMICO": "grupo_economico",
    "VARIAVEL": "servico",
    "REFERENCIA_MES": "mes_referencia",
    "VALOR": "valor",
    "SERVICO": "tipo_servico",
}

PREFERRED_ORDER = ["id", "grupo_economico", "servico", "mes_referencia", "valor", "tipo_servico"]


def union_by_name(dfs: list[DataFrame]) -> DataFrame:
    """R5: pandas-concat twin — align on names, null-fill missing columns."""
    if not dfs:
        raise ValueError("union_by_name: empty input list")
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs)


def consolidate(dfs: list[DataFrame]) -> DataFrame:
    """R5+R6: union then exact-duplicate removal (one shuffle on all cols)."""
    return union_by_name(dfs).dropDuplicates()


def add_dense_id(
    df: DataFrame, order_cols: list[str] | None = None, id_col: str = "id"
) -> DataFrame:
    """Dense 1..N id without a single-partition bottleneck.

    Two passes: (1) count rows per partition, (2) add
    ``offset[partition] + local_index + 1``. With ``order_cols``, rows are
    range-partitioned and sorted first so ids follow the global order.
    """
    if order_cols:
        df = df.repartitionByRange(*order_cols).sortWithinPartitions(*order_cols)

    sc_df = df.withColumn("__pid", F.spark_partition_id())
    counts = {r["__pid"]: r["cnt"] for r in sc_df.groupBy("__pid").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    spark = df.sparkSession
    offs = spark.sparkContext.broadcast(offsets)

    # Per-partition running index via a window keyed on the partition id —
    # partition-local, so no cross-executor shuffle of the data itself.
    from pyspark.sql import Window

    w = Window.partitionBy("__pid").orderBy(F.monotonically_increasing_id())
    offset_map = F.create_map(
        *[x for pid, off in offs.value.items() for x in (F.lit(pid), F.lit(off))]
    )
    out = (
        sc_df.withColumn("__local", F.row_number().over(w))
        .withColumn(id_col, (offset_map[F.col("__pid")] + F.col("__local")).cast("long"))
        .drop("__pid", "__local")
    )
    return out


def finalize(df: DataFrame, dense_id: bool = True) -> DataFrame:
    """P13-P15: final snake_case schema, id column, canonical order.

    Renames happen in ONE positional select — sequential renaming would
    collide case-insensitively (VARIAVEL->servico then SERVICO->tipo_servico
    would see two 'servico' columns).
    """
    out = df.select(*[F.col(c).alias(FINAL_RENAMES.get(c, c)) for c in df.columns])
    if dense_id:
        order_cols = [c for c in ("tipo_servico", "grupo_economico", "servico", "mes_referencia") if c in out.columns]
        out = add_dense_id(out, order_cols=order_cols or None)
    else:
        out = out.withColumn("id", F.monotonically_increasing_id())
    ordered = [c for c in PREFERRED_ORDER if c in out.columns]
    extras = [c for c in out.columns if c not in ordered]
    return out.select(*ordered, *extras)
