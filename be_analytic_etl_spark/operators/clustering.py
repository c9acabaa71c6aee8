"""Distributed k-means (Lloyd's algorithm) over an embedding column.

The iterative-algorithm pattern on Spark: per-iteration work is one
map-only assignment pass (centroids inlined as literals — the same
driver-side control plane as the IVF coarse quantizer,
operators/similarity.py) plus one partially-aggregated groupBy for the
centroid update. Nothing data-proportional ever reaches the driver; the
collected state is k×dim numbers per iteration.

Cross-engine determinism (the point of the quantized design): coordinates
are quantized to a 1e-8 grid as BIGINTs (``round(x * 1e8)`` — double
multiply by an exactly-representable power of ten, then half-away-from-
zero rounding, identical in Spark and DuckDB; a tie at .5 is decidable
identically in both). All distances and sums are then EXACT integer
arithmetic — order-free, overflow-safe (|xi| <= 2e8 -> 64-dim squared
distance <= 2.6e18 < 2^63) — and the centroid update re-quantizes through
one double division. Assignment ties break to the lowest cell id. The
DuckDB twin (``kmeans_sql_twin``) replays the identical computation
relationally (unnest to (id, dim) pairs), so a fixed-iteration fit is
value-checkable bit-for-bit. Production at 100 TB would run MLlib KMeans
(doubles + kmeans|| init); this operator is the engine-native,
verifiable variant — 1e-8 resolution is far below embedding noise.

Init: the k smallest-id vectors (deterministic; callers wanting k-means++
seed with a hash-ordered sample upstream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QUANT = 100000000.0  # 1e-8 grid


def _quantize(vec_col: str) -> "F.Column":
    return F.transform(
        F.col(vec_col), lambda x: F.round(x * F.lit(QUANT)).cast("long")
    )


def kmeans_fit_predict(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 4,
    iters: int = 2,
    dim: int | None = None,
) -> DataFrame:
    """Run ``iters`` Lloyd iterations; return (id_col, cluster) for every
    row, cluster in [0, k)."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    pts = df.select(id_col, _quantize(vec_col).alias("__xi"))
    pts = pts.persist()

    init = pts.orderBy(id_col).limit(k).collect()
    if len(init) < k:
        raise ValueError(f"need at least k={k} rows, got {len(init)}")
    cents: list[list[int]] = [list(r["__xi"]) for r in init]

    def assign(cents: list[list[int]]) -> DataFrame:
        # The whole argmin as ONE parsed SQL expression (was k lambda-
        # composed aggregates + a struct array — ~0.25 s of py4j chatter
        # per assign at k=4, cProfile r14; two assigns per fit). Same
        # tree: per-centroid squared-L2 fold, array_min over (d, c)
        # structs, field 'c' of the min.
        def dist_sql(cent: list[int]) -> str:
            arr = "array(" + ",".join(f"{int(c)}L" for c in cent) + ")"
            return (
                f"aggregate(zip_with(__xi, {arr},"
                " (x, c) -> (x - c) * (x - c)),"
                " CAST(0 AS BIGINT), (acc, t) -> acc + t)"
            )

        best = (
            "array_min(array("
            + ",".join(
                f"named_struct('d', {dist_sql(cent)}, 'c', {i})"
                for i, cent in enumerate(cents)
            )
            + ")).c"
        )
        return pts.select(id_col, "__xi", F.expr(best).alias("cluster"))

    assigned = assign(cents)
    for _ in range(iters - 1):
        upd = (
            assigned.select("cluster", F.posexplode("__xi").alias("dim", "xi"))
            .groupBy("cluster", "dim")
            .agg(
                F.sum("xi").alias("s"), F.count(F.lit(1)).alias("n")
            )
            .collect()
        )
        # half-away-from-zero to match SQL round() — Python's round() is
        # banker's (half-to-even) and would diverge on exact .5 quotients
        def _r(x: float) -> int:
            import math

            return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))

        new = {
            (r["cluster"], r["dim"]): _r(float(r["s"]) / r["n"]) for r in upd
        }
        cents = [
            [int(new.get((c, d), cents[c][d])) for d in range(dim)]
            for c in range(k)
        ]
        assigned = assign(cents)

    # materialize the final assignment, then release the cached points —
    # callers get a stable plan and the long-lived session leaks nothing
    out = assigned.select(id_col, "cluster").localCheckpoint(eager=True)
    pts.unpersist()
    return out


def kmeans_sql_twin(
    table: str, id_col: str, vec_col: str, k: int = 4, iters: int = 2, dim: int = 64
) -> str:
    """DuckDB SQL replaying the identical quantized Lloyd iterations
    relationally; generated beside the operator so they cannot drift."""
    q = repr(QUANT)
    pts = (
        f"SELECT {id_col} AS id, i - 1 AS dim, "
        f"CAST(round({vec_col}[i] * {q}) AS BIGINT) AS xi "
        f"FROM {table}, range(1, {dim + 1}) t(i)"
    )
    sql = [f"WITH pts AS ({pts})"]
    sql.append(
        f"init AS (SELECT ROW_NUMBER() OVER (ORDER BY id) - 1 AS cell, id "
        f"FROM (SELECT id FROM (SELECT {id_col} AS id FROM {table}) ORDER BY id LIMIT {k}))"
    )
    sql.append(
        "c0 AS (SELECT init.cell, p.dim, p.xi AS ci FROM init JOIN pts p USING (id))"
    )
    prev = "c0"
    for it in range(1, iters + 1):
        sql.append(
            f"a{it} AS (SELECT id, cell FROM ("
            f"SELECT d.id, d.cell, ROW_NUMBER() OVER "
            f"(PARTITION BY d.id ORDER BY d.dist, d.cell) AS rn FROM ("
            f"SELECT p.id, c.cell, SUM((p.xi - c.ci) * (p.xi - c.ci)) AS dist "
            f"FROM pts p JOIN {prev} c ON p.dim = c.dim "
            f"GROUP BY p.id, c.cell) d) WHERE rn = 1)"
        )
        if it < iters:
            sql.append(
                f"c{it} AS (SELECT a.cell, p.dim, "
                f"CAST(round(CAST(SUM(p.xi) AS DOUBLE) / COUNT(*)) AS BIGINT) AS ci "
                f"FROM a{it} a JOIN pts p USING (id) GROUP BY a.cell, p.dim)"
            )
            prev = f"c{it}"
    body = ",\n    ".join(sql)
    return (
        f"{body}\n    SELECT id AS {id_col}, cell AS cluster FROM a{iters}"
    )
