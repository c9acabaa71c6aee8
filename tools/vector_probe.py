"""Embedding-pathology probe for SCALE.md: the ANN / semantic-dedup
family buckets vectors into IVF cells, LSH buckets or PQ codes and
treats per-bucket work as balanced. That balance is a DATA property —
real pipelines produce degenerate embedding distributions (an encoder
bug emitting one constant vector, a normalization bug zeroing norms, a
projection collapse leaving one informative dimension), and every one
of them defeats a space-partitioning index the same way a duplicate
bomb defeats MinHash banding: ALL vectors land in ONE cell/bucket and
the within-bucket pair work goes quadratic.

Probe corpora, derived from sf0.01 embeddings replicated x10 (5000
vectors x 64 dims — big enough that a quadratic cell shows up on the
clock, bounded enough to terminate):

* ``spread``    — the control: replicas deterministically displaced
  along dim 0 so diversity is preserved.
* ``constant``  — every embedding is the SAME vector (encoder-bug
  class). One IVF cell / one LSH bucket; pairwise legs see C(n,2).
* ``zero_norm`` — every embedding all-zero (normalization-bug class).
  Exercises the norm-0 guards (cosine defined to 0.0) on top of the
  same single-bucket collapse.
* ``collapsed`` — only dim 0 survives (projection-collapse class).
  Hyperplane LSH keeps ~2 buckets; IVF cells collapse along one axis.

Every query runs under try/except: a pathology that ERRORS the job is
a finding (reported as ERR), not a probe failure.

Run on a QUIET host:  python tools/vector_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = os.environ.get("VECTOR_PROBE_SF_DIR", "/root/testdata/sf0.01")
REPLICAS = int(os.environ.get("VECTOR_PROBE_REPLICAS", "10"))

QUERIES_UNDER_TEST = [
    "ext_embedding_stats",
    "ext_cosine_topk",
    "ext_cosine_neardup",
    "ext_semdedup",
    "ext_semantic_neardup",
    "ext_semantic_neardup_multiprobe",
    "ext_ivf_ann",
    "ext_lsh_ann",
    "ext_pq_ann",
    "ext_knn_label_agreement",
]


def _write_variants(spark) -> dict[str, str]:
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
    n0 = emb.agg(F.max("vec_id")).first()[0] + 1
    rep = emb.withColumn(
        "__r", F.explode(F.array(*[F.lit(i) for i in range(REPLICAS)]))
    ).select(
        (F.col("vec_id") + F.col("__r") * F.lit(n0)).alias("vec_id"),
        "embedding",
        "label",
        "__r",
    )
    dim = len(emb.first()["embedding"])
    const_vec = F.array(*[F.lit(0.1).cast("float") for _ in range(dim)])
    zero_vec = F.array(*[F.lit(0.0).cast("float") for _ in range(dim)])
    variants = {
        # control: displace each replica along dim 0 (diversity kept)
        "spread": rep.withColumn(
            "embedding",
            F.concat(
                F.array(
                    (
                        F.element_at("embedding", 1)
                        + F.col("__r").cast("float") * F.lit(0.37).cast("float")
                    ).cast("float")
                ),
                F.slice("embedding", 2, dim - 1),
            ),
        ),
        "constant": rep.withColumn("embedding", const_vec),
        "zero_norm": rep.withColumn("embedding", zero_vec),
        "collapsed": rep.withColumn(
            "embedding",
            F.concat(
                F.array(F.element_at("embedding", 1)),
                F.array(*[F.lit(0.0).cast("float") for _ in range(dim - 1)]),
            ),
        ),
    }
    dirs = {}
    others = (
        "region nation customer supplier part orders lineitem "
        "events documents"
    ).split()
    for vname, vdf in variants.items():
        d = f"/tmp/spark_graft_vec_{vname}_" + os.path.basename(BASE.rstrip("/"))
        vdf.drop("__r").coalesce(4).write.mode("overwrite").parquet(
            f"{d}/embeddings.parquet"
        )
        for t in others:
            dst = f"{d}/{t}.parquet"
            if not os.path.exists(dst):
                spark.read.parquet(f"{BASE}/{t}.parquet").write.mode(
                    "overwrite"
                ).parquet(dst)
        dirs[vname] = d
    return dirs


def main() -> None:
    from be_analytic_etl_spark.registry import QUERIES
    from be_analytic_etl_spark.session import get_spark

    spark = get_spark()
    dirs = _write_variants(spark)

    def bench(fn, sf_dir: str) -> str:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            try:
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            except Exception as e:  # a pathology that errors IS a finding
                return f"ERR({type(e).__name__})"
            best = min(best, time.time() - t0)
        return f"{best:.2f}s"

    order = ["spread", "constant", "zero_norm", "collapsed"]
    print(f"(x{REPLICAS} replicas: {REPLICAS * 500} vectors x 64 dims)")
    print("| query | " + " | ".join(order) + " |")
    print("|---|---|---|---|---|")
    for name in QUERIES_UNDER_TEST:
        cells = [bench(QUERIES[name], dirs[v]) for v in order]
        print(f"| {name} | " + " | ".join(cells) + " |")

    # the mitigation: the same SemDeDup composition with the opt-in
    # cell-size flood guard (operators/similarity.py max_block — the
    # max_bucket pattern in vector space)
    def semdedup_capped(spark, sf_dir):
        from pyspark.sql import functions as F

        from be_analytic_etl_spark.operators import graph as G
        from be_analytic_etl_spark.operators import similarity as S
        from be_analytic_etl_spark.queries_extensions import (
            _IVF_CELLS,
            _SEM_THRESH,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        cells = S.assign_cells(emb, n_cells=_IVF_CELLS).localCheckpoint(
            eager=False
        )
        pairs = S.cosine_pairs_above(
            cells,
            block_cols=["cell"],
            threshold=_SEM_THRESH,
            round_to=None,
            max_block=2000,
        )
        labels = G.connected_components(
            pairs,
            src="id_a",
            dst="id_b",
            nodes=emb.select(F.col("vec_id").alias("id")),
            id_col="id",
        )
        return labels.select(
            F.col("id").alias("vec_id"),
            "group_id",
            (F.col("id") == F.col("group_id")).alias("is_survivor"),
        )

    cells = [bench(semdedup_capped, dirs[v]) for v in order]
    print("| ext_semdedup (max_block=2000) | " + " | ".join(cells) + " |")
    spark.stop()


if __name__ == "__main__":
    main()
