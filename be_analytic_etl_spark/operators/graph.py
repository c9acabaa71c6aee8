"""Distributed connected components: near-dup pairs -> dedup groups.

Pair generators (``minhash_lsh_pairs``, ``simhash_neardup_pairs``,
``ngram_jaccard_pairs``) emit *edges*; actual deduplication needs the
transitive closure — every document labeled with its duplicate-group id so
one representative per group survives. This is the standard tail of a
web-scale dedup pipeline (the reference has no graph stage — its dataset
fits one pandas frame; at 100 TB the group structure must be computed
distributed).

Algorithm: iterative **min-label propagation** over the symmetrized edge
list (the "hash-to-min" scheme of Rastogi/Machanavajjhala/Chitnis/Das
Sarma, "Finding connected components in map-reduce in logarithmic rounds",
ICDE 2013). Each round is one shuffle-join + one partial-aggregated
groupBy; a component's min id reaches every member in at most *diameter*
rounds. Near-dup graphs are unions of LSH-bucket stars, so the diameter is
small (a handful of hops) — for adversarial long-path graphs the
large-star/small-star contraction of Kiveris et al. ("Connected components
in MapReduce and beyond", SoCC 2014) converges in O(log^2 n) rounds and
can replace the propagation loop without changing this API.

Scale notes:

- State per round is ``(node, label)`` — two longs; the edge list is
  re-used as-is each round. Shuffle payload never carries documents.
- ``localCheckpoint(eager=True)`` truncates lineage every round —
  without it the plan doubles per iteration and the driver dies at ~20
  rounds. On a multi-executor cluster prefer ``spark.sparkContext.
  setCheckpointDir`` + ``checkpoint()`` (survives executor loss;
  localCheckpoint trades that for speed, which is the right default on
  local[*] and acceptable when the caller re-runs on failure).
- The convergence probe is a scalar ``count()`` per round over the
  changed-label frame — O(1) driver memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    nodes: DataFrame | None = None,
    id_col: str = "id",
    max_iter: int = 50,
) -> DataFrame:
    """Label every node with the minimum node id of its component.

    ``edges`` is an undirected pair list (one row per pair, either
    orientation). ``nodes`` optionally supplies the full node universe
    (isolated nodes — no incident edge — then appear with their own id as
    ``group_id``; otherwise only endpoint nodes are labeled).

    Returns ``(id_col, group_id)``, one row per node.
    """
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).filter(
        F.col("s") != F.col("d")
    )
    # Symmetrize once; both directions participate in every round.
    sym = e.union(e.select(F.col("d").alias("s"), F.col("s").alias("d"))).distinct()
    sym = sym.persist()

    endpoint_ids = sym.select(F.col("s").alias(id_col))
    if nodes is not None:
        universe = nodes.select(F.col(id_col)).union(endpoint_ids).distinct()
    else:
        universe = endpoint_ids.distinct()

    labels = universe.select(id_col, F.col(id_col).alias("group_id"))
    labels = labels.localCheckpoint(eager=True)

    for _ in range(max_iter):
        # min label among neighbors, one join + one (partially aggregated)
        # groupBy — the only data-proportional work per round.
        nbr_min = (
            sym.join(labels, sym["d"] == labels[id_col], "inner")
            .groupBy(F.col("s").alias(id_col))
            .agg(F.min("group_id").alias("nbr_min"))
        )
        new_labels = (
            labels.join(nbr_min, id_col, "left")
            .select(
                id_col,
                F.least(F.col("group_id"), F.coalesce("nbr_min", F.col("group_id"))).alias(
                    "group_id"
                ),
                (F.col("nbr_min") < F.col("group_id")).alias("__changed"),
            )
        )
        # lazy checkpoint: the convergence probe right below is the action
        # that materializes it — one job per round instead of two
        new_labels = new_labels.localCheckpoint(eager=False)
        changed = new_labels.filter(F.col("__changed")).limit(1).count()
        labels = new_labels.drop("__changed")
        if changed == 0:
            break

    sym.unpersist()
    return labels


def dedup_group_representatives(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Keep one row per duplicate group: the minimum-id member.

    Composes ``connected_components`` over the near-dup ``pairs`` with the
    source table — the canonical "LSH pairs -> groups -> survivors" tail of
    a dedup pipeline. Non-duplicated rows pass through untouched.
    """
    comps = connected_components(
        pairs, src=src, dst=dst, nodes=df.select(F.col(id_col).alias("id")), id_col="id"
    )
    keep = comps.filter(F.col("id") == F.col("group_id")).select(F.col("id").alias(id_col))
    # survivors are a small id set relative to df at dedup ratios; the join
    # shuffles only ids.
    return df.join(keep, id_col, "inner")
