"""Privacy-risk audit operators for dataset release.

k-anonymity / l-diversity (Sweeney, IJUFKS 2002; Machanavajjhala et al.,
ICDE 2006) over quasi-identifier columns — the audit a training-data
pipeline runs before releasing or licensing a corpus slice that carries
user-derived attributes. Complements ``ext_redact`` (regex PII removal):
redaction scrubs direct identifiers, this measures re-identification risk
from the indirect ones.

Scale shape: ONE groupBy over the quasi-identifier tuple — partial-agg
(map-side combine) friendly, shuffle payload is the QI tuple + two
counters. l-diversity is an exact countDistinct per class; with a
low-cardinality sensitive attribute (the normal case — a bucketed or
categorical value) the distinct set stays tiny per class. At 100 TB the
cost is the corpus scan; no joins, no explosion.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def k_anonymity(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive: Column | str,
    k: int = 10,
) -> DataFrame:
    """Per-equivalence-class privacy audit.

    Groups ``df`` by the quasi-identifier columns and emits one row per
    equivalence class: ``class_size`` (rows sharing the QI tuple),
    ``l_diversity`` (distinct ``sensitive`` values in the class — 1 means
    the class leaks the sensitive attribute even when k-anonymous), and
    ``at_risk`` (class smaller than ``k``; the dataset is k-anonymous iff
    no class is at risk).

    ``sensitive`` may be a column name or an expression (e.g. a bucketed
    continuous attribute — bucket BEFORE auditing, raw continuous values
    make every class trivially "diverse").
    """
    if k < 1:
        raise ValueError(f"k_anonymity: k must be >= 1, got {k}")
    missing = [c for c in quasi_cols if c not in df.columns]
    if missing:
        raise ValueError(f"k_anonymity: quasi columns not in frame: {missing}")
    s = F.col(sensitive) if isinstance(sensitive, str) else sensitive
    return df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).cast("long").alias("class_size"),
        F.countDistinct(s).cast("long").alias("l_diversity"),
        (F.count(F.lit(1)) < F.lit(k)).alias("at_risk"),
    )
