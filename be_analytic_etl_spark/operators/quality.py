"""Declarative data-quality constraint auditing (deequ/dbt-test-style).

A warehouse load (the reference's EP2 chain loads CSVs into Postgres
tables sight-unseen) needs a machine-checkable contract: null-ness,
uniqueness, value domains, ranges, and referential integrity. The audit
evaluates a rule list against a DataFrame and returns one row per rule:
``(rule, n_violations)`` — empty-violation reports gate the load.

Scale shape: all row-local rules (not_null / in_set / in_range / matches)
fold into ONE aggregate pass over the table (a single partial+final
HashAggregate — no per-rule scans). Uniqueness is one groupBy on the key
(count>1 ⇒ extra rows beyond the first are violations). Referential
integrity is one left-anti join per FK, broadcast when the dimension is
small. Nothing is collected driver-side except the |rules|-row report.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """One constraint. ``kind`` ∈ {not_null, unique, in_set, in_range,
    matches, fk}. Row-local kinds use ``col``/``values``/``lo``/``hi``/
    ``pattern``; ``unique`` uses ``cols``; ``fk`` uses ``col`` +
    ``ref_df``/``ref_col``."""

    name: str
    kind: str
    col: str | None = None
    cols: tuple[str, ...] = ()
    values: tuple = ()
    lo: float | None = None
    hi: float | None = None
    pattern: str | None = None
    ref_col: str | None = None
    # DataFrames aren't hashable/comparable; exclude from dataclass identity
    ref_df: DataFrame | None = field(default=None, compare=False, hash=False)


def not_null(name: str, col: str) -> Rule:
    return Rule(name, "not_null", col=col)


def unique(name: str, *cols: str) -> Rule:
    return Rule(name, "unique", cols=cols)


def in_set(name: str, col: str, *values) -> Rule:
    return Rule(name, "in_set", col=col, values=values)


def in_range(name: str, col: str, lo: float, hi: float) -> Rule:
    return Rule(name, "in_range", col=col, lo=lo, hi=hi)


def matches(name: str, col: str, pattern: str) -> Rule:
    return Rule(name, "matches", col=col, pattern=pattern)


def foreign_key(name: str, col: str, ref_df: DataFrame, ref_col: str) -> Rule:
    return Rule(name, "fk", col=col, ref_df=ref_df, ref_col=ref_col)


def _violation_expr(r: Rule) -> Column:
    c = F.col(r.col)
    if r.kind == "not_null":
        return c.isNull()
    if r.kind == "in_set":
        return c.isNull() | ~c.isin(list(r.values))
    if r.kind == "in_range":
        return c.isNull() | (c < F.lit(r.lo)) | (c > F.lit(r.hi))
    if r.kind == "matches":
        return c.isNull() | ~c.rlike(r.pattern)
    raise ValueError(f"not a row-local rule kind: {r.kind}")


def constraint_audit(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Evaluate ``rules`` against ``df``; returns ``(rule, n_violations)``,
    one row per rule, in no particular order."""
    spark = df.sparkSession
    row_local = [r for r in rules if r.kind in ("not_null", "in_set", "in_range", "matches")]
    reports: list[DataFrame] = []
    if row_local:
        aggs = [
            F.sum(F.when(_violation_expr(r), 1).otherwise(0)).alias(r.name)
            for r in row_local
        ]
        wide = df.agg(*aggs)
        stack = ", ".join(f"'{r.name}', {r.name}" for r in row_local)
        reports.append(
            wide.selectExpr(
                f"stack({len(row_local)}, {stack}) AS (rule, n_violations)"
            )
        )
    for r in rules:
        if r.kind == "unique":
            dupes = (
                df.groupBy(*r.cols)
                .agg((F.count(F.lit(1)) - 1).alias("__extra"))
                .agg(F.sum("__extra").cast("long").alias("n_violations"))
                .select(F.lit(r.name).alias("rule"), "n_violations")
            )
            reports.append(dupes)
        elif r.kind == "fk":
            orphans = (
                df.join(
                    F.broadcast(r.ref_df.select(F.col(r.ref_col).alias(r.col)).distinct()),
                    r.col,
                    "left_anti",
                )
                .agg(F.count(F.lit(1)).alias("n_violations"))
                .select(F.lit(r.name).alias("rule"), "n_violations")
            )
            reports.append(orphans)
        elif r.kind not in ("not_null", "in_set", "in_range", "matches"):
            raise ValueError(f"unknown rule kind: {r.kind}")
    if not reports:
        return spark.createDataFrame([], "rule string, n_violations long")
    out = reports[0]
    for rep in reports[1:]:
        out = out.unionByName(rep)
    return out.select("rule", F.col("n_violations").cast("long").alias("n_violations"))
