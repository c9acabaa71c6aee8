"""plans.lint: machine-checkable scale anti-pattern detection."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from be_analytic_etl_spark.plans.lint import assert_clean, lint_plan

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def nation(spark):
    from be_analytic_etl_spark.sources import load_table

    return load_table(spark, SF_DIR, "nation")


def _codes(findings):
    return {f.code for f in findings}


def test_flags_row_python_udf(spark, nation):
    from pyspark.sql.types import IntegerType

    plus_one = F.udf(lambda x: x + 1, IntegerType())
    df = nation.select(plus_one(F.col("n_nationkey")).alias("k"))
    findings = lint_plan(df)
    assert "row-python-udf" in _codes(findings)
    with pytest.raises(AssertionError, match="row-python-udf"):
        assert_clean(df)


def test_flags_bnl_join(spark, nation):
    # non-equi self-join -> BroadcastNestedLoopJoin under AQE
    a = nation.select(F.col("n_nationkey").alias("ka"))
    b = nation.select(F.col("n_nationkey").alias("kb"))
    df = a.join(b, F.col("ka") < F.col("kb"))
    codes = _codes(lint_plan(df))
    assert ("bnl-join" in codes) or ("cartesian-join" in codes)


def test_clean_query_passes(spark):
    from be_analytic_etl_spark.registry import QUERIES

    df = QUERIES["groupby_avg"](spark, SF_DIR)
    findings = assert_clean(df)  # no error-severity findings
    # scans are reported with pushdown/width info
    assert "scan" in _codes(findings)


def test_exchange_budget(spark, nation):
    df = nation.groupBy("n_regionkey").count()
    findings = lint_plan(df, max_exchanges=0)
    assert "exchange-count" in _codes(findings)
    # without a budget, exchange count is not a finding
    assert "exchange-count" not in _codes(lint_plan(df))


def test_cli_lint_runs(spark, capsys):
    from be_analytic_etl_spark.__main__ import main

    rc = main(["lint", "groupby_avg", "--sf-dir", SF_DIR])
    assert rc == 0
    out = capsys.readouterr().out
    assert "scan" in out


@pytest.fixture(scope="module")
def registry_findings(spark):
    """One lint pass over every registered query's plan, shared by the
    whole-registry checks below (a second 244-plan pass would double
    the suite's most expensive fixture for no information). The per-
    query build+explain work is independent driver-bound latency, so a
    small thread pool overlaps it (optimization guide §2.6 — this
    fixture was 152 s serial in the quiet r14 suite timing)."""
    from concurrent.futures import ThreadPoolExecutor

    from be_analytic_etl_spark.registry import QUERIES

    items = list(QUERIES.items())

    def one(item):
        name, fn = item
        return name, lint_plan(fn(spark, SF_DIR))

    with ThreadPoolExecutor(max_workers=4) as pool:
        return dict(pool.map(one, items))


def test_registry_has_no_error_findings(registry_findings):
    """Every registered query's plan is free of cartesian joins and
    row-wise Python UDFs — the whole-registry form of the scale rules
    test_plans pins per-query. BNL warnings are expected for the
    documented bounded-broadcast shapes (scalar-subquery joins, exact
    ANN baselines) and are not errors."""
    errors = {
        name: [str(f) for f in findings if f.severity == "error"]
        for name, findings in registry_findings.items()
    }
    errors = {k: v for k, v in errors.items() if v}
    assert not errors, errors


def test_registry_bnl_joins_are_adjudicated(registry_findings):
    """Machine-checked bnl-join adjudication (VERDICT r9 ask #4):
    through round 9 each round's BroadcastNestedLoopJoin warnings were
    reviewed by hand in SCALE.md, so a NEW query with a genuinely
    unbounded broadcast side would have shipped with only a warning.
    Now the warning set must EQUAL plans.lint.BNL_ALLOWLIST — an
    unadjudicated bnl-join fails (add it to the allowlist with a
    written boundedness justification, or fix the plan), and a stale
    entry whose plan no longer nest-loops also fails (remove it, so the
    list never vouches for shapes that no longer exist)."""
    from be_analytic_etl_spark.plans.lint import BNL_ALLOWLIST

    bnl = {
        name
        for name, findings in registry_findings.items()
        if any(f.code == "bnl-join" for f in findings)
    }
    unadjudicated = bnl - set(BNL_ALLOWLIST)
    stale = set(BNL_ALLOWLIST) - bnl
    assert not unadjudicated, (
        f"bnl-join in plans with NO documented boundedness adjudication "
        f"(plans/lint.py BNL_ALLOWLIST): {sorted(unadjudicated)}"
    )
    assert not stale, (
        f"BNL_ALLOWLIST entries whose plans no longer contain a "
        f"bnl-join (remove them): {sorted(stale)}"
    )


def test_install_views_and_sql_surface(spark, capsys):
    """install_views makes the catalog usable from plain spark.sql — the
    reference's pgAdmin workflow on the Spark catalog."""
    from be_analytic_etl_spark.sources import install_views

    install_views(spark, SF_DIR)
    row = spark.sql(
        "SELECT r_name, COUNT(*) AS n FROM region JOIN nation "
        "ON r_regionkey = n_regionkey GROUP BY r_name ORDER BY r_name LIMIT 1"
    ).first()
    assert row["n"] == 5

    from be_analytic_etl_spark.__main__ import main

    rc = main(["sql", "SELECT COUNT(*) AS n FROM nation", "--sf-dir", SF_DIR])
    assert rc == 0
    assert "25" in capsys.readouterr().out


def test_cli_lint_strict_fails_on_row_udf(spark, tmp_path, capsys):
    """--strict returns non-zero when the plan has an error finding."""
    from pyspark.sql.types import IntegerType

    from be_analytic_etl_spark.registry import QUERIES

    plus_one = F.udf(lambda x: x + 1, IntegerType())

    def bad_query(s, sf_dir):
        from be_analytic_etl_spark.sources import load_table

        return load_table(s, sf_dir, "nation").select(
            plus_one(F.col("n_nationkey")).alias("k")
        )

    QUERIES["__lint_test_bad"] = bad_query
    try:
        from be_analytic_etl_spark.__main__ import main

        rc = main(["lint", "__lint_test_bad", "--sf-dir", SF_DIR, "--strict"])
        assert rc == 1
        assert "row-python-udf" in capsys.readouterr().out
    finally:
        del QUERIES["__lint_test_bad"]


def test_scan_census_bounds_to_own_detail_block(spark):
    """A scan whose detail block lacks ReadSchema must not inherit the
    NEXT scan's schema (the census search is block-bounded, not a fixed
    2000-char window)."""
    from be_analytic_etl_spark.plans.lint import top_level_fields

    # depth-0 comma counting: nested struct fields are one column
    assert top_level_fields("a:bigint,b:string") == 2
    assert top_level_fields("a:struct<b:int,c:int>,d:int>") == 2
    assert top_level_fields("") == 0
    assert top_level_fields("x:array<struct<y:int,z:int>>>") == 1


def test_scan_census_counts_pruned_columns(spark):
    from be_analytic_etl_spark.plans.lint import lint_plan

    df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    scans = [f for f in lint_plan(df) if f.code == "scan"]
    assert len(scans) == 1
    assert "2 columns read" in scans[0].detail, scans[0].detail


def test_cli_lint_sources_clean(capsys):
    """The source-level class-6 lint is exposed on the CLI and the tree
    is clean (no raw libm/sqrt decimal casts)."""
    from be_analytic_etl_spark.__main__ import main

    rc = main(["lint-sources"])
    assert rc == 0
