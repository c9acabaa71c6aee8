"""Divergence-class-6 source lint (SCALE.md): no decimal cast of a raw
libm/sqrt output may be committed without stable_round protection.

The six cross-engine float-divergence classes were each discovered LIVE
at a new scale factor (class 6 mis-hashed ext_class_separation at
sf0.01, round 8, commit 45684fe); this test turns the greppable rule
into CI so the seventh cannot land. The five sites fixed in the round-8
audit (embedding-stats mean-norm, BM25 term scores, DSIR llr, PMI,
label-balance entropy / temperature-weights pow) are the regression
fixtures: each must remain protected in the current tree.
"""

from __future__ import annotations

import os

from be_analytic_etl_spark.plans.lint import lint_decimal_casts

PKG = os.path.join(os.path.dirname(os.path.dirname(__file__)), "be_analytic_etl_spark")


def test_no_raw_irrational_decimal_casts():
    findings = lint_decimal_casts(PKG)
    assert findings == [], "\n".join(str(f) for f in findings)


def test_lint_flags_naked_site(tmp_path):
    # A synthetic naked site — the exact shape of the pre-45684fe bug
    # (sqrt output cast straight to DECIMAL) — must be flagged.
    bad = tmp_path / "bad.py"
    bad.write_text(
        'dist = F.sqrt(s2)\n'
        'out = df.select(dist.cast("decimal(18,6)").alias("d"))\n'
    )
    findings = lint_decimal_casts(str(tmp_path))
    assert len(findings) == 1
    assert findings[0].code == "raw-irrational-decimal-cast"
    assert "bad.py:2" in findings[0].detail


def test_lint_accepts_protected_and_exempt_sites(tmp_path):
    ok = tmp_path / "ok.py"
    ok.write_text(
        # helper-protected
        'a = stable_round(F.sqrt(s2), 9).cast("decimal(28,9)")\n'
        "\n" * 10
        # expanded stable_round_sql fingerprint
        + 'sql1 = """CAST((CASE WHEN (sqrt(x)) IS NULL OR isnan(sqrt(x))\n'
        '  THEN sqrt(x) ELSE floor(sqrt(x) * 1e6 + 0.5) / 1e6 END)\n'
        '  AS DECIMAL(18,6))"""\n'
        "\n" * 10
        # documented exemption marker
        + '# decimal-exempt: operand is an exact 2dp cents value\n'
        + 'b = F.log(n)  # used elsewhere\n'
        + 'c = cents.cast("decimal(18,2)")\n'
        "\n" * 10
        # exact operand, no risk token -> never flagged
        + 'd = F.count(F.lit(1)).cast("decimal(38,0)")\n'
    )
    assert lint_decimal_casts(str(tmp_path)) == []


def test_round8_fixed_sites_still_protected():
    """The five class-6 audit sites (commit 45684fe) stay stable_round-
    protected: find each file's risky cast neighborhoods and require
    zero findings file-by-file (a regression would reintroduce the
    exact bug class the audit cleared)."""
    fixed_files = [
        "queries_extensions.py",   # embedding_stats mean_norm
        "queries_round5.py",       # BM25 / DSIR llr / PMI / label balance
        "queries_round8.py",       # class-separation distance sums
        "operators/normalize.py",  # temperature_weights pow
    ]
    findings = lint_decimal_casts(PKG)
    flagged = {f.detail.split(":")[0] for f in findings}
    for rel in fixed_files:
        assert rel not in flagged
