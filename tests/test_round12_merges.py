"""Round-12 STAGED merge panels (registry capacity policy step 1,
VERDICT r11 ask #6): the kmins/windowed-HLL and zorder write/skip pairs
are implemented as unregistered panel helpers so r13 can reclaim two
window slots without rework. Each panel must carry BOTH parents'
readouts verbatim AND match its staged DuckDB oracle — the full dress
rehearsal for registration. The registry itself is untouched this
round (273 + 3 new = 276 < 288, the ceiling does not bind)."""

from __future__ import annotations

# registry first: importing a queries_* module directly would begin the
# registration import chain from the middle (circular-import trap)
from be_analytic_etl_spark import registry  # noqa: F401

SF_DIR = "/root/testdata/sf0.001"


def test_distinct_sketch_panel_carries_both_parents(spark):
    from be_analytic_etl_spark.queries_round5 import q_ext_windowed_hll
    from be_analytic_etl_spark.queries_round8 import q_ext_kmins_distinct
    from be_analytic_etl_spark.queries_round12 import distinct_sketch_panel

    rows = distinct_sketch_panel(spark, SF_DIR).collect()
    km = {
        (r.scope, float(r.estimate), r.aux)
        for r in rows
        if r.sketch == "kmins"
    }
    wh = {
        (r.day, r.scope, float(r.estimate), r.aux)
        for r in rows
        if r.sketch == "whll_daily"
    }
    assert km == {
        (r.scope, float(r.kmins_est), r.n_rows)
        for r in q_ext_kmins_distinct(spark, SF_DIR).collect()
    }
    assert wh == {
        (r.day, r.event_type, float(r.hll_estimate), r.n_registers_used)
        for r in q_ext_windowed_hll(spark, SF_DIR).collect()
    }
    assert len(km) > 0 and len(wh) > 0
    # kmins rows carry a NULL day (no time window) — the panel must not
    # invent one
    assert all(r.day is None for r in rows if r.sketch == "kmins")


def test_zorder_panel_carries_both_parents(spark):
    from be_analytic_etl_spark.queries_extensions import q_ext_zorder
    from be_analytic_etl_spark.queries_round5 import q_ext_zorder_skipping
    from be_analytic_etl_spark.queries_round12 import zorder_panel

    rows = zorder_panel(spark, SF_DIR).collect()
    zw = {
        (r.bucket, r.n_rows, r.v1, r.v2, r.v3)
        for r in rows
        if r.leg == "zwrite"
    }
    zs = {
        (r.bucket, r.n_rows, r.v1, r.v2, r.v3, r.v4, r.touches_probe)
        for r in rows
        if r.leg == "zskip"
    }
    assert zw == {
        (r.zbucket, r.n, r.zsum, r.zmin, r.zmax)
        for r in q_ext_zorder(spark, SF_DIR).collect()
    }
    assert zs == {
        (
            r.bucket, r.n_rows, r.min_x, r.max_x, r.min_y, r.max_y,
            r.touches_probe,
        )
        for r in q_ext_zorder_skipping(spark, SF_DIR).collect()
    }
    assert len(zw) > 0 and len(zs) > 0
    assert all(
        r.v4 is None and r.touches_probe is None
        for r in rows
        if r.leg == "zwrite"
    )


def test_staged_panels_match_their_oracles(spark, duck):
    """Value-hash the staged panels against their staged oracles now —
    if the r13 registration ever happens, it must be a pure rename."""
    from tests.conftest import assert_matches_oracle

    from be_analytic_etl_spark.queries_round12 import (
        distinct_sketch_panel,
        distinct_sketch_panel_oracle,
        zorder_panel,
        zorder_panel_oracle,
    )

    assert_matches_oracle(
        distinct_sketch_panel(spark, SF_DIR), duck,
        distinct_sketch_panel_oracle(),
    )
    assert_matches_oracle(
        zorder_panel(spark, SF_DIR), duck, zorder_panel_oracle()
    )
