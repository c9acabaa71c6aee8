"""Round-13 registrations: promote the three staged r12 candidates.

The queries themselves live in ``queries_round13_candidates`` where they
were implemented, oracle-twinned, value-checked at sf0.001/0.01/0.1 and
degenerate-hardened one round BEFORE registration (the staged-merge
discipline applied to new queries — see that module's docstring for the
semantics of each). This module is the promotion: three ``register()``
calls, executed inside the r13 driver window so the queries' first
ledger rows are driver-checked rather than trailing un-verified.
"""

from __future__ import annotations

from be_analytic_etl_spark.queries_round13_candidates import (
    binseg2_changepoint,
    binseg2_changepoint_oracle,
    fdr_bh_panel,
    fdr_bh_panel_oracle,
    two_proportion_panel,
    two_proportion_panel_oracle,
)
from be_analytic_etl_spark.registry import register

register("two_proportion_panel", two_proportion_panel, two_proportion_panel_oracle())
register("binseg2_changepoint", binseg2_changepoint, binseg2_changepoint_oracle())
register("fdr_bh_panel", fdr_bh_panel, fdr_bh_panel_oracle())
