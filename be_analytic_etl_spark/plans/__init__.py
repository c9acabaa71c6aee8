"""Analytical query plans (the engine's "views").

The flagship plan re-expresses the reference's single analytical artifact,
the PostgreSQL view ``consolidacao_de_metricas``
(``/root/reference/README.md:119-213``), as a reusable DataFrame pipeline.
"""

from be_analytic_etl_spark.plans.flagship import (
    consolidacao_de_metricas,
    mom_variation_pivot,
)

__all__ = ["consolidacao_de_metricas", "mom_variation_pivot"]
