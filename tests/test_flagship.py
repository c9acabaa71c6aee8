"""Flagship query (consolidacao_de_metricas shape) vs DuckDB oracle."""

from __future__ import annotations

import datetime

from tests.conftest import SF_DIR, assert_matches_oracle

from be_analytic_etl_spark.plans.flagship import (
    consolidacao_de_metricas,
    create_consolidacao_view,
    flagship_orders,
    flagship_orders_oracle_sql,
)


def test_flagship_orders_matches_oracle(spark, duck):
    df = flagship_orders(spark, SF_DIR)
    assert_matches_oracle(df, duck, flagship_orders_oracle_sql())


def _synthetic_ida_fact(spark):
    """Synthetic IDA fact table exercising group gaps, NULL valores, zero
    previous-month average, and months with a single group (HAVING)."""
    rows = []
    rid = 0
    groups = ["ALGAR", "CLARO", "OI", "TIM", "VIVO", "NEXTEL"]
    for m in range(1, 13):
        mes = datetime.date(2020, m, 1)
        for gi, g in enumerate(groups):
            if m == 5 and g != "ALGAR":
                continue  # month with one group -> HAVING must drop it
            if m == 3 and g == "OI":
                continue  # gap for one group
            rid += 1
            valor = None if (m == 4 and g == "TIM") else float(10 * (gi + 1) + m)
            if g == "VIVO" and m == 6:
                valor = 0.0  # zero average -> NULLIF branch next month
            rows.append(
                (
                    rid,
                    g,
                    "Indicador de Desempenho no Atendimento (IDA)",
                    mes,
                    valor,
                    "SMP",
                )
            )
            # noise rows under a different metric: must be filtered out
            rows.append((10000 + rid, g, "Taxa de Resolvidas em 5 dias úteis", mes, 99.9, "SMP"))
    return spark.createDataFrame(
        rows,
        "id long, grupo_economico string, servico string, "
        "mes_referencia date, valor double, tipo_servico string",
    )


def test_consolidacao_view_on_synthetic_ida(spark):
    fact = _synthetic_ida_fact(spark)
    out = consolidacao_de_metricas(fact)
    res = out.collect()
    assert len(res) > 0
    meses = [r["mes"] for r in res]
    assert meses == sorted(meses, reverse=True)
    assert "2020-05" not in meses  # single-group month dropped by HAVING
    cols = out.columns
    assert cols[0] == "mes" and "taxa_media" in cols
    for g in ["algar", "claro", "oi", "tim", "vivo", "nextel"]:
        assert g in cols and f"{g}_diff" in cols
    # zero-average guard: July VIVO had prev avg 0 -> row filtered, pivot
    # coalesces to 0.0 rather than inf/null
    july = [r for r in res if r["mes"] == "2020-07"]
    if july:
        assert july[0]["vivo"] == 0.0


def test_sql_view_equals_dataframe_plan(spark):
    """The spark.sql text of the view (S14) and the DataFrame chain must be
    the same query — identical rows, identical column order."""
    fact = _synthetic_ida_fact(spark)
    df_out = consolidacao_de_metricas(fact)
    sql_out = create_consolidacao_view(spark, fact)
    assert df_out.columns == sql_out.columns
    assert sorted(map(tuple, df_out.collect())) == sorted(map(tuple, sql_out.collect()))
