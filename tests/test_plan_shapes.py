"""Plan-shape regression tests: pushdown, pruning, and join strategies
must stay what the scale design intends — results being right is not
enough."""

from __future__ import annotations

from levi_spark.plans.inspect import plan_summary, pushed_filters, read_schemas
from levi_spark.queries import (
    customer_order_presence,
    ivf_ann_topk,
    q1_pricing_summary,
    q5_local_supplier,
    q6_forecast_revenue,
    q9_profit_by_nation_year,
)

SF = "/root/testdata/sf0.001"


def test_q6_pushdown_and_pruning(spark):
    df = q6_forecast_revenue(spark, SF)
    pf = pushed_filters(df)
    assert any("l_shipdate" in f for f in pf), pf
    assert any("l_discount" in f for f in pf), pf
    assert any("l_quantity" in f for f in pf), pf
    (schema,) = read_schemas(df)
    # projection pruned to exactly the 4 referenced columns
    assert schema.count(":") == 4, schema


def test_q1_scan_prunes_columns(spark):
    (schema,) = read_schemas(q1_pricing_summary(spark, SF))
    # 7 of lineitem's 11 columns are referenced
    assert schema.count(":") == 7, schema


def test_q5_broadcasts_dimensions(spark):
    s = plan_summary(q5_local_supplier(spark, SF))
    # nation + region are explicit broadcasts; AQE may broadcast more
    assert s["broadcast_exchanges"] >= 2, s
    assert s["scans"] == 6, s


def test_q9_broadcasts_three_dims(spark):
    s = plan_summary(q9_profit_by_nation_year(spark, SF))
    assert s["broadcast_exchanges"] >= 3, s


def test_semi_anti_join_operators_used(spark):
    from levi_spark.plans.inspect import executed_plan

    plan = executed_plan(customer_order_presence(spark, SF))
    assert "LeftSemi" in plan, plan[:500]
    assert "LeftAnti" in plan, plan[:500]


def test_ivf_centroid_side_broadcast(spark):
    s = plan_summary(ivf_ann_topk(spark, SF))
    assert s["broadcast_exchanges"] >= 1, s
