"""Physical-plan assertions — scale guardrails (SURVEY §7 M6).

These tests pin the plan shapes that matter at 100 TB: predicate
pushdown into the parquet scan, column pruning, broadcast joins for
dimensions, and no accidental single-partition exchanges on data
paths. A green correctness suite with a wrong plan is a latent
100×-slowdown; these make plan regressions loud.
"""

from __future__ import annotations

from mindseye_dataframes_spark.queries import load_all

REGISTRY = load_all()


def plan_of(spark, sf_dir, name: str) -> str:
    return REGISTRY[name].fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()


def explain_formatted(spark, sf_dir, name: str) -> str:
    df = REGISTRY[name].fn(spark, sf_dir)
    return df.sparkSession._jsparkSession.sessionState().executePlan(
        df._jdf.queryExecution().logical(),
        df._jdf.queryExecution().mode(),
    ).explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = explain_formatted(spark, sf_dir, "q02_filter_project")
    assert "PushedFilters:" in plan
    # the selective predicates must be pushed, not applied post-scan only
    assert "l_returnflag" in plan.split("PushedFilters:")[1].splitlines()[0]


def test_column_pruning_q01(spark, sf_dir):
    plan = explain_formatted(spark, sf_dir, "q01_pricing_summary")
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" not in read_schema  # unused columns pruned
    assert "l_quantity" in read_schema


def test_dimension_joins_broadcast(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q05_revenue_by_region")
    assert plan.count("BroadcastHashJoin") >= 3  # customer/nation/region
    assert "CartesianProduct" not in plan


def test_semi_anti_join_strategies(spark, sf_dir):
    semi = plan_of(spark, sf_dir, "q08_semi_join")
    anti = plan_of(spark, sf_dir, "q09_anti_join")
    assert "LeftSemi" in semi
    assert "LeftAnti" in anti


def test_no_single_partition_exchange_on_data_paths(spark, sf_dir):
    """Windows/aggregations must not funnel data through one partition
    (the classic unpartitioned-Window trap)."""
    for name in ("q16_window_topn", "q18_running_sum", "q25_sessionization"):
        plan = plan_of(spark, sf_dir, name)
        body = plan.split("AdaptiveSparkPlan")[-1]
        # final global sort for presentation is fine; data-path windows
        # must be hash-partitioned
        assert "Window" in plan
        for line in body.splitlines():
            if "Window" in line and "windowspecdefinition" in line:
                assert "SinglePartition" not in line, (name, line)


def test_topk_uses_limit_not_full_sort(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q04_topk_orders")
    assert "TakeOrderedAndProject" in plan  # per-partition top-k + merge


def test_asof_join_single_shuffle(spark, sf_dir):
    """The as-of join must stay union+window shaped: no range/cross
    join blowup."""
    plan = plan_of(spark, sf_dir, "q22_asof_join")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
