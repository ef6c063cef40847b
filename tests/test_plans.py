"""Physical-plan shape assertions: the scale behaviors SCALE_NOTES.md
claims must be visible in `.explain` output — predicate pushdown, column
pruning, broadcast joins, TakeOrderedAndProject, partial aggregation, and
whole-stage codegen on the JVM fast path."""

import pytest

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"


def _plan(spark, name):
    df = entry_mod.queries()[name](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_and_column_pruning(spark):
    plan = _plan(spark, "filter_project")
    # filters reach the parquet scan (plan string truncates the list, so
    # assert on the leading entries)
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan
    # pruned scan: exactly the 5 needed leaf columns
    scan = [l for l in plan.splitlines() if "FileScan" in l][0]
    assert "l_orderkey" in scan and "l_shipdate" in scan
    assert "l_returnflag" not in scan and "l_discount" not in scan


def test_broadcast_join_chosen(spark):
    plan = _plan(spark, "join_customer_orders")
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_semi_join_is_broadcast(spark):
    plan = _plan(spark, "semi_join")
    assert "LeftSemi" in plan
    assert "Broadcast" in plan


def test_topk_is_take_ordered(spark):
    plan = _plan(spark, "topk_orders")
    assert "TakeOrderedAndProject" in plan


def test_agg_is_partial_then_final(spark):
    plan = _plan(spark, "pricing_summary")
    # Catalyst plans hash aggregation in partial+final mode (map-side
    # combine eats skew before the exchange)
    assert plan.count("HashAggregate") >= 2
    assert "partial_" in plan


def test_jvm_fast_path_no_python(spark):
    # higher-order array lambdas stay JVM-side (interpreted Project) but
    # must never fall back to Python eval nodes
    plan = _plan(spark, "quality_scores")
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "FileScan" in plan and "Batched: true" in plan


def test_relational_path_is_codegen(spark):
    df = entry_mod.queries()["pricing_summary"](spark, SF)
    df.collect()  # finalize the AQE plan so codegen markers materialize
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WholeStageCodegen" in plan or "*(" in plan
    assert "ArrowEvalPython" not in plan


def test_chunking_is_single_python_crossing(spark):
    df = entry_mod.queries()["kg_triples"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # exactly one Arrow crossing (the fused mapInArrow kernel), no
    # chained UDF nodes and no pandas conversion layer
    assert plan.count("MapInArrow") == 1
    assert "MapInPandas" not in plan
    assert "ArrowEvalPython" not in plan


def test_pages_metadata_query_never_reads_html(spark, pages_dir):
    from pyspark.sql import functions as F

    pages = spark.read.parquet(f"{pages_dir}/pages.parquet")
    q = pages.groupBy("lang").agg(F.count("*").alias("n"), F.max("warc_ts"))
    plan = q._jdf.queryExecution().executedPlan().toString()
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "html" not in read_schema and "text" not in read_schema
