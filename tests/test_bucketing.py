"""Bucketed co-located joins (operators/bucketing.py): the bucketed plan
must carry ZERO exchanges where the plain-parquet join shuffles both
sides, with identical results."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cnosdb_spark.operators import bucketing


@pytest.fixture()
def no_broadcast(spark):
    """Force SortMergeJoin so the exchange count is the signal."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_no_exchange(spark, no_broadcast):
    orders = spark.range(0, 20_000).select(
        F.col("id").alias("o_id"), (F.col("id") % 997).alias("o_custkey")
    )
    customers = spark.range(0, 997).select(
        F.col("id").alias("c_custkey"), F.concat(F.lit("c"), F.col("id")).alias("c_name")
    )
    try:
        bucketing.write_bucketed(
            orders.withColumnRenamed("o_custkey", "custkey"), "t_orders_b", "custkey", 8
        )
        bucketing.write_bucketed(
            customers.withColumnRenamed("c_custkey", "custkey"), "t_cust_b", "custkey", 8
        )
        joined = bucketing.bucketed_tables_join(spark, "t_orders_b", "t_cust_b", "custkey")
        plan = joined._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
        )
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan  # co-located: no shuffle

        # identical results to the plain join
        plain = orders.join(
            customers, orders.o_custkey == customers.c_custkey
        ).count()
        assert joined.count() == plain

        # the unbucketed control DOES shuffle both sides
        ub = orders.withColumnRenamed("o_custkey", "custkey").join(
            customers.withColumnRenamed("c_custkey", "custkey"), "custkey"
        )
        ub_plan = ub._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
        )
        assert ub_plan.count("Exchange hashpartitioning") >= 2
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_cust_b")


def test_bucketed_aggregation_no_exchange(spark, no_broadcast):
    """Aggregating a bucketed table ON the bucket key also skips the
    exchange — bucketing pays for itself beyond joins."""
    df = spark.range(0, 10_000).select(
        (F.col("id") % 321).alias("k"), F.col("id").alias("v")
    )
    try:
        bucketing.write_bucketed(df, "t_agg_b", "k", 8)
        agg = spark.table("t_agg_b").groupBy("k").agg(F.sum("v").alias("s"))
        plan = agg._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
        )
        assert "Exchange hashpartitioning" not in plan
        want = {(r["k"], r["s"]) for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()}
        got = {(r["k"], r["s"]) for r in agg.collect()}
        assert got == want
    finally:
        spark.sql("DROP TABLE IF EXISTS t_agg_b")


def test_bucketed_band_index_colocated_check(spark, no_broadcast):
    """The incremental-dedup docstring claim, plan-pinned: with the band
    index stored BUCKETED on _bucket, the index side of
    dedup_against_index's candidate join carries no exchange — only the
    (small) arriving batch is shuffled to match the layout. The
    unbucketed control shuffles the index side too, and both layouts
    return identical pairs."""
    from cnosdb_spark.operators import bucketing, dedup

    corpus = spark.createDataFrame(
        [(i, f"some corpus text number {i % 7} with shared shingles here")
         for i in range(50)],
        ["doc_id", "text"],
    )
    batch = spark.createDataFrame(
        [(100 + i, f"some corpus text number {i % 7} with shared shingles here")
         for i in range(5)],
        ["doc_id", "text"],
    )
    band = dedup.minhash_band_table(corpus, "text", "doc_id")
    try:
        bucketing.write_bucketed(band, "t_band_ix_b", "_bucket", 8)
        ix_b = spark.table("t_band_ix_b")
        out_b = dedup.dedup_against_index(batch, ix_b, "text", "doc_id")
        plan = out_b._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
        )
        out_u = dedup.dedup_against_index(batch, band, "text", "doc_id")
        plan_u = out_u._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
        )
        # bucketing removes exactly the index-side exchange
        assert (
            plan.count("Exchange hashpartitioning")
            == plan_u.count("Exchange hashpartitioning") - 1
        )
        got_b = {(r.id_new, r.id_match, r.source) for r in out_b.collect()}
        got_u = {(r.id_new, r.id_match, r.source) for r in out_u.collect()}
        assert got_b == got_u and got_b
    finally:
        spark.sql("DROP TABLE IF EXISTS t_band_ix_b")
