"""Skew-salting join (operators/skew.py) and Z-order clustering
(operators/zorder.py): result equivalence, spread/pruning properties."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cnosdb_spark.operators import skew, zorder


# ---------------------------------------------------------------------
# salted_join
# ---------------------------------------------------------------------

def _skewed_data(spark):
    # one mega-key (k0: 5000 rows) + a long tail
    big = spark.range(0, 6000).select(
        F.when(F.col("id") < 5000, "k0")
        .otherwise(F.concat(F.lit("k"), (F.col("id") - 4999).cast("string")))
        .alias("k"),
        F.col("id").alias("payload"),
    )
    dim = spark.createDataFrame(
        [(f"k{i}", f"v{i}") for i in range(0, 1001)], ["k", "attr"]
    )
    return big, dim


def test_salted_join_matches_plain_inner_and_left(spark):
    big, dim = _skewed_data(spark)
    for how in ("inner", "left"):
        got = skew.salted_join(big, dim, "k", n_salts=8, how=how)
        want = big.join(dim, "k", how)
        assert got.columns == want.columns
        g = {(r["k"], r["payload"], r["attr"]) for r in got.collect()}
        w = {(r["k"], r["payload"], r["attr"]) for r in want.collect()}
        assert g == w


def test_salted_join_spreads_hot_key(spark):
    big, dim = _skewed_data(spark)
    s = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(8)).cast("int")
    )
    per_salt = (
        s.filter(F.col("k") == "k0").groupBy("_salt").count().collect()
    )
    # the 5000 hot-key rows land in every salt bucket, none dominating
    assert len(per_salt) == 8
    assert max(r["count"] for r in per_salt) < 5000 * 0.3


def test_salted_join_spreads_fully_duplicate_rows(spark):
    """Hot-key rows whose EVERY column is identical (sentinel/default rows)
    must still spread across salts — the salt mixes a per-row ordinal, not
    just the column hash."""
    dup = spark.range(0, 5000).select(
        F.lit("k0").alias("k"), F.lit(0).alias("payload")  # 5000 identical rows
    )
    dim = spark.createDataFrame([("k0", "v0")], ["k", "attr"])
    # result parity still holds
    got = skew.salted_join(dup, dim, "k", n_salts=8).count()
    assert got == 5000
    # and the spread: re-derive the salt expression the helper uses
    s = dup.withColumn(
        "_salt",
        F.pmod(
            F.xxhash64(*[F.col(c) for c in dup.columns], F.monotonically_increasing_id()),
            F.lit(8),
        ).cast("int"),
    )
    per_salt = s.groupBy("_salt").count().collect()
    assert len(per_salt) == 8
    assert max(r["count"] for r in per_salt) < 5000 * 0.3


def test_salted_join_rejects_outer(spark):
    big, dim = _skewed_data(spark)
    with pytest.raises(ValueError, match="inner/left"):
        skew.salted_join(big, dim, "k", how="full")


# ---------------------------------------------------------------------
# z-order
# ---------------------------------------------------------------------

def test_zorder_prunes_both_columns(spark, tmp_path):
    """Uniform grid data written x-sorted vs z-ordered into the same file
    count: the x-sort prunes x perfectly but reads EVERY file for a y
    predicate; the z-order layout prunes a narrow range on EITHER column
    to a strict subset of files."""
    n_files = 8
    df = spark.range(0, 40_000).select(
        (F.col("id") % 200).cast("double").alias("x"),
        ((F.col("id") / 200).cast("long") % 200).cast("double").alias("y"),
        F.col("id").alias("payload"),
    )
    xs_path = str(tmp_path / "xsort")
    zo_path = str(tmp_path / "zorder")
    df.repartitionByRange(n_files, "x").sortWithinPartitions("x").write.parquet(xs_path)
    zorder.zorder_frame(df, ["x", "y"], n_partitions=n_files).write.parquet(zo_path)

    # narrow y-range query: x-sorted layout overlaps every file
    y_xs, total_xs = zorder.file_pruning_stats(spark, xs_path, "y", 10, 20)
    y_zo, total_zo = zorder.file_pruning_stats(spark, zo_path, "y", 10, 20)
    assert y_xs == total_xs  # no pruning at all on the non-sort column
    assert y_zo < total_zo  # z-order prunes on y...
    x_zo, _ = zorder.file_pruning_stats(spark, zo_path, "x", 10, 20)
    assert x_zo < total_zo  # ...AND still prunes on x


def test_zorder_preserves_rows(spark):
    df = spark.range(0, 5000).select(
        (F.col("id") % 100).alias("x"),
        (F.col("id") % 77).alias("y"),
        F.col("id").alias("payload"),
    )
    out = zorder.zorder_frame(df, ["x", "y"], n_partitions=4)
    assert out.columns == df.columns
    assert out.count() == 5000
    assert out.agg(F.sum("payload")).first()[0] == df.agg(F.sum("payload")).first()[0]


def test_zorder_all_null_column_raises(spark):
    df = spark.range(0, 100).select(
        F.col("id").alias("x"), F.lit(None).cast("double").alias("y")
    )
    with pytest.raises(ValueError, match="'y' has no non-NULL"):
        zorder.zorder_frame(df, ["x", "y"])


def test_zorder_value_guards(spark):
    with pytest.raises(ValueError, match="2-4"):
        zorder.zorder_value([F.col("a")], [0], [1])
    with pytest.raises(ValueError, match="under 63"):
        zorder.zorder_value(
            [F.col("a"), F.col("b"), F.col("c"), F.col("d")], [0] * 4, [1] * 4, bits=16
        )
