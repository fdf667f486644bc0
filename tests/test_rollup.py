"""Continuous-aggregate rollup tests: incremental refresh over growing
raw data, mergeable-partial-segment reads, compaction invariance, and the
two-tier (rollup + raw tail) query — each checked against the equivalent
one-shot batch aggregation."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from cnosdb_spark.operators import rollup


BASE = datetime(2024, 1, 1)


def _mk_raw(spark, path, lo, hi):
    rows = [
        (BASE + timedelta(minutes=m), f"s{m % 3}", float(m), float(100 - m))
        for m in range(lo, hi)
    ]
    spark.createDataFrame(rows, ["time", "tag", "v", "w"]).write.mode(
        "append"
    ).parquet(path)


def _batch_expect(spark, path, fields=("v",)):
    df = spark.read.parquet(path)
    aggs = []
    for f in fields:
        aggs += [
            F.count(f).alias(f"{f}_cnt"),
            F.sum(f).alias(f"{f}_sum"),
            F.min(f).alias(f"{f}_min"),
            F.max(f).alias(f"{f}_max"),
            (F.sum(f) / F.count(f)).alias(f"{f}_avg"),
        ]
    return {
        tuple(r[k] for k in ("bucket", "tag"))
        + tuple(r[f"{f}_{a}"] for f in fields for a in ("cnt", "sum", "min", "max", "avg"))
        for r in df.groupBy(
            F.window("time", "15 minutes").start.alias("bucket"), "tag"
        )
        .agg(*aggs)
        .collect()
    }


def _rollup_rows(spark, rp, fields=("v",)):
    return {
        tuple(r[k] for k in ("bucket", "tag"))
        + tuple(r[f"{f}_{a}"] for f in fields for a in ("cnt", "sum", "min", "max", "avg"))
        for r in rollup.read_rollup(spark, rp, list(fields), ["tag"]).collect()
    }


def test_incremental_refresh_matches_batch(spark, tmp_path):
    src, rp, ck = (str(tmp_path / p) for p in ("raw", "roll", "ck"))
    _mk_raw(spark, src, 0, 40)
    rollup.refresh_rollup(spark, src, rp, ck, "15 minutes", ["v"], ["tag"])
    assert _rollup_rows(spark, rp) == _batch_expect(spark, src)

    # late + new data lands as additional mergeable segments: second
    # refresh only reads the new files (availableNow offsets), including
    # out-of-order rows for already-rolled buckets
    _mk_raw(spark, src, 40, 70)   # new buckets
    _mk_raw(spark, src, 5, 8)     # late duplicates into the FIRST bucket
    rollup.refresh_rollup(spark, src, rp, ck, "15 minutes", ["v"], ["tag"])
    assert _rollup_rows(spark, rp) == _batch_expect(spark, src)


def test_refresh_is_idempotent_without_new_data(spark, tmp_path):
    src, rp, ck = (str(tmp_path / p) for p in ("raw", "roll", "ck"))
    _mk_raw(spark, src, 0, 30)
    rollup.refresh_rollup(spark, src, rp, ck, "15 minutes", ["v"], ["tag"])
    n1 = spark.read.parquet(rp).count()
    rollup.refresh_rollup(spark, src, rp, ck, "15 minutes", ["v"], ["tag"])
    assert spark.read.parquet(rp).count() == n1


def test_compaction_preserves_results(spark, tmp_path):
    src, rp, ck = (str(tmp_path / p) for p in ("raw", "roll", "ck"))
    _mk_raw(spark, src, 0, 40)
    rollup.refresh_rollup(spark, src, rp, ck, "15 minutes", ["v"], ["tag"])
    _mk_raw(spark, src, 40, 80)
    rollup.refresh_rollup(spark, src, rp, ck, "15 minutes", ["v"], ["tag"])
    before = _rollup_rows(spark, rp)
    n_seg_before = spark.read.parquet(rp).count()
    rollup.compact_rollup(spark, rp, ["v"], ["tag"])
    assert _rollup_rows(spark, rp) == before
    assert spark.read.parquet(rp).count() <= n_seg_before


def test_two_tier_query_matches_batch(spark, tmp_path):
    src, rp, ck = (str(tmp_path / p) for p in ("raw", "roll", "ck"))
    _mk_raw(spark, src, 0, 60)
    rollup.refresh_rollup(spark, src, rp, ck, "15 minutes", ["v"], ["tag"])
    _mk_raw(spark, src, 60, 75)  # tail written AFTER the last refresh
    split = BASE + timedelta(minutes=45)  # bucket-aligned
    got = {
        tuple(r[k] for k in ("bucket", "tag", "v_cnt", "v_sum", "v_avg"))
        for r in rollup.query_two_tier(
            spark, src, rp, "15 minutes", ["v"], split, ["tag"]
        ).collect()
    }
    expect = {
        (r[0], r[1], r[2], r[3], r[6])
        for r in _batch_expect(spark, src)
    }
    assert got == expect


def test_multi_field_rollup(spark, tmp_path):
    src, rp, ck = (str(tmp_path / p) for p in ("raw", "roll", "ck"))
    _mk_raw(spark, src, 0, 30)
    rollup.refresh_rollup(spark, src, rp, ck, "15 minutes", ["v", "w"], ["tag"])
    assert _rollup_rows(spark, rp, ("v", "w")) == _batch_expect(
        spark, src, ("v", "w")
    )


def test_distinct_count_rollup_hll(spark, tmp_path):
    """HLL distinct-count segments merge across refreshes AND survive
    compaction: the estimated per-bucket distinct tag-of-minute count must
    match the exact batch distinct (small cardinalities are exact in
    HLL)."""
    src, rp, ck = (str(tmp_path / p) for p in ("raw", "roll", "ck"))
    _mk_raw(spark, src, 0, 40)
    rollup.refresh_rollup(
        spark, src, rp, ck, "15 minutes", ["v"], ["tag"], distinct_fields=["v"]
    )
    _mk_raw(spark, src, 40, 70)
    _mk_raw(spark, src, 5, 8)  # duplicate v values into the first bucket
    rollup.refresh_rollup(
        spark, src, rp, ck, "15 minutes", ["v"], ["tag"], distinct_fields=["v"]
    )

    def got():
        return {
            (r["bucket"], r["tag"]): r["v_dcount"]
            for r in rollup.read_rollup(
                spark, rp, ["v"], ["tag"], distinct_fields=["v"]
            ).collect()
        }

    exact = {
        (r["bucket"], r["tag"]): r["d"]
        for r in spark.read.parquet(src)
        .groupBy(F.window("time", "15 minutes").start.alias("bucket"), "tag")
        .agg(F.countDistinct("v").alias("d"))
        .collect()
    }
    assert got() == exact  # tiny cardinalities: HLL is exact
    rollup.compact_rollup(spark, rp, ["v"], ["tag"], distinct_fields=["v"])
    assert got() == exact


def test_replayed_batch_does_not_double_count(spark, tmp_path):
    """foreachBatch is at-least-once: simulate a crash between the segment
    write and the checkpoint commit by deleting the last commit marker —
    the replayed batch must REWRITE its batch=<id> partition, leaving the
    rollup identical to the one-shot batch aggregation (ADVICE r05)."""
    import os

    src, rp, ck = (str(tmp_path / p) for p in ("raw", "roll", "ck"))
    _mk_raw(spark, src, 0, 40)
    rollup.refresh_rollup(spark, src, rp, ck, "15 minutes", ["v"], ["tag"])
    commits = sorted(
        f for f in os.listdir(os.path.join(ck, "commits")) if f.isdigit()
    )
    os.remove(os.path.join(ck, "commits", commits[-1]))  # "crash" pre-commit
    crc = os.path.join(ck, "commits", f".{commits[-1]}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    rollup.refresh_rollup(spark, src, rp, ck, "15 minutes", ["v"], ["tag"])
    assert _rollup_rows(spark, rp) == _batch_expect(spark, src)


def test_refresh_refuses_reset_checkpoint(spark, tmp_path):
    """Checkpoint deleted while the store is kept: batch ids would restart
    at 0 and silently overwrite existing segments — refresh must refuse."""
    import shutil

    src, rp, ck = (str(tmp_path / p) for p in ("raw", "roll", "ck"))
    _mk_raw(spark, src, 0, 30)
    rollup.refresh_rollup(spark, src, rp, ck, "15 minutes", ["v"], ["tag"])
    shutil.rmtree(ck)  # the operator error the guard exists for
    _mk_raw(spark, src, 30, 40)
    with pytest.raises(RuntimeError, match="never logged"):
        rollup.refresh_rollup(spark, src, rp, ck, "15 minutes", ["v"], ["tag"])
    # a DIFFERENT fresh checkpoint path is the same hazard
    with pytest.raises(RuntimeError, match="never logged"):
        rollup.refresh_rollup(
            spark, src, rp, str(tmp_path / "ck2"), "15 minutes", ["v"], ["tag"]
        )


def test_refresh_refuses_fresh_checkpoint_on_compacted_store(spark, tmp_path):
    """A compacted store (only batch=-1 left) with a fresh checkpoint would
    re-ingest every raw file and double-count — refuse that too."""
    import shutil

    src, rp, ck = (str(tmp_path / p) for p in ("raw", "roll", "ck"))
    _mk_raw(spark, src, 0, 30)
    rollup.refresh_rollup(spark, src, rp, ck, "15 minutes", ["v"], ["tag"])
    rollup.compact_rollup(spark, rp, ["v"], ["tag"])
    shutil.rmtree(ck)
    with pytest.raises(RuntimeError, match="re-ingest"):
        rollup.refresh_rollup(spark, src, rp, ck, "15 minutes", ["v"], ["tag"])
    # the happy path still works: compacted store + ORIGINAL checkpoint
    # (exercised by test_compaction_preserves_results + further refreshes)


def test_compact_refuses_inflight_refresh(spark, tmp_path):
    import os

    src, rp, ck = (str(tmp_path / p) for p in ("raw", "roll", "ck"))
    _mk_raw(spark, src, 0, 30)
    rollup.refresh_rollup(spark, src, rp, ck, "15 minutes", ["v"], ["tag"])
    commits = sorted(
        f for f in os.listdir(os.path.join(ck, "commits")) if f.isdigit()
    )
    os.remove(os.path.join(ck, "commits", commits[-1]))
    crc = os.path.join(ck, "commits", f".{commits[-1]}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    with pytest.raises(RuntimeError, match="written-but-uncommitted"):
        rollup.compact_rollup(spark, rp, ["v"], ["tag"], checkpoint=ck)
    # restore the commit → compaction proceeds and preserves results
    rollup.refresh_rollup(spark, src, rp, ck, "15 minutes", ["v"], ["tag"])
    before = _rollup_rows(spark, rp)
    rollup.compact_rollup(spark, rp, ["v"], ["tag"], checkpoint=ck)
    assert _rollup_rows(spark, rp) == before


def test_compact_refuses_leftover_swap_dirs(spark, tmp_path):
    src, rp, ck = (str(tmp_path / p) for p in ("raw", "roll", "ck"))
    _mk_raw(spark, src, 0, 30)
    rollup.refresh_rollup(spark, src, rp, ck, "15 minutes", ["v"], ["tag"])
    leftover = rp + "__compact_old"
    import os

    os.makedirs(leftover)
    with pytest.raises(RuntimeError, match="crash mid-swap"):
        rollup.compact_rollup(spark, rp, ["v"], ["tag"])
    os.rmdir(leftover)


def test_name_collision_raises(spark, tmp_path):
    with pytest.raises(ValueError, match="collision"):
        rollup.read_rollup(spark, str(tmp_path), ["v"], ["bucket"])
    with pytest.raises(ValueError, match="collision"):
        rollup.read_rollup(spark, str(tmp_path), ["bucket"], ["tag"])
    with pytest.raises(ValueError, match="collision"):
        rollup.read_rollup(spark, str(tmp_path), ["v"], ["v_cnt"])
    with pytest.raises(ValueError, match="collision"):
        rollup.read_rollup(spark, str(tmp_path), ["v"], ["batch"])


def test_two_tier_split_validation(spark, tmp_path):
    src, rp, ck = (str(tmp_path / p) for p in ("raw", "roll", "ck"))
    _mk_raw(spark, src, 0, 60)  # rolled buckets: 00:00 .. 00:45
    rollup.refresh_rollup(spark, src, rp, ck, "15 minutes", ["v"], ["tag"])
    _mk_raw(spark, src, 60, 75)  # tail after the last refresh

    # a split past the high-water mark would lose buckets from both tiers
    with pytest.raises(ValueError, match="high-water"):
        rollup.query_two_tier(
            spark, src, rp, "15 minutes", ["v"],
            BASE + timedelta(minutes=90), ["tag"],
        )

    # derived split (None) = start of the last rolled bucket → exact
    got = {
        (r["bucket"], r["tag"], r["v_cnt"], r["v_sum"], r["v_avg"])
        for r in rollup.query_two_tier(
            spark, src, rp, "15 minutes", ["v"], None, ["tag"]
        ).collect()
    }
    expect = {(r[0], r[1], r[2], r[3], r[6]) for r in _batch_expect(spark, src)}
    assert got == expect


def test_histogram_rollup_quantiles(spark, tmp_path):
    """Fixed-bin histogram segments merge across refreshes and survive
    compaction; histogram_quantile estimates match exact percentiles to
    within one bin width."""
    src, rp, ck = (str(tmp_path / p) for p in ("raw", "roll", "ck"))
    hspec = {"v": (0.0, 100.0, 50)}  # bin width 2.0
    _mk_raw(spark, src, 0, 60)
    rollup.refresh_rollup(
        spark, src, rp, ck, "1 hour", ["v"], ["tag"], histograms=hspec
    )
    _mk_raw(spark, src, 60, 100)  # second refresh: bins must SUM
    rollup.refresh_rollup(
        spark, src, rp, ck, "1 hour", ["v"], ["tag"], histograms=hspec
    )

    def check():
        merged = rollup.read_rollup(spark, rp, ["v"], ["tag"], histograms=hspec)
        got = {
            (r["bucket"], r["tag"]): (r["p50"], r["p95"], sum(r["v_hist"]))
            for r in merged.select(
                "bucket", "tag", "v_hist",
                rollup.histogram_quantile(F.col("v_hist"), 0.0, 100.0, 0.5).alias("p50"),
                rollup.histogram_quantile(F.col("v_hist"), 0.0, 100.0, 0.95).alias("p95"),
            ).collect()
        }
        exact = {
            (r["bucket"], r["tag"]): (r["p50"], r["p95"], r["n"])
            for r in spark.read.parquet(src)
            .groupBy(F.window("time", "1 hour").start.alias("bucket"), "tag")
            .agg(
                F.percentile("v", F.lit(0.5)).alias("p50"),
                F.percentile("v", F.lit(0.95)).alias("p95"),
                F.count("v").alias("n"),
            )
            .collect()
        }
        assert set(got) == set(exact)
        for key, (g50, g95, gn) in got.items():
            e50, e95, en = exact[key]
            assert gn == en  # bin mass conserved across merges
            # bound: one bin width vs the empirical CDF, plus up to half a
            # bin of divergence from the ORACLE's own interpolation between
            # order statistics on small per-bucket counts
            assert abs(g50 - e50) <= 3.0 + 1e-9, (key, g50, e50)
            assert abs(g95 - e95) <= 3.0 + 1e-9, (key, g95, e95)

    check()
    rollup.compact_rollup(spark, rp, ["v"], ["tag"], histograms=hspec)
    check()  # identical through compaction


def test_histogram_name_collision(spark, tmp_path):
    with pytest.raises(ValueError, match="collision"):
        rollup.read_rollup(
            spark, str(tmp_path), ["v"], ["v_hist"], histograms={"v": (0, 1, 4)}
        )


def test_pairing_guard_warns_on_remote_paths():
    """Round-7 ADVICE: for s3://-style stores/checkpoints the os.listdir
    guard cannot see anything — it must warn that it is skipped, never
    silently pass."""
    import warnings

    from cnosdb_spark.operators.rollup import _guard_checkpoint_store_pairing

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        _guard_checkpoint_store_pairing("s3://bucket/store", "s3://bucket/ck")
    assert any("SKIPPED for non-local" in str(x.message) for x in w)
