"""Continuous-aggregate rollups (hypertable-style downsampling).

The TimescaleDB/InfluxDB-task pattern the task brief calls "hypertable
rollup", built Spark-first: an incrementally-refreshed materialized
downsample of a raw time-series table, stored as MERGEABLE PARTIAL
SEGMENTS.

Design — partial-segment rollup:

* ``refresh_rollup`` runs Structured Streaming over the raw table's
  parquet directory with ``availableNow`` (file-source offsets make each
  refresh process exactly the new files) and appends ONE partial-aggregate
  segment per (bucket, series) per micro-batch: count / sum / min / max
  per field.  No stateful shuffle, no watermark dependency: segments are
  facts about disjoint slices of input, so refresh is idempotent at the
  file level and exact under out-of-order and late arrivals alike —
  late data simply lands as one more mergeable segment.
* ``read_rollup`` re-aggregates segments (sum of counts/sums, min of
  mins, max of maxes; avg = sum/count) — algebraic merge, exactly the
  partial→final split Spark's own HashAggregate uses.  The segment table
  is ~|buckets × series × refreshes| — orders of magnitude smaller than
  the raw data, and compactable by rewriting merged segments.

At 100 TB this is the classic two-tier read: dashboards hit the rollup
(tiny), only the unrolled tail scans raw data.  ``query_two_tier``
stitches those together.

Compared to the reference: CnosDB serves downsampling per-query
(time_window aggregation, SURVEY §2.6); the rollup materializes that
same aggregation ahead of time.  Aggregate semantics (first/last/count)
follow functions/timeseries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def _segment_aggs(fields: list[str], distinct_fields: list[str] | None = None) -> list:
    out = []
    for f in fields:
        c = F.col(f)
        out += [
            F.count(c).alias(f"{f}_cnt"),
            F.sum(c).alias(f"{f}_sum"),
            F.min(c).alias(f"{f}_min"),
            F.max(c).alias(f"{f}_max"),
        ]
    for f in distinct_fields or []:
        # mergeable distinct count: a DataSketches HLL per segment —
        # union-able across segments/refreshes, so approx COUNT DISTINCT
        # survives the partial-segment design (plain counts cannot).
        # hashed on the canonical string form: hll_sketch_agg accepts
        # int/bigint/string/binary only, and the cast keeps any field
        # type (double, timestamp) countable
        out.append(
            F.hll_sketch_agg(F.col(f).cast("string")).alias(f"{f}_hll")
        )
    return out


def _merge_aggs(fields: list[str], distinct_fields: list[str] | None = None) -> list:
    out = []
    for f in fields:
        out += [
            F.sum(f"{f}_cnt").alias(f"{f}_cnt"),
            F.sum(f"{f}_sum").alias(f"{f}_sum"),
            F.min(f"{f}_min").alias(f"{f}_min"),
            F.max(f"{f}_max").alias(f"{f}_max"),
        ]
    for f in distinct_fields or []:
        out.append(F.hll_union_agg(f"{f}_hll").alias(f"{f}_hll"))
    return out


def refresh_rollup(
    spark: SparkSession,
    source_path: str,
    rollup_path: str,
    checkpoint: str,
    bucket: str,
    fields: list[str],
    tags: list[str] | None = None,
    time_col: str = "time",
    distinct_fields: list[str] | None = None,
) -> None:
    """Incremental refresh: aggregate the raw files added since the last
    refresh into partial segments and append them to the rollup store.

    One refresh = one ``availableNow`` streaming run; its file-source
    offsets (the checkpoint) are the high-water mark, so re-running after
    no new data appends nothing and a crashed refresh resumes exactly.
    """
    from cnosdb_spark.session import normalize_timestamps

    schema = spark.read.parquet(source_path).schema
    raw = spark.readStream.schema(schema).parquet(source_path)
    raw = normalize_timestamps(raw, ts_nanos_long_cols=(time_col,))
    keys = [F.window(time_col, bucket).start.alias("bucket")] + [
        F.col(t) for t in (tags or [])
    ]

    # aggregate INSIDE foreachBatch: each segment covers exactly its
    # micro-batch's rows — stateless (no streaming state store), so
    # appended segments never double-count and merge is purely algebraic
    def _write_segment(batch_df, batch_id):
        batch_df.groupBy(*keys).agg(
            *_segment_aggs(fields, distinct_fields)
        ).write.mode("append").parquet(rollup_path)

    q = (
        raw.writeStream.foreachBatch(_write_segment)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_rollup(
    spark: SparkSession,
    rollup_path: str,
    fields: list[str],
    tags: list[str] | None = None,
    distinct_fields: list[str] | None = None,
) -> DataFrame:
    """Merge partial segments into the final rollup: one row per
    (bucket, tags) with count/sum/min/max/avg per field, plus an
    HLL-estimated ``_dcount`` per distinct field."""
    seg = spark.read.parquet(rollup_path)
    out = seg.groupBy("bucket", *(tags or [])).agg(
        *_merge_aggs(fields, distinct_fields)
    )
    for f in fields:
        out = out.withColumn(
            f"{f}_avg",
            F.when(
                F.col(f"{f}_cnt") > 0, F.col(f"{f}_sum") / F.col(f"{f}_cnt")
            ),
        )
    for f in distinct_fields or []:
        out = out.withColumn(
            f"{f}_dcount", F.hll_sketch_estimate(F.col(f"{f}_hll"))
        ).drop(f"{f}_hll")
    return out


def compact_rollup(
    spark: SparkSession,
    rollup_path: str,
    fields: list[str],
    tags: list[str] | None = None,
    distinct_fields: list[str] | None = None,
) -> None:
    """Rewrite accumulated segments as one merged segment per (bucket,
    tags) — same merge as read_rollup minus the derived columns (avg,
    dcount), HLL sketches unioned but kept as sketches so further
    refreshes stay mergeable; reads after compaction see identical
    values through fewer rows."""
    seg = spark.read.parquet(rollup_path)
    compacted = seg.groupBy("bucket", *(tags or [])).agg(
        *_merge_aggs(fields, distinct_fields)
    )
    tmp = rollup_path.rstrip("/") + "__compact_tmp"
    compacted.write.mode("overwrite").parquet(tmp)
    final = spark.read.parquet(tmp)
    final.write.mode("overwrite").parquet(rollup_path)
    # best-effort tmp cleanup (local/dbfs path)
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)


def query_two_tier(
    spark: SparkSession,
    source_path: str,
    rollup_path: str,
    bucket: str,
    fields: list[str],
    split_ts,
    tags: list[str] | None = None,
    time_col: str = "time",
) -> DataFrame:
    """Two-tier read: buckets strictly before ``split_ts`` come from the
    materialized rollup; the tail (≥ split_ts, the recent window still
    receiving writes) is aggregated from raw on the fly.  ``split_ts``
    must fall on a bucket boundary — callers align it with
    ``F.window``'s epoch-aligned buckets.

    Output schema matches read_rollup.  At scale the raw scan prunes to
    the tail via the pushed ``time >= split_ts`` filter.
    """
    from cnosdb_spark.session import normalize_timestamps

    hist = read_rollup(spark, rollup_path, fields, tags).filter(
        F.col("bucket") < F.lit(split_ts)
    )
    raw = normalize_timestamps(
        spark.read.parquet(source_path), ts_nanos_long_cols=(time_col,)
    ).filter(F.col(time_col) >= F.lit(split_ts))
    keys = [F.window(time_col, bucket).start.alias("bucket")] + [
        F.col(t) for t in (tags or [])
    ]
    tail = raw.groupBy(*keys).agg(*_segment_aggs(fields))
    for f in fields:
        tail = tail.withColumn(
            f"{f}_avg",
            F.when(F.col(f"{f}_cnt") > 0, F.col(f"{f}_sum") / F.col(f"{f}_cnt")),
        )
    return hist.unionByName(tail)
