"""Stream tables + incremental single-aggregation queries.

Reference: /root/reference common/models/src/schema/stream_table_schema.rs
(StreamTable = view over a tskv table + event-time watermark),
query_server/query/src/execution/stream/mod.rs (micro-batch trigger loop,
offset tracking, state save/restore around the single AggregateExec) and
extension/analyse/stream_checker.rs:33-61 (rejected plan shapes).

Spark-first: a stream table IS ``spark.readStream`` over the table's
parquet directory (file-source offsets = the reference's timestamp offsets)
with ``withWatermark`` (= WatermarkNode); stateful incremental aggregation
is Structured Streaming's own state store (= StateSaveExec/StateRestoreExec);
Once/Interval triggers map to ``availableNow``/``processingTime``.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery


@dataclass
class StreamTable:
    """CREATE STREAM TABLE ... WITH (db=..., table=..., event_time_column=...)
    engine=tskv  (stream/basic.slt:40-50)."""

    name: str
    source_path: str
    event_time_column: str
    watermark_delay: str = "0 seconds"
    schema: object = None
    # source identity + declared projection for batch-view registration
    # (stream/basic.slt selects and explains the stream table directly)
    src_db: str = ""
    src_table: str = ""
    columns: list | None = None

    def read(self, spark: SparkSession, schema=None) -> DataFrame:
        reader = spark.readStream
        s = schema or self.schema
        if s is None:
            # file stream sources need an explicit schema: infer from a
            # batch read of the same directory (cheap footer-only read).
            s = spark.read.parquet(self.source_path).schema
        df = reader.schema(s).parquet(self.source_path)
        from cnosdb_spark.session import normalize_timestamps

        # event-time column must be TimestampType whatever the parquet
        # encoding (nanos-long / µs-NTZ / µs-LTZ) — see session.py
        df = normalize_timestamps(df, ts_nanos_long_cols=(self.event_time_column,))
        if self.watermark_delay and self.watermark_delay != "0 seconds":
            df = df.withWatermark(self.event_time_column, self.watermark_delay)
        return df


class StreamPlanChecker:
    """Parity shim for the reference's stream_checker.rs:33-61: a stream
    query supports exactly one aggregation and no join/limit/sort. Spark
    supports more; this checker is opt-in to *match* reference behavior."""

    REJECTED = ("Join", "Sort", "GlobalLimit", "LocalLimit", "Limit", "Offset")

    @classmethod
    def check(cls, df: DataFrame) -> None:
        import re

        plan = df._jdf.queryExecution().logical().toString()
        # node names appear at line starts after tree-drawing prefixes
        node = re.compile(r"(?m)^[\s:+\-'~]*(\w+)")
        ops = [m.group(1) for m in node.finditer(plan)]
        n_agg = sum(1 for o in ops if o == "Aggregate")
        if n_agg > 1:
            raise ValueError("stream query supports at most one aggregation")
        for op in ops:
            if op in cls.REJECTED:
                raise ValueError(f"stream query does not support operator {op}")


def run_incremental_agg(
    stream_df: DataFrame,
    sink_path: str,
    checkpoint: str,
    trigger: str = "once",
    output_mode: str = "append",
    query_name: str | None = None,
    enforce_reference_restrictions: bool = True,
) -> StreamingQuery:
    """Run a (single-aggregation) incremental query into a parquet sink.

    trigger: 'once' (reference TriggerExecutor Once → availableNow) or an
    interval string like '5 seconds' (Interval trigger).
    """
    if enforce_reference_restrictions:
        StreamPlanChecker.check(stream_df)
    writer = stream_df.writeStream.outputMode(output_mode).option(
        "checkpointLocation", checkpoint
    )
    if query_name:
        writer = writer.queryName(query_name)
    if trigger == "once":
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=trigger)
    return writer.format("parquet").start(sink_path)


def dedup_points_stream(
    stream_df: DataFrame,
    tag_cols: list[str],
    time_col: str = "time",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Suppress re-delivered duplicate points at stream-ingest time:
    drop rows whose (series tags, time) key was already seen within the
    watermark window — the streaming guard against client retries and
    at-least-once redelivery.

    Reference parity note: tskv's merge dedups (series, time) LAST-write-
    wins at read/compaction (tskv/src/reader/sort_merge.rs); a streaming
    pipeline cannot know a later write is coming, so this operator is
    FIRST-arrival-wins duplicate *suppression* — exact re-deliveries
    collapse, genuine overwrites still reach storage and are resolved by
    the batch merge-on-read LWW view (catalog dedup view / compaction).

    Scale shape: Structured Streaming keyed state, bounded by the
    watermark — state size is O(points per watermark window), evicted as
    event time advances; no unbounded growth at any throughput.
    """
    df = stream_df
    has_wm = any(
        f.name == time_col
        and any("watermarkDelayMs" in k for k in (f.metadata or {}))
        for f in df.schema.fields
    )
    if not has_wm:
        df = df.withWatermark(time_col, watermark_delay)
    return df.dropDuplicatesWithinWatermark([*tag_cols, time_col])


def run_to_memory(
    stream_df: DataFrame,
    query_name: str,
    output_mode: str = "complete",
) -> StreamingQuery:
    """Drive a streaming aggregation into an in-memory sink synchronously —
    the test harness path (deterministic with availableNow + processAll)."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    return q


def enrich_stream(
    stream_df: DataFrame,
    dim_df: DataFrame,
    on: list[str] | str,
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream-static enrichment join — a Spark-first EXTENSION past the
    reference's stream restrictions (stream_checker.rs rejects every join;
    Structured Streaming natively supports stream⋈static), for the
    classic "join readings against a device/dimension table" shape.

    The static side re-evaluates per micro-batch (a dim update is picked
    up by the next batch) and, when ``broadcast_dim`` (default), is
    broadcast so enrichment never forces a stateful shuffle on the
    stream side — the plan a 1000-executor ingest pipeline needs.

    Deliberately NOT run through StreamPlanChecker: callers who want
    reference-exact behavior keep using run_incremental_agg's default
    enforcement; enrich_stream is the documented opt-out.
    """
    if dim_df.isStreaming:
        raise ValueError("enrich_stream: the dimension side must be a static DataFrame")
    dim = F.broadcast(dim_df) if broadcast_dim else dim_df
    return stream_df.join(dim, on, how)


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    lower: str = "0 seconds",
    upper: str = "1 hour",
    left_watermark: str = "1 hour",
    right_watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream INTERVAL join — a Spark-first EXTENSION
    past the reference's stream restrictions (same opt-out contract as
    ``enrich_stream``; stream_checker.rs rejects every join), for the
    canonical attribution shape: match each right event to left events of
    the same ``key`` with ``right_time`` in
    ``[left_time + lower, left_time + upper]`` (impression→click,
    order→fill, request→response).

    Both sides carry event-time watermarks and the join condition bounds
    the time range on BOTH ends, so Structured Streaming can size and
    EVICT the join state (an unbounded condition would grow state
    forever — the number-one production failure of stream-stream joins).
    State per key is O(events inside the interval + watermark slack).
    Outer variants ("leftOuter"/"rightOuter") emit NULL-padded rows only
    once the watermark proves no match can arrive.

    Column names must be disjoint apart from ``key`` (standard Spark
    join hygiene); the output keeps ONE ``key`` column — the left side's,
    except under "rightOuter" where unmatched right rows carry the only
    non-NULL key, so the right side's survives instead (sinks reject
    duplicate names either way).
    """
    if not (left.isStreaming and right.isStreaming):
        raise ValueError(
            "interval_join_streams: both sides must be streaming DataFrames "
            "(use enrich_stream for stream-static joins)"
        )
    l = left.withWatermark(left_time, left_watermark).alias("l")
    r = right.withWatermark(right_time, right_watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_time}") >= F.col(f"l.{left_time}") + F.expr(f"INTERVAL {lower}"))
        & (F.col(f"r.{right_time}") <= F.col(f"l.{left_time}") + F.expr(f"INTERVAL {upper}"))
    )
    drop_side = "l" if how.lower().replace("_", "") in ("right", "rightouter") else "r"
    return l.join(r, cond, how).drop(F.col(f"{drop_side}.{key}"))


def asof_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    left_id: str,
    value_cols: list[str],
    lookback: str = "1 hour",
    left_watermark: str = "1 hour",
    right_watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream AS-OF enrichment: for each left event, the LATEST
    same-``key`` right event with ``right_time`` in
    ``[left_time - lookback, left_time]`` — the streaming counterpart of
    ``temporal.asof_join(tolerance=lookback)`` (batch parity is
    pytest-pinned), for the "enrich each trade with the freshest quote"
    shape.

    Built as two chained stateful operators (Structured Streaming
    supports this in append mode since 3.5): the watermarked interval
    join generates every candidate within the lookback, then a
    watermarked aggregation keyed on (``left_id``, event time) keeps the
    ``max_by(right_time)`` candidate.  The bounded lookback is what makes
    BOTH state stores evictable — an unbounded as-of would grow right
    state forever, which is why the batch operator's tolerance becomes
    mandatory here.

    INNER semantics: left rows with no right match inside the lookback
    are dropped (a streaming left-outer would hold every result until
    the watermark proves no late quote can arrive — compose
    ``interval_join_streams(how="leftOuter")`` yourself if you want
    that).  ``left_id`` must be unique per left row; right-time ties
    break arbitrarily (same as max_by).  Results emit once the watermark
    passes the row's event time.

    Output: (``left_id``, ``key``, ``left_time``, <value>_right ...).
    """
    joined = interval_join_streams(
        left,
        right,
        key,
        left_time,
        right_time,
        lower=f"-{lookback}",
        upper="0 seconds",
        left_watermark=left_watermark,
        right_watermark=right_watermark,
        how="inner",
    )
    picked = F.max_by(
        F.struct(*[F.col(c) for c in value_cols]), F.col(right_time)
    ).alias("_best")
    out = joined.groupBy(left_id, key, left_time).agg(picked)
    return out.select(
        left_id,
        key,
        left_time,
        *[F.col(f"_best.{c}").alias(f"{c}_right") for c in value_cols],
    )


def sessionize_stream(
    events: DataFrame,
    key: str,
    time_col: str,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    value_col: str | None = None,
) -> DataFrame:
    """Streaming sessionization: group each key's events into sessions
    that close after ``gap`` of inactivity — the streaming counterpart of
    the batch lag-gap sessionization (__spark_entry__.sessionization).

    Spark-first: ``F.session_window`` (native since 3.2) keeps ONE state
    row per open session per key — state is merged as events arrive and
    evicted when the watermark passes session end + gap, so state size is
    bounded by the number of concurrently open sessions, never by stream
    length.  Works in append mode: a session row emits exactly once, when
    the watermark proves no more events can extend it.

    Output per closed session: key, session_start/session_end (µs),
    n_events, and sum_value if ``value_col`` is given.
    """
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col is not None:
        aggs.append(F.round(F.sum(value_col), 6).alias("sum_value"))
    w = events.withWatermark(time_col, watermark)
    out = w.groupBy(
        F.session_window(F.col(time_col), gap).alias("_sw"), F.col(key)
    ).agg(*aggs)
    return out.select(
        key,
        F.unix_micros(F.col("_sw.start")).alias("session_start_us"),
        F.unix_micros(F.col("_sw.end")).alias("session_end_us"),
        "n_events",
        *(["sum_value"] if value_col is not None else []),
    )
