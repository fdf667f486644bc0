"""Temporal join operators: as-of join and interval range join.

Not in the reference surface (SURVEY §2.3: CnosDB has no as-of/range/
interval join) — these are the canonical custom temporal operators a
time-series engine at scale needs (sensor enrichment, trade-vs-quote,
event-in-session attribution), added as first-class DataFrame
combinators.

Scale shapes:

- ``asof_join`` is the classic distributed as-of: union both sides
  tagged, ONE hash shuffle on the key, per-partition time sort, and a
  last-non-null window carry — no nested-loop, no per-row probe. Cost is
  one exchange + sort regardless of how unbalanced the sides are.
- ``interval_range_join`` is the bucketized range join: intervals are
  exploded into fixed-width time buckets (bounded by ``max_buckets``),
  points hash to exactly one bucket, and the match is an equi-join on
  (key, bucket) refined by the exact range predicate — turning what
  Spark would otherwise plan as a broadcast-nested-loop into a keyed
  shuffle join. DuckDB evaluates the same joins natively (ASOF JOIN /
  inequality join), giving both operators an exact oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str = "time",
    right_time: str = "time",
    value_cols: list[str] | None = None,
    tolerance: str | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For every left row, attach the most recent right row with the same
    ``key`` and ``right_time <= left_time`` (backward as-of; ties at equal
    time match). ``tolerance`` (an INTERVAL string like '10 minutes')
    drops matches older than ``left_time - tolerance``.

    Output: all left columns + matched ``<right_time><suffix>`` + each
    value column as ``<name><suffix>`` (NULL when no match).

    Union + single window pass — both sides shuffle ONCE on the key; no
    join node at all, so skew on the time axis is irrelevant and key skew
    is the ordinary window-skew case (AQE-salted upstream if needed).
    """
    value_cols = value_cols or [
        c for c in right.columns if c not in (key, right_time)
    ]
    lcols = left.columns
    # the matched right row travels as ONE struct so a NULL in one of its
    # value columns stays NULL in the output — independent per-column
    # carries would back-fill it from an OLDER right row, synthesizing a
    # composite row that never existed
    r_struct = F.struct(
        F.col(right_time).alias("_rt"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
    )
    r_type = right.select(r_struct.alias("_r")).schema[0].dataType
    l_tag = left.select(
        F.col(key).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(0).alias("_side"),
        F.struct(*lcols).alias("_l"),
        F.lit(None).cast(r_type).alias("_r"),
    )
    r_tag = right.select(
        F.col(key).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(left.select(F.struct(*lcols)).schema[0].dataType).alias("_l"),
        r_struct.alias("_r"),
    )
    # right rows sort BEFORE left rows at the same timestamp so an
    # equal-time quote is visible to the event (backward as-of tie rule)
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), F.col("_side").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        l_tag.unionByName(r_tag)
        .select("*", F.last("_r", ignorenulls=True).over(w).alias("_cr"))
        .filter(F.col("_side") == 0)
    )
    matched = F.col("_cr").isNotNull()
    # NULL keys never match under equality-join semantics (the window
    # would otherwise group all NULL keys into one partition and pair them)
    matched = matched & F.col("_k").isNotNull()
    if tolerance is not None:
        matched = matched & (
            F.col("_cr")["_rt"] >= F.col("_t") - F.expr(f"INTERVAL {tolerance}")
        )
    return out.select(
        *[F.col("_l")[c].alias(c) for c in lcols],
        *[
            F.when(matched, F.col("_cr")[f"_v_{c}"]).alias(f"{c}{suffix}")
            for c in value_cols
        ],
        F.when(matched, F.col("_cr")["_rt"]).alias(f"{right_time}{suffix}"),
    )


_INTERVAL_US = {
    "microsecond": 1,
    "millisecond": 1_000,
    "second": 1_000_000,
    "minute": 60_000_000,
    "hour": 3_600_000_000,
    "day": 86_400_000_000,
    "week": 7 * 86_400_000_000,
}


def _interval_micros(text: str) -> int:
    """Parse '<n> <unit>' (e.g. '15 minutes') to microseconds."""
    import re as _re

    m = _re.fullmatch(r"\s*(\d+)\s*([a-zA-Z]+?)s?\s*", text)
    if not m or m.group(2).lower() not in _INTERVAL_US:
        raise ValueError(f"cannot parse interval {text!r}")
    return int(m.group(1)) * _INTERVAL_US[m.group(2).lower()]


def interval_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_time: str = "time",
    start_col: str = "start",
    end_col: str = "end",
    key: str | None = None,
    bucket: str = "1 hour",
    max_buckets: int = 10_000,
) -> DataFrame:
    """Inner-join points to the intervals containing them
    (``start <= t < end``), optionally also matching on ``key``.

    Intervals are exploded into fixed-width time buckets and points hash
    to exactly one bucket, so the match is an equi-join on
    (key?, bucket) + exact-range refinement — a keyed shuffle join, never
    a nested loop. A point lies in exactly one bucket, so no dedup pass
    is needed. ``max_buckets`` bounds the fan-out per interval (same
    guard discipline as the gapfill spine, SURVEY §7.4.1); choose
    ``bucket`` near the typical interval length so fan-out stays O(1).
    """
    # bucket width parsed driver-side: deriving it from
    # to_timestamp('1970-01-01') + INTERVAL would silently shift by the
    # session timezone offset (negative widths under UTC+N)
    width = F.lit(_interval_micros(bucket))
    start_b = F.unix_micros(F.col(start_col).cast("timestamp"))
    end_b = F.unix_micros(F.col(end_col).cast("timestamp"))
    n_b = ((end_b - F.lit(1) - (start_b - F.pmod(start_b, width))) / width).cast("long") + 1
    iv = intervals.select(
        "*",
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.when(
                        n_b > max_buckets,
                        F.raise_error(
                            F.concat(
                                F.lit("interval spans more than "),
                                F.lit(str(max_buckets)),
                                F.lit(" buckets; widen `bucket`"),
                            )
                        ).cast("long"),
                    ).otherwise(F.greatest(n_b - 1, F.lit(0))),
                ),
                lambda i: (start_b - F.pmod(start_b, width)) + i * width,
            )
        ).alias("_bkt"),
    )
    pt = points.select(
        "*",
        (
            F.unix_micros(F.col(point_time).cast("timestamp"))
            - F.pmod(F.unix_micros(F.col(point_time).cast("timestamp")), width)
        ).alias("_bkt"),
    )
    on = [pt["_bkt"] == iv["_bkt"]]
    if key is not None:
        on.append(pt[key] == iv[key])
    joined = pt.join(iv, on[0] if len(on) == 1 else on[0] & on[1], "inner").filter(
        (pt[point_time] >= iv[start_col]) & (pt[point_time] < iv[end_col])
    )
    keep_iv = [c for c in intervals.columns if c != key]
    return joined.select(
        *[pt[c] for c in points.columns],
        *[iv[c] for c in keep_iv],
    )
