"""state_agg / compact_state_agg + duration_in / state_at.

Reference: /root/reference query_server/query/src/extension/expr/
aggregate_function/state_agg/{mod,state_agg_accumulator,state_agg_data}.rs
(time spent in each discrete state) and scalar_function/{duration_in.rs,
state_at.rs}.

Spark-first: the duration a series spends in a state is
``lead(time) - time`` per row (window over time order), then a plain
groupBy sum — two JVM-side operators, one shuffle on the series key.
The last observed state has no following edge; its duration is 0 (matching
the reference, which only counts closed intervals unless an explicit
interval end is supplied).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def state_durations(
    df: DataFrame,
    time_col: str,
    state_col: str,
    group_cols: list[str],
    out_col: str = "duration_s",
) -> DataFrame:
    """Per (group, state): total seconds spent in the state.

    This is ``state_agg(time, state)`` materialized relationally (one row
    per state instead of a map column) — the natural Spark shape; callers
    needing the map can ``map_from_entries(collect_list(...))`` on top.
    """
    w = Window.partitionBy(*group_cols).orderBy(time_col)
    dur = (F.unix_micros(F.lead(time_col).over(w)) - F.unix_micros(F.col(time_col))) / 1e6
    return (
        df.withColumn("_dur", F.coalesce(dur, F.lit(0.0)))
        .groupBy(*group_cols, state_col)
        .agg(F.sum("_dur").alias(out_col))
    )


def compact_state_agg(
    df: DataFrame,
    time_col: str,
    state_col: str,
    group_cols: list[str],
) -> DataFrame:
    """``compact_state_agg``: like state_agg but merges consecutive runs of
    the same state before measuring (the reference's compact variant drops
    interior points). Result is identical durations; exposed for parity and
    for callers that want the run-length view (one row per state *run*).
    """
    w = Window.partitionBy(*group_cols).orderBy(time_col)
    changed = (
        F.lag(state_col).over(w).isNull()
        | (F.lag(state_col).over(w) != F.col(state_col))
    ).cast("int")
    runs = df.withColumn("_new_run", changed).withColumn(
        "_run_id", F.sum("_new_run").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    run_edges = runs.groupBy(*group_cols, "_run_id", state_col).agg(
        F.min(time_col).alias("_run_start")
    )
    w2 = Window.partitionBy(*group_cols).orderBy("_run_start")
    dur = (
        F.unix_micros(F.lead("_run_start").over(w2)) - F.unix_micros(F.col("_run_start"))
    ) / 1e6
    return (
        run_edges.withColumn("_dur", F.coalesce(dur, F.lit(0.0)))
        .groupBy(*group_cols, state_col)
        .agg(F.sum("_dur").alias("duration_s"))
    )


def duration_in(
    df: DataFrame,
    time_col: str,
    state_col: str,
    group_cols: list[str],
    state: str,
) -> DataFrame:
    """``duration_in(state_agg(...), state)`` — scalar lookup
    (scalar_function/duration_in.rs). Groups that never enter the state get
    duration 0 (left join against the group universe)."""
    durs = state_durations(df, time_col, state_col, group_cols)
    universe = df.select(*group_cols).distinct()
    hit = durs.filter(F.col(state_col) == state).drop(state_col)
    return universe.join(hit, on=group_cols, how="left").fillna(
        {"duration_s": 0.0}
    )


def state_at(
    df: DataFrame,
    time_col: str,
    state_col: str,
    group_cols: list[str],
    ts: str,
) -> DataFrame:
    """``state_at(state_agg(...), ts)``: the state in effect at ``ts`` —
    an as-of lookup over CLOSED periods [tᵢ, tᵢ₊₁). The final observed
    state is a zero-length period, so ``ts`` at/after the series' last
    point yields NULL (scalar_function/state_at.rs; state_at.slt's
    '2020-01-05 12:00:00' → NULL record)."""
    lit_ts = F.lit(ts).cast("timestamp")
    as_of = F.max_by(
        state_col, F.when(F.col(time_col) <= lit_ts, F.col(time_col))
    )
    return df.groupBy(*group_cols).agg(
        F.when(F.max(time_col) > lit_ts, as_of).alias("state")
    )
