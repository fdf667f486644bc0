"""State-store evidence for the stream-stream joins.

The batch-side scale rehearsal (bench_scale.py) cannot show that the
streaming operators' state stays BOUNDED across micro-batches — the
number-one production failure of stream-stream joins is unbounded state.
This harness stages the events table as time-ordered file slices, drives
``interval_join_streams`` and ``asof_join_streams`` through availableNow
with maxFilesPerTrigger=1 (one time slice per micro-batch, so the
watermark advances batch over batch), and records every micro-batch's
``stateOperators`` progress: rows held, rows removed (eviction), state
memory.

Eviction holds iff (a) peak state rows stay well below cumulative input
and (b) the final far-future sentinel slice flushes state down to ~the
watermark slack.  Writes BENCH_STREAM_STATE.json.

Usage:
  python scripts/bench_stream_state.py [sf_dir ...]   # default sf0.1
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
from datetime import timedelta

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cnosdb_spark.session import get_spark, read_table

N_SLICES = 12


def _stage_slices(df, ts_col: str, out_dir: str, sentinel_row) -> None:
    """Write df as N_SLICES time-ordered parquet files with strictly
    increasing mtimes (FileStreamSource reads oldest-mtime first), plus a
    final far-future sentinel slice that pushes the watermark past all
    real data so every state row becomes evictable before the query
    drains."""
    os.makedirs(out_dir)
    lo, hi = df.agg(F.min(ts_col), F.max(ts_col)).first()
    span = (hi - lo) or timedelta(seconds=1)
    staging = tempfile.mkdtemp(prefix="slice_stage_")
    mtime = 1_700_000_000
    for i in range(N_SLICES):
        a = lo + span * i / N_SLICES
        b = lo + span * (i + 1) / N_SLICES
        cond = (F.col(ts_col) >= F.lit(a)) & (
            (F.col(ts_col) < F.lit(b)) if i < N_SLICES - 1 else (F.col(ts_col) <= F.lit(b))
        )
        part_dir = os.path.join(staging, f"s{i}")
        df.filter(cond).coalesce(1).write.parquet(part_dir)
        _move_part(part_dir, out_dir, f"slice_{i:03d}.parquet", mtime + i * 10)
    spark = df.sparkSession
    sent_dir = os.path.join(staging, "sent")
    spark.createDataFrame([sentinel_row], schema=df.schema).coalesce(1).write.parquet(
        sent_dir
    )
    _move_part(sent_dir, out_dir, f"slice_{N_SLICES:03d}.parquet", mtime + N_SLICES * 10)
    shutil.rmtree(staging)


def _move_part(part_dir: str, out_dir: str, name: str, mtime: int) -> None:
    part = next(f for f in os.listdir(part_dir) if f.endswith(".parquet"))
    dst = os.path.join(out_dir, name)
    shutil.move(os.path.join(part_dir, part), dst)
    os.utime(dst, (mtime, mtime))


def _progress_evidence(q, out_path: str, spark) -> dict:
    batches = []
    for p in q.recentProgress:
        d = p if isinstance(p, dict) else json.loads(p.json)
        if not d.get("stateOperators"):
            continue
        batches.append(
            {
                "batch": d["batchId"],
                "input_rows": d.get("numInputRows", 0),
                "state": [
                    {
                        "op": so.get("operatorName", "?"),
                        "rows_total": so.get("numRowsTotal"),
                        "rows_removed": so.get("numRowsRemoved"),
                        "mem_bytes": so.get("memoryUsedBytes"),
                    }
                    for so in d["stateOperators"]
                ],
            }
        )
    peak = max(
        (sum(s["rows_total"] or 0 for s in b["state"]) for b in batches), default=0
    )
    final = sum(s["rows_total"] or 0 for s in batches[-1]["state"]) if batches else 0
    removed = sum(
        s["rows_removed"] or 0 for b in batches for s in b["state"]
    )
    total_in = sum(b["input_rows"] for b in batches)
    return {
        "n_batches": len(batches),
        "total_input_rows": total_in,
        "peak_state_rows": peak,
        "final_state_rows": final,
        "state_rows_removed": removed,
        "peak_state_over_input": round(peak / total_in, 4) if total_in else None,
        "output_rows": spark.read.parquet(out_path).count(),
        "batches": batches,
    }


def run_session(spark, sf_dir: str) -> dict:
    """Round-7 sessionize_stream: one state row per OPEN session per key
    (F.session_window merging state) — peak state must track concurrently
    open sessions, never stream length, and the sentinel must flush every
    session."""
    from cnosdb_spark.streaming import stream_table

    e = read_table(spark, sf_dir, "events")
    base = tempfile.mkdtemp(prefix="stream_state_session_")
    src, out = f"{base}/events", f"{base}/out"
    far = e.agg(F.max("ts")).first()[0] + timedelta(days=60)
    ev = e.select("user_id", "ts", "value")
    _stage_slices(ev, "ts", src, (-1, far, 0.0))
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out_df = stream_table.sessionize_stream(
        stream, key="user_id", time_col="ts", gap="30 minutes",
        watermark="1 hour", value_col="value",
    )
    q = (
        out_df.writeStream.option("checkpointLocation", f"{base}/ck")
        .trigger(availableNow=True)
        .format("parquet")
        .start(out)
    )
    q.awaitTermination(600)
    evd = _progress_evidence(q, out, spark)
    shutil.rmtree(base, ignore_errors=True)
    return evd


def run_one(spark, sf_dir: str, which: str) -> dict:
    """which: 'interval' or 'asof'."""
    from cnosdb_spark.streaming import stream_table

    e = read_table(spark, sf_dir, "events")
    base = tempfile.mkdtemp(prefix=f"stream_state_{which}_")
    t_path, q_path, out = f"{base}/left", f"{base}/right", f"{base}/out"
    far = e.agg(F.max("ts")).first()[0] + timedelta(days=60)

    left = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("p_ts")
    )
    right = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts"), "value"
    )
    _stage_slices(left, "p_ts", t_path, (-1, -1, far))
    _stage_slices(right, "c_ts", q_path, (-2, far, 0.0))

    t_s = (
        spark.readStream.schema(left.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(t_path)
    )
    q_s = (
        spark.readStream.schema(right.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(q_path)
    )
    if which == "interval":
        out_df = stream_table.interval_join_streams(
            t_s, q_s, key="user_id", left_time="p_ts", right_time="c_ts",
            lower="-6 hours", upper="0 seconds",
        )
    else:
        out_df = stream_table.asof_join_streams(
            t_s, q_s, key="user_id", left_time="p_ts", right_time="c_ts",
            left_id="event_id", value_cols=["value"], lookback="6 hours",
        )
    q = (
        out_df.writeStream.option("checkpointLocation", f"{base}/ck")
        .trigger(availableNow=True)
        .format("parquet")
        .start(out)
    )
    q.awaitTermination(600)
    ev = _progress_evidence(q, out, spark)
    shutil.rmtree(base, ignore_errors=True)
    return ev


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1"]
    spark = get_spark(app_name="bench_stream_state")
    spark.sparkContext.setLogLevel("ERROR")
    result = {
        "metric": "stream_state_eviction",
        "n_slices_per_side": N_SLICES,
        "note": "one time-slice file per micro-batch per side "
        "(maxFilesPerTrigger=1); final slice is a far-future sentinel. "
        "Eviction holds iff peak_state_rows stays bounded vs input and "
        "the sentinel flushes final_state_rows to ~watermark slack.",
        "datasets": {},
    }
    for d in dirs:
        key = d.rstrip("/").rsplit("/", 1)[-1]
        result["datasets"][key] = {}
        for which in ("interval", "asof", "session"):
            ev = (
                run_session(spark, d) if which == "session"
                else run_one(spark, d, which)
            )
            result["datasets"][key][which] = ev
            print(
                f"{key} {which}: batches={ev['n_batches']} "
                f"input={ev['total_input_rows']} peak_state={ev['peak_state_rows']} "
                f"final_state={ev['final_state_rows']} "
                f"removed={ev['state_rows_removed']} out={ev['output_rows']}",
                flush=True,
            )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "BENCH_STREAM_STATE.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: v for k, v in result.items() if k != "datasets"}))


if __name__ == "__main__":
    main()
