"""Per-tick cost evidence for the always-on streaming dedup.

``dedup_stream_against_index`` holds NO streaming state (foreachBatch
over bounded micro-batches), so the state-store harness
(bench_stream_state.py) doesn't apply.  Its 100 TB claim is a different
one: per-tick cost tracks the BATCH plus the (id, bucket) band INDEX —
never the corpus text.  This harness measures exactly that: constant-size
ticks arrive one per micro-batch while the self-updating index grows with
every tick; if the claim holds, per-tick wall stays ~flat as the index
multiplies, because the only growing input is the narrow band table
(4 rows x 2 columns per doc), not the corpus bytes.

Method: stage N_TICKS equal slices of sf0.1 documents as mtime-ordered
files, seed the index from a disjoint corpus half, run ONE availableNow
pass with maxFilesPerTrigger=1 (each slice = one tick), and record each
tick's wall from StreamingQueryProgress plus the index row count it ran
against.  Per-tick wall is measured within a single query run, so ticks
share one measurement window (the interleaved-design analogue: ratios
between ticks are host-drift-resistant; raw seconds carry the window).

Writes the result under "stream_dedup" in BENCH_STREAM_STATE.json.

Usage:
  python scripts/bench_stream_dedup.py [sf_dir]   # default sf0.1
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cnosdb_spark.calibration import run_calibration
from cnosdb_spark.operators import dedup
from cnosdb_spark.session import get_spark, read_table

N_TICKS = 8


def _stage_ticks(docs, src_dir: str) -> int:
    """Write docs as N_TICKS equal-size mtime-ordered parquet files (one
    micro-batch each under maxFilesPerTrigger=1)."""
    os.makedirs(src_dir)
    staging = tempfile.mkdtemp(prefix="tick_stage_")
    mtime = 1_700_000_000
    per_tick = None
    # ticks carry doc_id % 16 in 0..7 — each residue class is one tick
    tick_key = F.col("doc_id") % 16
    for i in range(N_TICKS):
        part = docs.filter(tick_key == i)
        if per_tick is None:
            per_tick = part.count()
        part_dir = os.path.join(staging, f"t{i}")
        part.coalesce(1).write.parquet(part_dir)
        f = next(p for p in os.listdir(part_dir) if p.endswith(".parquet"))
        dst = os.path.join(src_dir, f"tick_{i:03d}.parquet")
        shutil.move(os.path.join(part_dir, f), dst)
        os.utime(dst, (mtime + i * 10, mtime + i * 10))
    shutil.rmtree(staging)
    return per_tick


def run(spark, sf_dir: str) -> dict:
    d = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    # seed index: ONE 1/16 slice; ticks: eight more 1/16 slices — so the
    # run multiplies the index ~9x while every tick stays the same size
    # (the strongest version of the claim: flat per-tick wall across an
    # order-of-magnitude index growth)
    seed = d.filter(F.col("doc_id") % 16 == 8)
    ticks = d.filter(F.col("doc_id") % 16 < 8)
    base = tempfile.mkdtemp(prefix="stream_dedup_bench_")
    src, out, ix = f"{base}/in", f"{base}/out", f"{base}/ix"
    per_tick = _stage_ticks(ticks, src)
    dedup.minhash_band_table(seed, "text", "doc_id").write.parquet(ix)
    seed_rows = spark.read.parquet(ix).count()

    q = (
        dedup.dedup_stream_against_index(
            spark.readStream.schema(ticks.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src),
            None,  # self-updating: index re-read per tick, grows per tick
            out,
            f"{base}/ck",
            "text",
            "doc_id",
            update_index_path=ix,
        )
        .trigger(availableNow=True)
        .start()
    )
    from __spark_entry__ import _await_stream

    _await_stream(q, 1800)

    batches = []
    for p in q.recentProgress:
        prog = p if isinstance(p, dict) else json.loads(p.json)
        if not prog.get("numInputRows"):
            continue
        batches.append(
            {
                "batch": prog["batchId"],
                "input_rows": prog["numInputRows"],
                "tick_wall_ms": prog["batchDuration"],
            }
        )
    # index rows each tick ran against: seed + (ticks processed so far)
    band_rows_per_tick = (
        (spark.read.parquet(ix).count() - seed_rows) // max(len(batches), 1)
    )
    for i, b in enumerate(batches):
        b["index_rows_at_tick"] = seed_rows + i * band_rows_per_tick
    flagged = spark.read.parquet(out).count()
    walls = [b["tick_wall_ms"] for b in batches]
    # drift-resistant headline: last-vs-first-half ratio within the one
    # shared window; flat (~1.0) = per-tick cost independent of index
    # age. Batch 0 is EXCLUDED — it carries query start, committer init
    # and the first index read, which would bias the ratio below 1.0
    # and let a genuinely growing per-tick cost still read as flat.
    warm = walls[1:] if len(walls) > 2 else walls
    half = max(len(warm) // 2, 1)
    # MEANS, not sums: an odd warm count makes the halves unequal sizes
    early = sum(warm[:half]) / half
    late = sum(warm[half:]) / max(len(warm) - half, 1)
    ratio = round(late / max(early, 1e-9), 3)
    growth = round(
        batches[-1]["index_rows_at_tick"] / max(batches[0]["index_rows_at_tick"], 1), 3
    ) if batches else None
    shutil.rmtree(base)
    return {
        "note": (
            "constant-size ticks vs a self-updating index: per-tick wall "
            "must NOT track index age (corpus text never rescanned; only "
            "the narrow band table grows). late_over_early_wall_warm "
            "~1.0 = flat (batch 0 excluded: query-start + "
            "first-index-read warmup); index_growth_over_run is the "
            "growth the flatness survived."
        ),
        "n_ticks": len(batches),
        "docs_per_tick": per_tick,
        "seed_index_rows": seed_rows,
        "late_over_early_wall_warm": ratio,
        "index_growth_over_run": growth,
        "flagged_pairs": flagged,
        "ticks": batches,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark()
    spark.range(1000).count()
    cal = run_calibration(spark)
    result = run(spark, sf_dir)
    result["calibration_sec"] = cal
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "BENCH_STREAM_STATE.json")
    with open(path) as f:
        artifact = json.load(f)
    artifact["stream_dedup"] = {"dataset": os.path.basename(sf_dir), **result}
    with open(path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps({k: v for k, v in result.items() if k != "ticks"}))


if __name__ == "__main__":
    main()
