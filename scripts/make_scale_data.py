"""Derive a ~N× scale dataset from an existing testdata dir (default:
10× sf0.1 ≈ sf1, 6M lineitem rows) WITHOUT touching the read-only
/root/testdata — output goes to /tmp (or argv[2]).

Replication strategy — union of N key-shifted copies, so every join
relationship survives at N× cardinality:

- TPC-H keys (custkey/orderkey/suppkey/partkey) shift by copy*(max+1);
  nation/region stay fixed (they are fixed-cardinality dims in TPC-H at
  EVERY scale factor — exactly the property the q5 broadcast hints rely
  on).
- events: ids shift; ts shifts by copy*32 days (extends the range, keeps
  per-series cadence and the gapfill 365-day bound); user_id shifts so
  the series count grows with data (how sharding actually scales).
- documents: doc_id shifts; every WORD gets a copy-specific prefix
  ("x3the x3cat ...") so WITHIN-copy near-duplicate structure is
  preserved shingle-for-shingle (the dedup rate and the shingle
  document-frequency distribution stay exactly those of the base corpus)
  while CROSS-copy shingle similarity is exactly zero.  Without a
  perturbation, N identical copies make every doc an N-clique
  (quadratic pair count); with a token INTERLEAVED between words (the
  first attempt), shingles degenerate to single-word patterns whose
  document frequency is stopword-like and the n-gram bucket expansion
  blows up ~3x superlinear — an artifact of the derivation, not the
  operator (measured round 6).
- embeddings: vec_id shifts; the vector is rotated by copy positions
  (decorrelates copies; norms and per-dim stats preserved).

Usage: python scripts/make_scale_data.py [N] [out_dir] [src_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def events_copies(spark, src_dir: str, copies: int):
    """The events-table derivation, shared by derive() (10x) and
    scripts/bench_scale_100x.py (100x): event_id/user_id shift per copy
    (series count grows with data — how sharding actually scales) and
    ts shifts by copy*32 days (extends the range; per-series cadence,
    and therefore per-series gapfill spine density, stays that of the
    base corpus). Changing the strategy here changes BOTH rehearsal
    corpora together."""
    from cnosdb_spark.session import read_table

    e = read_table(spark, src_dir, "events")
    bases = e.agg(
        F.max("event_id").alias("e"), F.max("user_id").alias("u")
    ).first()
    e_base, u_base = bases["e"] + 1, bases["u"] + 1
    outs = [
        e.withColumn("event_id", F.col("event_id") + F.lit(i * e_base))
        .withColumn("user_id", F.col("user_id") + F.lit(i * u_base))
        .withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {i * 32} DAYS"))
        for i in range(copies)
    ]
    u = outs[0]
    for c in outs[1:]:
        u = u.unionAll(c)
    return u


def derive(spark, src_dir: str, out_dir: str, copies: int) -> None:
    from cnosdb_spark.session import read_table

    os.makedirs(out_dir, exist_ok=True)

    def t(name):
        return read_table(spark, src_dir, name)

    def write(df, name, parts=None):
        w = df.repartition(parts) if parts else df
        w.write.mode("overwrite").parquet(os.path.join(out_dir, f"{name}.parquet"))
        print(f"  {name}: {spark.read.parquet(os.path.join(out_dir, f'{name}.parquet')).count()} rows")

    # fixed dims copy through unchanged
    for name in ("region", "nation"):
        write(t(name), name)

    maxes = {
        "c": t("customer").agg(F.max("c_custkey")).first()[0] + 1,
        "o": t("orders").agg(F.max("o_orderkey")).first()[0] + 1,
        "s": t("supplier").agg(F.max("s_suppkey")).first()[0] + 1,
        "p": t("part").agg(F.max("p_partkey")).first()[0] + 1,
        "d": t("documents").agg(F.max("doc_id")).first()[0] + 1,
        "v": t("embeddings").agg(F.max("vec_id")).first()[0] + 1,
    }

    def copies_of(df, shifts: dict[str, int], extra=None):
        outs = []
        for i in range(copies):
            c = df
            for col, base in shifts.items():
                c = c.withColumn(col, F.col(col) + F.lit(i * base))
            if extra is not None:
                c = extra(c, i)
            outs.append(c)
        u = outs[0]
        for c in outs[1:]:
            u = u.unionAll(c)
        return u

    write(copies_of(t("customer"), {"c_custkey": maxes["c"]}), "customer")
    write(copies_of(t("supplier"), {"s_suppkey": maxes["s"]}), "supplier")
    write(copies_of(t("part"), {"p_partkey": maxes["p"]}), "part")
    write(
        copies_of(t("orders"), {"o_orderkey": maxes["o"], "o_custkey": maxes["c"]}),
        "orders",
        parts=8,
    )
    write(
        copies_of(
            t("lineitem"),
            {"l_orderkey": maxes["o"], "l_partkey": maxes["p"], "l_suppkey": maxes["s"]},
        ),
        "lineitem",
        parts=32,
    )
    write(events_copies(spark, src_dir, copies), "events", parts=16)
    write(
        copies_of(
            t("documents"),
            {"doc_id": maxes["d"]},
            extra=lambda c, i: c.withColumn(
                "text", F.regexp_replace(F.col("text"), r"(\S+)", f"x{i}$1")
            ) if i else c,
        ),
        "documents",
        parts=16,
    )
    write(
        copies_of(
            t("embeddings"),
            {"vec_id": maxes["v"]},
            extra=lambda c, i: c.withColumn(
                "embedding",
                F.concat(
                    F.slice("embedding", i + 1, 64 - i), F.slice("embedding", 1, i)
                ),
            ) if i else c,
        ),
        "embeddings",
        parts=4,
    )


def main():
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfscale1"
    src_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    from cnosdb_spark.session import get_spark

    spark = get_spark(app_name="make_scale_data")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"deriving {copies}x of {src_dir} -> {out_dir}")
    derive(spark, src_dir, out_dir, copies)


if __name__ == "__main__":
    main()
