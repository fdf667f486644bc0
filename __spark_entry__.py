"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry is an operator from SURVEY.md §2 (or a
training-data-pipeline operator) implemented Spark-first in
``cnosdb_spark``; ``oracle_sql()`` holds the DuckDB-equivalent ANSI SQL.
Column names and rounding are aligned on both sides (the driver hashes
values after sorting columns by name).

Conventions:
- timestamps are returned as epoch microseconds (BIGINT) — engine-neutral;
- float aggregates are rounded on BOTH sides (same decimals) so double
  summation order can't flip the value hash;
- every ordering that feeds a LIMIT carries a unique tie-break key.
"""

from __future__ import annotations

import math
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from cnosdb_spark.functions import (
    bottom as ts_bottom,
    first_agg,
    gauge_agg,
    increase,
    last_agg,
    mode_df,
    sample_deterministic,
    state_at,
    state_durations,
    duration_in,
    time_window_gapfill,
    topk as ts_topk,
)
from cnosdb_spark.functions.quality import data_quality
from cnosdb_spark.functions.repair import value_fill
from cnosdb_spark.operators import (
    curation,
    dedup,
    multimodal,
    scoring,
    similarity,
    temporal,
    text,
)
from cnosdb_spark.operators.multimodal import extract_features, synthetic_media

_REGISTRY: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLES: dict[str, str] = {}


def _q(name: str, oracle: str | None = None):
    def deco(fn):
        _REGISTRY[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from cnosdb_spark.session import read_table

    return read_table(spark, sf_dir, name)


def _stream_scope(spark, *staged_paths: str):
    """Scale-adaptive state-partition scope for a file-source streaming
    query: size spark.sql.shuffle.partitions for the stream from the
    staged input's on-disk bytes (see session.stream_state_partitions —
    a structural no-op at production input sizes)."""
    from cnosdb_spark.session import (
        dir_bytes,
        scoped_shuffle_partitions,
        stream_state_partitions,
    )

    n = stream_state_partitions(spark, sum(dir_bytes(p) for p in staged_paths))
    return scoped_shuffle_partitions(spark, n)


def _await_stream(q, timeout: int = 300) -> None:
    """awaitTermination(timeout) returns False on TIMEOUT without raising —
    a slow host (this VM's CPU swings 2-3x) would then read a PARTIAL
    output directory and surface as a confusing oracle-parity mismatch.
    Fail loudly instead."""
    if not q.awaitTermination(timeout):
        q.stop()
        raise TimeoutError(
            f"streaming query {q.name or q.id} did not finish in {timeout}s"
        )


def normalize_timestamps(df, ts_nanos_long_cols: tuple[str, ...] = ("ts",)):
    from cnosdb_spark.session import normalize_timestamps as _n

    return _n(df, ts_nanos_long_cols)


# =====================================================================
# Relational core (DataFusion-inherited surface, SURVEY §2.2-§2.8)
# =====================================================================

@_q(
    "tpch_q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           round(sum(l_extendedprice), 2)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 4)                                        AS avg_qty,
           round(avg(l_extendedprice), 4)                                   AS avg_price,
           round(avg(l_discount), 6)                                        AS avg_disc,
           CAST(count(*) AS BIGINT)                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1(spark, sf_dir):
    """Hash aggregate partial→final (SURVEY §2.4); filter pushdown to scan."""
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(disc), 2).alias("sum_disc_price"),
        F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@_q(
    "tpch_q3_shipping_priority",
    """
    SELECT o_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           epoch_us(o_orderdate)                             AS orderdate_us
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-01-01'
      AND l_shipdate  > TIMESTAMP '1997-01-01'
    GROUP BY o_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def tpch_q3(spark, sf_dir):
    """Multi-join + agg + top-N (TakeOrderedAndProject). No join hints:
    customer and orders grow O(SF), so a pinned broadcast of either side
    would hit Spark's 8 GB broadcast cap at large SF. AQE selects the
    strategy from runtime stats (broadcast at small SF, shuffle join at
    scale) — the only plan shape that survives 100×."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1997-01-01")
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1997-01-01")
    co = c.join(o, c.c_custkey == o.o_custkey)
    return (
        l.join(co, co.o_orderkey == l.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select(
            "o_orderkey", "revenue", F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("orderdate_us")
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@_q(
    "tpch_q5_local_supplier",
    """
    SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM region JOIN nation   ON n_regionkey = r_regionkey
                JOIN customer ON c_nationkey = n_nationkey
                JOIN orders   ON o_custkey   = c_custkey
                JOIN lineitem ON l_orderkey  = o_orderkey
                JOIN supplier ON s_suppkey   = l_suppkey AND s_nationkey = c_nationkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
)
def tpch_q5(spark, sf_dir):
    """Six-table join gauntlet. Only the fixed-cardinality dims (region:
    5 rows, nation: 25 rows — constant at every SF) carry broadcast
    hints; customer/orders/supplier grow O(SF), so their join strategy is
    left to AQE (broadcast at small SF from runtime stats, shuffle join
    past the 8 GB cap). lineitem, the fact table, never broadcasts.

    The region⋈nation PRODUCT carries its own broadcast hint (≤25 rows at
    every SF — still fixed-cardinality): a hint on nation alone only
    covers the region⋈nation join itself, so the follow-on customer join
    planned as an initial SortMergeJoin and shuffled the whole customer
    table by c_nationkey before AQE could demote it (observed r10 with
    static auto-broadcast off)."""
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    rn = F.broadcast(F.broadcast(r).join(n, n.n_regionkey == r.r_regionkey))
    rnco = rn.join(c, c.c_nationkey == n.n_nationkey).join(
        o, o.o_custkey == c.c_custkey
    )
    return (
        l.join(rnco, rnco.o_orderkey == l.l_orderkey)
        .join(
            s,
            (s.s_suppkey == F.col("l_suppkey")) & (s.s_nationkey == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


@_q(
    "join_semi_anti_customers",
    """
    SELECT 'semi' AS op, c_nationkey, CAST(count(*) AS BIGINT) AS n_customers
    FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)
    GROUP BY c_nationkey
    UNION ALL
    SELECT 'anti', c_nationkey, CAST(count(*) AS BIGINT)
    FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    GROUP BY c_nationkey
    UNION ALL
    SELECT 'salted', c_nationkey, CAST(count(*) AS BIGINT)
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_nationkey
    UNION ALL
    SELECT 'salted_left', c_nationkey, CAST(count(*) AS BIGINT)
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_nationkey
    """,
)
def join_semi_anti(spark, sf_dir):
    """LEFT SEMI (= IN/EXISTS) and LEFT ANTI (= NOT IN/NOT EXISTS) joins
    (SURVEY §2.3 decorrelation), one arm each.

    Round-10 salted/salted_left arms: skew.salted_join's contract is that
    the output MULTISET equals the plain join (salt columns are internal);
    the oracle computes the plain inner/left join directly in DuckDB, so
    any salting bug that drops, duplicates, or mis-NULL-pads a row breaks
    the per-nation counts."""
    from cnosdb_spark.operators.skew import salted_join

    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")

    def arm(kind: str, how: str):
        return (
            c.join(o, c.c_custkey == o.o_custkey, how)
            .groupBy("c_nationkey")
            .agg(F.count(F.lit(1)).alias("n_customers"))
            .select(F.lit(kind).alias("op"), "c_nationkey", "n_customers")
        )

    ok = o.select(F.col("o_custkey").alias("c_custkey"), "o_orderkey")
    ck = c.select("c_custkey", "c_nationkey")
    salted = (
        salted_join(ok, ck, "c_custkey", n_salts=8, how="inner")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .select(F.lit("salted").alias("op"), "c_nationkey", "n_customers")
    )
    salted_left = (
        salted_join(ck, ok, "c_custkey", n_salts=8, how="left")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .select(F.lit("salted_left").alias("op"), "c_nationkey", "n_customers")
    )
    return (
        arm("semi", "left_semi")
        .unionAll(arm("anti", "left_anti"))
        .unionAll(salted)
        .unionAll(salted_left)
    )


@_q(
    "join_outer_order_fill",
    """
    SELECT o_orderpriority,
           CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
           CAST(count(l_orderkey) AS BIGINT)          AS n_lineitems
    FROM orders LEFT JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def join_outer(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left")
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_orderkey").alias("n_orders"),
            F.count("l_orderkey").alias("n_lineitems"),
        )
    )


@_q(
    "agg_statistical",
    """
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 6)             AS std_qty,
           round(var_samp(l_quantity), 4)                AS var_qty,
           round(corr(l_quantity, l_extendedprice), 6)   AS corr_qty_price,
           round(covar_pop(l_quantity, l_discount), 6)   AS covar_qty_disc,
           round(avg(l_tax), 6)                          AS avg_tax,
           array_to_string(list_sort(list(DISTINCT l_linestatus)), ',') AS statuses,
           CAST(count(DISTINCT l_partkey) AS BIGINT)     AS n_parts,
           CAST(count(DISTINCT l_suppkey) AS BIGINT)     AS n_supps,
           CAST(count(*) AS BIGINT)                      AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_statistical(spark, sf_dir):
    """Statistical aggregate family (SURVEY §2.4 statistical_agg slt) +
    array_agg emitted as a sorted joined string (order-insensitive) +
    multi-column count(DISTINCT) (distinct.slt).

    The two distinct counts are computed as separate narrow
    distinct→count aggregations joined back on the 3-row group key
    instead of one multi-distinct agg: Spark plans the latter via Expand
    (one input replica per distinct column — 3× the shuffle volume at
    100 TB), while each narrow path shuffles only (flag, key) pairs with
    map-side partial dedup."""
    l = _t(spark, sf_dir, "lineitem")
    stats = l.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("std_qty"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_pop("l_quantity", "l_discount"), 6).alias("covar_qty_disc"),
        F.round(F.avg("l_tax"), 6).alias("avg_tax"),
        F.concat_ws(",", F.array_sort(F.collect_set("l_linestatus"))).alias("statuses"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    n_parts = (
        l.select("l_returnflag", "l_partkey").distinct()
        .groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n_parts"))
    )
    n_supps = (
        l.select("l_returnflag", "l_suppkey").distinct()
        .groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n_supps"))
    )
    return stats.join(n_parts, "l_returnflag").join(n_supps, "l_returnflag").select(
        "l_returnflag", "std_qty", "var_qty", "corr_qty_price", "covar_qty_disc",
        "avg_tax", "statuses", "n_parts", "n_supps", "n_rows",
    )


@_q(
    "agg_approx_distinct",
    """
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           TRUE AS distinct_ok, TRUE AS median_ok, TRUE AS p90_ok,
           round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
           round(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
           round(quantile_cont(l_extendedprice, 0.90), 4) AS p90,
           round(quantile_cont(l_quantity, 0.50), 4)      AS qty_median
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_approx(spark, sf_dir):
    """approx_distinct / approx_percentile + exact interpolated percentiles
    (SURVEY §2.4; round-7 fold of the former agg_percentile_exact row).
    Engine sketches (HLL/KLL) can't be value-compared across engines, so the
    checked contract for the approximate columns is the accuracy guarantee
    itself: each approximate answer must land within its documented error
    bound of the exact answer (computed in the same query); the oracle
    supplies the exact values and TRUE bounds. The exact percentile columns
    are value-compared directly (Spark percentile() == DuckDB quantile_cont,
    both linear interpolation).

    Round-10 restructure (same outputs, oracle-pinned): Spark plans a
    mixed distinct/plain aggregate by first aggregating at the WIDER
    (l_returnflag, l_partkey) grain — so every percentile/sketch buffer
    was built per (flag, partkey) group (~20k buffer sets) and merged,
    and the five separate percentile() calls each kept their own buffer
    (plans/r10/agg_approx_distinct_before.txt: two ObjectHashAggregate
    levels over the full fact table). Now one
    percentile(col, array(0.25, 0.5, 0.9)) call buffers l_extendedprice
    once (identical interpolation per element), percentile_approx shares
    one sketch the same way, and count(DISTINCT) runs as a narrow
    distinct→count branch joined back on the 3-row group key so the
    percentile aggregation stays at 3-group grain. Measured 7.2 s →
    1.7 s at sf0.1."""
    l = _t(spark, sf_dir, "lineitem")
    eps = F.percentile(
        "l_extendedprice", F.array(F.lit(0.25), F.lit(0.50), F.lit(0.90))
    )
    aps = F.percentile_approx(
        "l_extendedprice", F.array(F.lit(0.5), F.lit(0.9)), F.lit(10000)
    )
    agg = l.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("_ap"),
        eps.alias("_eps"),
        aps.alias("_aps"),
        F.round(F.percentile("l_quantity", F.lit(0.50)), 4).alias("qty_median"),
    )
    # the IS NOT NULL filter restores countDistinct's NULL semantics for
    # the distinct→count branch (distinct()+count(1) would count a NULL
    # l_partkey as a distinct part; countDistinct ignored it) — free on
    # TPC-H data (l_partkey is non-null) and pushes to the scan. Residual
    # documented assumption: the inner join back on l_returnflag drops a
    # NULL-flag group the old single aggregate would have emitted;
    # l_returnflag is non-null at every SF, so this is latent shape-reuse
    # hygiene, not an observable change.
    nd = (
        l.select("l_returnflag", "l_partkey")
        .filter(F.col("l_partkey").isNotNull())
        .distinct()
        .groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("exact_parts"))
    )
    return agg.join(nd, "l_returnflag").select(
        "l_returnflag",
        "exact_parts",
        (F.abs(F.col("_ap") - F.col("exact_parts")) / F.col("exact_parts") <= 0.1).alias(
            "distinct_ok"
        ),
        (
            F.abs(F.col("_aps").getItem(0) - F.col("_eps").getItem(1))
            / F.col("_eps").getItem(1)
            <= 0.01
        ).alias("median_ok"),
        (
            F.abs(F.col("_aps").getItem(1) - F.col("_eps").getItem(2))
            / F.col("_eps").getItem(2)
            <= 0.01
        ).alias("p90_ok"),
        F.round(F.col("_eps").getItem(0), 4).alias("p25"),
        F.round(F.col("_eps").getItem(1), 4).alias("p50"),
        F.round(F.col("_eps").getItem(2), 4).alias("p90"),
        "qty_median",
    )


@_q(
    "window_rank_ntile_dist",
    """
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice,
             CAST(row_number() OVER (PARTITION BY o_custkey
                                     ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn,
             CAST(rank()       OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderstatus) AS INT)                 AS status_rank,
             CAST(ntile(4) OVER w AS INT)     AS tile,
             round(percent_rank() OVER w, 6)  AS pr,
             round(cume_dist() OVER w, 6)     AS cd,
             round(nth_value(o_totalprice, 2) OVER
                   (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2)
               AS second_price
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey))
    WHERE rn <= 3
    """,
)
def window_rank_ntile(spark, sf_dir):
    """Ranking window battery (SURVEY §2.5): row_number/rank/ntile/
    percent_rank/cume_dist/nth_value partitioned per key; all computed over
    the full partition, then the rn filter applies on top."""
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    w2 = W.partitionBy("o_custkey").orderBy("o_orderstatus")
    wa = W.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    wfull = wa.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            F.row_number().over(w).cast("int").alias("rn"),
            F.rank().over(w2).cast("int").alias("status_rank"),
            F.ntile(4).over(wa).cast("int").alias("tile"),
            F.round(F.percent_rank().over(wa), 6).alias("pr"),
            F.round(F.cume_dist().over(wa), 6).alias("cd"),
            F.round(F.nth_value("o_totalprice", 2).over(wfull), 2).alias("second_price"),
        )
        .filter(F.col("rn") <= 3)
    )


@_q(
    "window_running_lag",
    """
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
           round(o_totalprice - lag(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey), 2)                 AS delta_prev,
           round(first_value(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey), 2)                 AS first_price
    FROM orders
    """,
)
def window_running(spark, sf_dir):
    """Frame-spec windows + lag/first_value (SURVEY §2.5)."""
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w.rowsBetween(W.unboundedPreceding, 0)), 2).alias(
            "running_total"
        ),
        F.round(F.col("o_totalprice") - F.lag("o_totalprice").over(w), 2).alias("delta_prev"),
        F.round(F.first("o_totalprice").over(w), 2).alias("first_price"),
    )


@_q(
    "set_ops_nations",
    """
    SELECT 'union' AS op, nk FROM (SELECT c_nationkey AS nk FROM customer
                                   UNION SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'intersect', nk FROM (SELECT c_nationkey AS nk FROM customer
                                 INTERSECT SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'except', nk FROM (SELECT c_nationkey AS nk FROM customer
                              EXCEPT SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'cross', r_regionkey * 100 + n_nationkey
    FROM region CROSS JOIN nation
    UNION ALL
    SELECT 'limit', o_orderkey FROM (
      SELECT o_orderkey FROM orders
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 50 OFFSET 10)
    """,
)
def set_ops(spark, sf_dir):
    """UNION / INTERSECT / EXCEPT (SURVEY §2.7) + an explicit CROSS JOIN arm
    (the reference *rejects* accidental cross joins — reject_cross_join.rs —
    but supports explicit ones) + a sort/LIMIT/OFFSET arm (dql/limit.slt;
    TakeOrderedAndProject — no global sort)."""
    cn = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    sn = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders")
    cross = r.crossJoin(n).select(
        (F.col("r_regionkey") * 100 + F.col("n_nationkey")).alias("nk")
    )
    lim = (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .offset(10)
        .limit(50)
        .select(F.col("o_orderkey").alias("nk"))
    )
    return (
        cn.union(sn).distinct().select(F.lit("union").alias("op"), "nk")
        .unionAll(cn.intersect(sn).select(F.lit("intersect").alias("op"), "nk"))
        .unionAll(cn.subtract(sn).select(F.lit("except").alias("op"), "nk"))
        .unionAll(cross.select(F.lit("cross").alias("op"), "nk"))
        .unionAll(lim.select(F.lit("limit").alias("op"), "nk"))
    )


@_q(
    "rollup_lineitem",
    """
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           CAST(count(*) AS BIGINT)      AS n,
           round(sum(l_quantity), 2)     AS sum_qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_lineitem(spark, sf_dir):
    """GROUPING SETS / ROLLUP (SURVEY §2.4)."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "sum_qty",
        )
    )


@_q(
    "conditional_pivot_funcs",
    """
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
           round(avg(coalesce(nullif(o_totalprice, 0.0), 0.0)), 4) AS avg_price,
           CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
           round(coalesce(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 0), 2) AS st_O,
           round(coalesce(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 0), 2) AS st_F,
           round(coalesce(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'P'), 0), 2) AS st_P
    FROM orders GROUP BY o_orderpriority
    """,
)
def conditional_pivot_funcs(spark, sf_dir):
    """coalesce / nullif / CASE WHEN (SURVEY §2.8 conditional) + pivot by
    category (Catalyst rewrites .pivot to the FILTER aggregates the oracle
    spells out)."""
    o = _t(spark, sf_dir, "orders")
    base = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("o_totalprice") > 150000, 1).otherwise(0)).alias("n_big"),
        F.round(F.avg(F.coalesce(F.nullif(F.col("o_totalprice"), F.lit(0.0)), F.lit(0.0))), 4).alias(
            "avg_price"
        ),
        F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias("n_open"),
    )
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.sum("o_totalprice"))
        .select(
            "o_orderpriority",
            F.round(F.coalesce(F.col("O"), F.lit(0.0)), 2).alias("st_O"),
            F.round(F.coalesce(F.col("F"), F.lit(0.0)), 2).alias("st_F"),
            F.round(F.coalesce(F.col("P"), F.lit(0.0)), 2).alias("st_P"),
        )
    )
    return base.join(piv, "o_orderpriority")


@_q(
    "string_regexp_funcs",
    """
    SELECT p_partkey,
           upper(p_name)                    AS uname,
           lower(p_brand)                   AS lbrand,
           substr(p_name, 1, 12)            AS prefix,
           CAST(length(p_name) AS BIGINT)   AS name_len,
           replace(p_type, ' ', '_')        AS type_u,
           reverse(p_brand)                 AS rbrand,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS padded_size,
           concat(p_brand, ':', p_type)     AS brand_type,
           CAST(instr(p_name, 'a') AS BIGINT) AS first_a,
           trim(rpad(p_brand, 12, ' '))     AS trimmed,
           md5(p_name)                      AS name_md5,
           regexp_extract(p_name, '([a-z]{4,})', 1) AS first_long_word,
           CAST(length(regexp_replace(p_name, '[aeiou]', '', 'g')) AS BIGINT) AS novowel_len,
           (p_type SIMILAR TO '.*BRASS.*') AS has_brass
    FROM part
    """,
)
def string_regexp_funcs(spark, sf_dir):
    """String + regexp function battery (SURVEY §2.8:
    upper/lower/substr/length/replace/reverse/pad/concat/instr/trim/md5/
    regexp_extract/regexp_replace/regexp match)."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("uname"),
        F.lower("p_brand").alias("lbrand"),
        F.substring("p_name", 1, 12).alias("prefix"),
        F.length("p_name").cast("long").alias("name_len"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_u"),
        F.reverse("p_brand").alias("rbrand"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("padded_size"),
        F.concat("p_brand", F.lit(":"), "p_type").alias("brand_type"),
        F.instr(F.col("p_name"), "a").cast("long").alias("first_a"),
        F.trim(F.rpad("p_brand", 12, " ")).alias("trimmed"),
        F.md5("p_name").alias("name_md5"),
        F.regexp_extract("p_name", r"([a-z]{4,})", 1).alias("first_long_word"),
        F.length(F.regexp_replace("p_name", "[aeiou]", "")).cast("long").alias("novowel_len"),
        F.col("p_type").rlike("BRASS").alias("has_brass"),
    )


@_q(
    "math_trig_funcs",
    """
    SELECT l_orderkey, l_linenumber,
           round(abs(l_discount - 0.05), 6)        AS a,
           round(ceil(l_extendedprice / 1000), 1)  AS c,
           round(floor(l_quantity), 1)             AS fl,
           round(sqrt(l_extendedprice), 6)         AS sq,
           round(exp(l_discount), 8)               AS ex,
           round(ln(l_extendedprice), 8)           AS lg,
           round(log10(l_extendedprice), 8)        AS l10,
           round(pow(l_quantity, 2), 2)            AS p2,
           round(CAST(l_quantity AS BIGINT) % 7, 1) AS m7,
           round(sign(l_discount - 0.05), 1)       AS sg,
           round(sin(l_discount), 9)            AS s,
           round(cos(l_discount), 9)            AS cs,
           round(tan(l_discount), 9)            AS t,
           round(asin(l_discount), 9)           AS asn,
           round(acos(l_discount), 9)           AS acs,
           round(atan(l_quantity), 9)           AS atn,
           round(atan2(l_quantity, l_discount + 1), 9) AS at2,
           round((exp(l_discount) - exp(-l_discount)) / 2, 9)  AS sh,
           round((exp(l_discount) + exp(-l_discount)) / 2, 9)  AS ch,
           round((exp(2 * l_discount) - 1) / (exp(2 * l_discount) + 1), 9) AS th,
           round(cbrt(l_quantity), 9)           AS cb,
           round(radians(l_quantity), 9)        AS rad,
           round(degrees(l_discount), 9)        AS deg
    FROM lineitem WHERE l_orderkey <= 1000
    """,
)
def math_trig_funcs(spark, sf_dir):
    """Math + trig/hyperbolic battery (SURVEY §2.8 math_function slt:
    abs/ceil/floor/sqrt/exp/ln/log10/pow/mod/sign + sin/cos/tan/asin/acos/
    atan/atan2/sinh/cosh/tanh/cbrt/radians/degrees)."""
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 1000)
    d, q = F.col("l_discount"), F.col("l_quantity")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_discount") - 0.05), 6).alias("a"),
        F.round(F.ceil(F.col("l_extendedprice") / 1000).cast("double"), 1).alias("c"),
        F.round(F.floor(F.col("l_quantity")).cast("double"), 1).alias("fl"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("sq"),
        F.round(F.exp("l_discount"), 8).alias("ex"),
        F.round(F.log("l_extendedprice"), 8).alias("lg"),
        F.round(F.log10("l_extendedprice"), 8).alias("l10"),
        F.round(F.pow("l_quantity", F.lit(2)), 2).alias("p2"),
        F.round((F.col("l_quantity").cast("long") % 7).cast("double"), 1).alias("m7"),
        F.round(F.signum(F.col("l_discount") - 0.05), 1).alias("sg"),
        F.round(F.sin(d), 9).alias("s"),
        F.round(F.cos(d), 9).alias("cs"),
        F.round(F.tan(d), 9).alias("t"),
        F.round(F.asin(d), 9).alias("asn"),
        F.round(F.acos(d), 9).alias("acs"),
        F.round(F.atan(q), 9).alias("atn"),
        F.round(F.atan2(q, d + 1), 9).alias("at2"),
        F.round(F.sinh(d), 9).alias("sh"),
        F.round(F.cosh(d), 9).alias("ch"),
        F.round(F.tanh(d), 9).alias("th"),
        F.round(F.cbrt(q), 9).alias("cb"),
        F.round(F.radians(q), 9).alias("rad"),
        F.round(F.degrees(d), 9).alias("deg"),
    )


@_q(
    "time_format_funcs",
    """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT)     AS y,
           CAST(month(o_orderdate) AS BIGINT)    AS mo,
           CAST(day(o_orderdate) AS BIGINT)      AS d,
           CAST(quarter(o_orderdate) AS BIGINT)  AS q,
           CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
           CAST(date_part('dow', o_orderdate) AS BIGINT) AS dow,
           epoch_us(date_trunc('month', o_orderdate))    AS month_start_us,
           epoch_us(o_orderdate)                          AS od_us,
           strftime(o_orderdate, '%Y-%m-%d')          AS d_str,
           strftime(o_orderdate, '%Y-%m')             AS ym,
           CAST(epoch(o_orderdate) AS BIGINT)          AS epoch_s,
           epoch_us(o_orderdate + INTERVAL 1 DAY)      AS next_day_us,
           epoch_us(date_trunc('week', o_orderdate))   AS week_start_us
    FROM orders WHERE o_orderkey <= 2000
    """,
)
def time_format_funcs(spark, sf_dir):
    """Time function battery (SURVEY §2.8): date_part/date_trunc/extract/
    date_format/unix_timestamp/interval arithmetic. dow aligned to DuckDB's
    Sunday=0 convention via dayofweek-1."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    od = F.col("o_orderdate").cast("timestamp")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("y"),
        F.month("o_orderdate").cast("long").alias("mo"),
        F.dayofmonth("o_orderdate").cast("long").alias("d"),
        F.quarter("o_orderdate").cast("long").alias("q"),
        F.dayofyear("o_orderdate").cast("long").alias("doy"),
        (F.dayofweek("o_orderdate") - 1).cast("long").alias("dow"),
        F.unix_micros(F.date_trunc("month", "o_orderdate").cast("timestamp")).alias("month_start_us"),
        F.unix_micros(od).alias("od_us"),
        F.date_format(od, "yyyy-MM-dd").alias("d_str"),
        F.date_format(od, "yyyy-MM").alias("ym"),
        F.unix_seconds(od).alias("epoch_s"),
        F.unix_micros(od + F.expr("INTERVAL 1 DAY")).alias("next_day_us"),
        F.unix_micros(F.date_trunc("week", od)).alias("week_start_us"),
    )


@_q(
    "subquery_decorrelation",
    """
    SELECT c_mktsegment, o_orderstatus, CAST(count(*) AS BIGINT) AS n,
           round(min(o_totalprice), 2) AS min_price
    FROM customer JOIN orders ON o_custkey = c_custkey
    WHERE c_nationkey IN (
      SELECT n_nationkey FROM nation WHERE n_regionkey IN (
        SELECT r_regionkey FROM region WHERE r_name = 'EUROPE'))
      AND o_totalprice > (SELECT avg(o_totalprice) FROM orders)
    GROUP BY c_mktsegment, o_orderstatus
    """,
)
def subquery_decorrelation(spark, sf_dir):
    """Scalar subquery (→ broadcast 1-row aggregate) + nested IN subqueries
    (→ left-semi joins) in one plan (SURVEY §4.2 decorrelation)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    nk = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select("n_nationkey")
    avg_df = o.agg(F.avg("o_totalprice").alias("_avg"))
    return (
        c.join(F.broadcast(nk), c.c_nationkey == nk.n_nationkey, "left_semi")
        .join(o, o.o_custkey == c.c_custkey)
        .crossJoin(F.broadcast(avg_df))
        .filter(F.col("o_totalprice") > F.col("_avg"))
        .groupBy("c_mktsegment", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
        )
    )


# =====================================================================
# Time-series operators (SURVEY §2.6, §2.4 cnosdb-specific)
# =====================================================================

@_q(
    "time_window_tumbling",
    """
    SELECT (epoch_us(ts) - epoch_us(ts) % 3600000000) AS window_start_us,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 4)     AS sum_value,
           round(avg(value), 6)     AS avg_value,
           round(min(value), 6)     AS min_value,
           round(max(value), 6)     AS max_value
    FROM events GROUP BY 1, 2
    """,
)
def time_window_tumbling(spark, sf_dir):
    """time_window(time, 1h) tumbling → F.window (SURVEY §2.6;
    reference transform_time_window.rs:42-92)."""
    from cnosdb_spark.functions import time_window

    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(time_window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.round(F.avg("value"), 6).alias("avg_value"),
            F.round(F.min("value"), 6).alias("min_value"),
            F.round(F.max("value"), 6).alias("max_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "event_type",
            "n",
            "sum_value",
            "avg_value",
            "min_value",
            "max_value",
        )
    )


@_q(
    "time_window_sliding",
    """
    SELECT ws AS window_start_us, CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 4) AS sum_value
    FROM (
      SELECT unnest(generate_series((epoch_us(ts) - 3600000000) // 1800000000 + 1,
                                    epoch_us(ts) // 1800000000)) * 1800000000 AS ws,
             value
      FROM events)
    GROUP BY ws
    """,
)
def time_window_sliding(spark, sf_dir):
    """time_window(time, 1h, 30m) sliding → Expand-based F.window
    (reference emits one projection per overlapping window,
    transform_time_window.rs:303-393 — Spark's implementation is the same
    design)."""
    from cnosdb_spark.functions import time_window

    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(time_window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"), "n", "sum_value"
        )
    )


_GAPFILL_ORACLE_COMMON = """
    WITH actual AS (
      SELECT event_type,
             (epoch_us(ts) - epoch_us(ts) % 900000000) AS b,
             round(avg(value), 6) AS avg_value
      FROM events GROUP BY 1, 2),
    bounds AS (SELECT event_type, min(b) AS lo, max(b) AS hi FROM actual GROUP BY 1),
    spine AS (SELECT event_type, unnest(generate_series(lo, hi, 900000000)) AS b
              FROM bounds)
"""


@_q(
    "gapfill_locf_interpolate",
    _GAPFILL_ORACLE_COMMON
    + """
    , filled AS (
      SELECT s.event_type, s.b, a.avg_value,
             last_value(a.avg_value IGNORE NULLS)
               OVER (PARTITION BY s.event_type ORDER BY s.b
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
             first_value(a.avg_value IGNORE NULLS)
               OVER (PARTITION BY s.event_type ORDER BY s.b
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv,
             last_value(CASE WHEN a.avg_value IS NOT NULL THEN s.b END IGNORE NULLS)
               OVER (PARTITION BY s.event_type ORDER BY s.b
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pt,
             first_value(CASE WHEN a.avg_value IS NOT NULL THEN s.b END IGNORE NULLS)
               OVER (PARTITION BY s.event_type ORDER BY s.b
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nt
      FROM spine s LEFT JOIN actual a ON a.event_type = s.event_type AND a.b = s.b)
    SELECT event_type, b AS bucket_us,
           CAST(floor(coalesce(avg_value,
                 last_value(avg_value IGNORE NULLS)
                   OVER (PARTITION BY event_type ORDER BY b))
                 * 1000000 + 0.5) AS BIGINT) AS locf_e6,
           CAST(floor(CASE WHEN avg_value IS NOT NULL THEN avg_value
                      ELSE pv + (nv - pv) * (b - pt) / (nt - pt) END
                      * 1000000 + 0.5) AS BIGINT) AS interp_e6
    FROM filled
    """,
)
def gapfill_locf_interpolate(spark, sf_dir):
    """time_window_gapfill with locf AND interpolate fills (SURVEY §2.6;
    reference gapfill.rs/locf.rs/interpolate.rs — custom Spark rewrite:
    spine via sequence+explode, LOCF via last(ignorenulls) window, linear
    interpolation between bracketing non-null buckets)."""
    e = _t(spark, sf_dir, "events")
    out = time_window_gapfill(
        e,
        "ts",
        "15m",
        ["event_type"],
        [
            F.round(F.avg("value"), 6).alias("locf_v"),
            F.round(F.avg("value"), 6).alias("interp_v"),
        ],
        fill={"locf_v": "locf", "interp_v": "interpolate"},
    )
    # scaled-integer output: floor(x*1e6+0.5) is the same float algorithm in
    # both engines, immune to round() implementation differences at
    # half-way decimals (observed 2/14k boundary flips with round(x, 6))
    return out.select(
        "event_type",
        F.unix_micros("bucket").alias("bucket_us"),
        F.floor(F.col("locf_v") * 1000000 + 0.5).cast("long").alias("locf_e6"),
        F.floor(F.col("interp_v") * 1000000 + 0.5).cast("long").alias("interp_e6"),
    )


@_q(
    "series_selector_aggs",
    """
    WITH fl AS (
      SELECT user_id,
             arg_min(value, ts) FILTER (WHERE value IS NOT NULL)      AS first_value,
             arg_max(value, ts) FILTER (WHERE value IS NOT NULL)      AS last_value,
             arg_min(event_type, ts) FILTER (WHERE event_type IS NOT NULL) AS first_type,
             epoch_us(min(ts)) AS min_ts_us,
             epoch_us(max(ts)) AS max_ts_us,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY user_id),
    md AS (
      SELECT user_id, event_type AS mode FROM (
        SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY count(*) DESC, event_type) AS rn
        FROM events WHERE event_type IS NOT NULL
        GROUP BY user_id, event_type)
      WHERE rn = 1),
    inc AS (
      SELECT user_id,
             round(coalesce(sum(CASE WHEN pv IS NULL THEN NULL
                                     WHEN value - pv >= 0 THEN value - pv
                                     ELSE value END), 0), 4) AS increase
      FROM (SELECT user_id, value,
                   lag(value) OVER (PARTITION BY user_id ORDER BY ts) AS pv
            FROM events)
      GROUP BY user_id)
    SELECT fl.*, md.mode, inc.increase
    FROM fl JOIN md USING (user_id) JOIN inc USING (user_id)
    """,
)
def series_selector_aggs(spark, sf_dir):
    """Per-series selector-aggregate battery (SURVEY §2.4): first(time,v)/
    last(time,v) (reference aggregate_function/{first,last}.rs → F.min_by/
    max_by), mode with deterministic tie-break (mode.rs), and
    increase(time,value) with counter-reset handling (increase.rs).

    Round-10 restructure (same outputs, oracle-pinned): the battery used
    to scan+shuffle events THREE times (fl groupBy, mode_df, increase) and
    join the results. The selector aggregates and the increase sum both
    key on user_id, so one lag-window pass establishes
    hashpartitioning(user_id) once and a single groupBy on the window
    output computes both families (guide §2.4: operations keyed the same
    way share one exchange) — 3 events scans/shuffles → 2, one join
    instead of two. mode_df deliberately stays a separate branch over the
    raw scan: folding it under the window subtree serializes the whole
    query behind the sort (measured +30% at sf0.1) while as a sibling
    branch its scan+count runs concurrently with the window stage."""
    e = _t(spark, sf_dir, "events")
    wlag = W.partitionBy("user_id").orderBy("ts")
    delta = F.col("value") - F.lag("value").over(wlag)
    contrib = (
        F.when(delta.isNull(), F.lit(None))
        .when(delta >= 0, delta)
        .otherwise(F.col("value"))  # reset: counter restarted at value
    )
    e2 = e.select("user_id", "ts", "value", "event_type", contrib.alias("_d"))
    flinc = e2.groupBy("user_id").agg(
        first_agg("ts", "value").alias("first_value"),
        last_agg("ts", "value").alias("last_value"),
        first_agg("ts", "event_type").alias("first_type"),
        F.unix_micros(F.min("ts")).alias("min_ts_us"),
        F.unix_micros(F.max("ts")).alias("max_ts_us"),
        F.count(F.lit(1)).alias("n"),
        F.round(F.coalesce(F.sum("_d"), F.lit(0.0)), 4).alias("increase"),
    )
    md = mode_df(e, ["user_id"], "event_type")
    return flinc.join(md, "user_id").select(
        "user_id", "first_value", "last_value", "first_type",
        "min_ts_us", "max_ts_us", "n", "mode", "increase",
    )


@_q(
    "mode_increase_per_series",
    """
    WITH m AS (
      SELECT user_id, event_type AS mode FROM (
        SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY count(*) DESC, event_type) AS rn
        FROM events WHERE event_type IS NOT NULL
        GROUP BY user_id, event_type)
      WHERE rn = 1),
    d AS (
      SELECT user_id, value,
             lag(value) OVER (PARTITION BY user_id ORDER BY ts) AS pv
      FROM events),
    inc AS (
      SELECT user_id,
             round(coalesce(sum(CASE WHEN pv IS NULL THEN NULL
                                     WHEN value - pv >= 0 THEN value - pv
                                     ELSE value END), 0), 4) AS increase
      FROM d GROUP BY user_id),
    zw AS (
      SELECT event_id, user_id,
             avg(value) OVER tw AS zm,
             stddev_samp(value) OVER tw AS zs,
             count(value) OVER tw AS zn,
             value
      FROM events
      WINDOW tw AS (PARTITION BY user_id ORDER BY ts
                    ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
    SELECT 'mode_inc' AS op, m.user_id, CAST(NULL AS BIGINT) AS k2,
           m.mode AS s, inc.increase AS val
    FROM m JOIN inc ON inc.user_id = m.user_id
    UNION ALL
    SELECT 'zscore', user_id, event_id, NULL, round((value - zm) / zs, 6)
    FROM zw
    WHERE zn >= 5 AND zs IS NOT NULL AND zs > 0
      AND abs((value - zm) / zs) >= 3.0
    UNION ALL
    SELECT 'mad', user_id, event_id, NULL, round(score, 6) FROM (
      WITH med AS (SELECT user_id, quantile_cont(value, 0.5) AS med
                   FROM events GROUP BY user_id),
      mad AS (SELECT e.user_id,
                     quantile_cont(abs(e.value - m.med), 0.5) AS mad,
                     min(m.med) AS med
              FROM events e JOIN med m USING (user_id) GROUP BY e.user_id),
      sc AS (SELECT e.event_id, e.user_id,
                    CASE WHEN d.mad > 0
                         THEN abs(e.value - d.med) / (1.4826 * d.mad) END AS score
             FROM events e JOIN mad d USING (user_id))
      SELECT event_id, user_id, score FROM sc WHERE score >= 3.5)
    """,
)
def mode_increase_per_series(spark, sf_dir):
    """Per-series monitoring family — four operators, one row:

    - mode_inc: mode(x) with deterministic tie-break (SURVEY §2.4;
      reference aggregate_function/mode.rs) + increase(time, value) with
      counter-reset handling (increase.rs), joined per series;
    - zscore: rolling z-score anomaly detection (operators/anomaly.py) —
      trailing-20-rows window EXCLUDING the current row, flagged rows
      (|z| >= 3 on the unrounded score) only;
    - mad (round-9 graduation from pytest-only): robust per-series MAD
      outliers (anomaly.mad_anomalies, Iglewicz-Hoaglin 3.5 cut) — exact
      interpolated medians on both sides (Spark percentile ==
      quantile_cont), score expression replayed term-for-term, flag from
      the UNROUNDED score.
    """
    # Round-11 fusion (guide §2.4): the four operators all key on user_id,
    # so the whole family runs as ONE events scan + ONE hash exchange with
    # stacked per-series window passes — replacing five keyed sub-scans
    # (mode groupBy+window, increase lag+groupBy, zscore window, median
    # agg, MAD agg) and two joins. Per-arm semantics are replayed
    # expression-for-expression from mode_df / increase /
    # zscore_anomalies / mad_anomalies (which remain the library surface):
    #
    # - increase: sum of the lag-delta contribs as an unbounded window
    #   aggregate (rows arrive ts-sorted from the zscore pass, so the
    #   float accumulation order is the per-partition ts order — the same
    #   order the old post-window groupBy consumed);
    # - median/MAD: exact `percentile` as unbounded window aggregates
    #   (same buffer math as the keyed aggregate form), the MAD pass
    #   consuming the median pass's output — zero extra exchanges;
    # - mode: per-(user, event_type) count + row_number over (count desc,
    #   event_type) replayed on the raw rows — every rn=1 candidate row of
    #   a tie group carries identical (mode, increase), so the emitted row
    #   is deterministic;
    # - the 3-arm union becomes inline(filter(array(...))) over the single
    #   windowed relation: a union would plant the shared subtree three
    #   times (per-branch column pruning defeats exchange reuse — the
    #   measured failure of the r10 series_selector mode-fusion A/B).
    #
    # Known edge vs the join form (documented, not observable on the
    # driver corpora — 0 NULL user_id / 0 NULL event_type at every SF):
    # the old inner joins on user_id dropped NULL-key rows from the
    # mode_inc/mad arms, a window partition keeps them. The oracle's own
    # JOIN ... USING(user_id) has the same drop semantics, so on data
    # with NULL series keys the oracle would flag the difference loudly.
    e = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value", "event_type"
    )
    wts = W.partitionBy("user_id").orderBy("ts")
    tw = wts.rowsBetween(-20, -1)
    wfull = W.partitionBy("user_id")
    base = e.select(
        "event_id",
        "user_id",
        "value",
        "event_type",
        F.lag("value").over(wts).alias("_pv"),
        F.avg("value").over(tw).alias("_zm"),
        F.stddev_samp("value").over(tw).alias("_zs"),
        F.count("value").over(tw).alias("_zn"),
    )
    delta = F.col("value") - F.col("_pv")
    contrib = (
        F.when(F.col("_pv").isNull(), F.lit(None))
        .when(delta >= 0, delta)
        .otherwise(F.col("value"))
    )
    base = base.select(
        "*",
        F.coalesce(F.sum(contrib).over(wfull), F.lit(0.0)).alias("_inc"),
        F.percentile("value", F.lit(0.5)).over(wfull).alias("_med"),
    )
    base = base.withColumn(
        "_mad",
        F.percentile(F.abs(F.col("value") - F.col("_med")), F.lit(0.5)).over(wfull),
    )
    wcnt = W.partitionBy("user_id", "event_type")
    base = base.withColumn("_cnt", F.count("event_type").over(wcnt))
    wrn = W.partitionBy("user_id").orderBy(
        F.col("_cnt").desc(), F.col("event_type").asc_nulls_last()
    )
    base = base.withColumn("_rn", F.row_number().over(wrn))
    z = F.when(
        (F.col("_zn") >= 5) & F.col("_zs").isNotNull() & (F.col("_zs") > 0),
        (F.col("value") - F.col("_zm")) / F.col("_zs"),
    )
    score = F.when(
        F.col("_mad") > 0,
        F.abs(F.col("value") - F.col("_med")) / (F.lit(1.4826) * F.col("_mad")),
    )

    def _arm(op, k2, s, val):
        return F.struct(
            F.lit(op).alias("op"),
            F.col("user_id").alias("user_id"),
            k2.alias("k2"),
            s.alias("s"),
            val.alias("val"),
        )

    arms = F.array(
        F.when(
            (F.col("_rn") == 1) & F.col("event_type").isNotNull(),
            _arm(
                "mode_inc",
                F.lit(None).cast("long"),
                F.col("event_type"),
                F.round("_inc", 4),
            ),
        ),
        F.when(
            F.abs(z) >= 3.0,
            _arm(
                "zscore",
                F.col("event_id").cast("long"),
                F.lit(None).cast("string"),
                F.round(z, 6),
            ),
        ),
        F.when(
            score >= 3.5,
            _arm(
                "mad",
                F.col("event_id").cast("long"),
                F.lit(None).cast("string"),
                F.round(score, 6),
            ),
        ),
    )
    return base.select(F.inline(F.filter(arms, lambda x: x.isNotNull())))


@_q(
    "topk_bottom_values",
    """
    SELECT 'topk' AS op, event_id, round(value, 6) AS value FROM (
      SELECT event_id, value FROM events
      ORDER BY value DESC NULLS LAST, event_id LIMIT 10)
    UNION ALL
    SELECT 'bottom', event_id, round(value, 6) FROM (
      SELECT event_id, value FROM events
      ORDER BY value ASC NULLS LAST, event_id LIMIT 10)
    UNION ALL
    SELECT 'sample', event_id, round(value, 6) FROM (
      SELECT event_id, value FROM events
      ORDER BY md5(CAST(event_id AS VARCHAR)) LIMIT 20)
    UNION ALL
    SELECT 'offset', event_id, round(value, 6) FROM (
      SELECT event_id, value FROM events
      ORDER BY value DESC NULLS LAST, event_id LIMIT 10 OFFSET 5)
    """,
)
def topk_bottom_values(spark, sf_dir):
    """topk(col,k) / bottom(col,k) selectors → TakeOrderedAndProject, no
    global sort (SURVEY §2.6; reference
    transform_{topk,bottom}_func_to_topk_node.rs) + sample(x,n) as a
    deterministic uniform hash-sample (sample.rs is a reservoir — see
    functions.timeseries.sample_deterministic for the divergence note)
    + LIMIT k OFFSET n (SURVEY §2.7 offset semantics — driver-verified
    here since the standalone limit_offset row was folded out in r04)."""
    e = _t(spark, sf_dir, "events").select(
        "event_id", F.round("value", 6).alias("value")
    )
    top = ts_topk(e, "value", 10, "event_id").select(
        F.lit("topk").alias("op"), "event_id", "value"
    )
    bot = ts_bottom(e, "value", 10, "event_id").select(
        F.lit("bottom").alias("op"), "event_id", "value"
    )
    samp = sample_deterministic(e, "event_id", 20).select(
        F.lit("sample").alias("op"), "event_id", "value"
    )
    off = (
        e.orderBy(F.col("value").desc_nulls_last(), "event_id")
        .offset(5)
        .limit(10)
        .select(F.lit("offset").alias("op"), "event_id", "value")
    )
    return top.unionAll(bot).unionAll(samp).unionAll(off)


@_q(
    "state_agg_durations",
    """
    WITH d AS (
      SELECT user_id, event_type,
             (epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts))
              - epoch_us(ts)) / 1e6 AS dur
      FROM events)
    SELECT 'state_agg' AS op, user_id, event_type AS s,
           round(sum(coalesce(dur, 0)), 3) AS val
    FROM d GROUP BY user_id, event_type
    UNION ALL
    SELECT 'duration_in', user_id, NULL,
           coalesce(round(sum(CASE WHEN event_type = 'error'
                                   THEN coalesce(dur, 0) END), 3), 0.0)
    FROM d GROUP BY user_id
    UNION ALL
    -- closed-period as-of: NULL when the as-of row is the series' last
    -- point (state_at.rs zero-length final period)
    SELECT 'state_at', user_id,
           CASE WHEN max(ts) > TIMESTAMP '2024-01-15 00:00:00'
                THEN arg_max(CASE WHEN ts <= TIMESTAMP '2024-01-15 00:00:00'
                                  THEN event_type END,
                             CASE WHEN ts <= TIMESTAMP '2024-01-15 00:00:00'
                                  THEN ts END)
           END, NULL
    FROM events GROUP BY user_id
    """,
)
def state_agg_durations(spark, sf_dir):
    """state_agg family (SURVEY §2.4; reference aggregate_function/
    state_agg/) — three arms (state_accessors folded in here to free a
    registry slot; same machinery):

    - state_agg: state_agg(time, state) → per-(series, state) duration;
    - duration_in: duration_in(state_agg(...), 'error') per series
      (duration_in.rs; 0.0 for series never in the state);
    - state_at: state_at(state_agg(...), ts) as-of lookup (state_at.rs;
      NULL when the as-of row is the series' final zero-length period).
    """
    e = _t(spark, sf_dir, "events")
    dur = state_durations(e, "ts", "event_type", ["user_id"]).select(
        F.lit("state_agg").alias("op"),
        "user_id",
        F.col("event_type").alias("s"),
        F.round("duration_s", 3).alias("val"),
    )
    din = duration_in(e, "ts", "event_type", ["user_id"], "error").select(
        F.lit("duration_in").alias("op"),
        "user_id",
        F.lit(None).cast("string").alias("s"),
        F.round("duration_s", 3).alias("val"),
    )
    at_ts = state_at(e, "ts", "event_type", ["user_id"], "2024-01-15 00:00:00").select(
        F.lit("state_at").alias("op"),
        "user_id",
        F.col("state").alias("s"),
        F.lit(None).cast("double").alias("val"),
    )
    return dur.unionAll(din).unionAll(at_ts)


@_q(
    "gauge_agg_metrics",
    """
    WITH r AS (
      SELECT user_id, ts, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts)      AS ra,
             row_number() OVER (PARTITION BY user_id ORDER BY ts DESC) AS rd
      FROM events WHERE value IS NOT NULL)
    SELECT user_id,
           round(min(CASE WHEN ra = 1 THEN value END), 6) AS first_val,
           round(min(CASE WHEN rd = 1 THEN value END), 6) AS last_val,
           round(min(CASE WHEN rd = 1 THEN value END)
                 - min(CASE WHEN ra = 1 THEN value END), 6) AS delta,
           round((epoch_us(max(ts)) - epoch_us(min(ts))) / 1e6, 3) AS time_delta_s,
           round((min(CASE WHEN rd = 1 THEN value END)
                  - min(CASE WHEN ra = 1 THEN value END))
                 / ((epoch_us(max(ts)) - epoch_us(min(ts))) / 1e6), 9) AS rate,
           round(min(CASE WHEN ra = 2 THEN value END)
                 - min(CASE WHEN ra = 1 THEN value END), 6) AS idelta_left,
           round(min(CASE WHEN rd = 1 THEN value END)
                 - min(CASE WHEN rd = 2 THEN value END), 6) AS idelta_right,
           CAST(count(*) AS BIGINT) AS num_elements
    FROM r GROUP BY user_id
    """,
)
def gauge_metrics(spark, sf_dir):
    """gauge_agg + delta/rate/time_delta/first_val/last_val/idelta accessors
    (SURVEY §2.4; reference gauge_agg.rs:22-67 + scalar_function/gauge/)."""
    from cnosdb_spark.functions.gauge import (
        gauge_delta,
        gauge_first_val,
        gauge_idelta_left,
        gauge_idelta_right,
        gauge_last_val,
        gauge_rate,
        gauge_time_delta,
    )

    e = _t(spark, sf_dir, "events")
    g = gauge_agg(e, ["user_id"], "ts", "value")
    gc = F.col("gauge")
    return g.select(
        "user_id",
        F.round(gauge_first_val(gc), 6).alias("first_val"),
        F.round(gauge_last_val(gc), 6).alias("last_val"),
        F.round(gauge_delta(gc), 6).alias("delta"),
        F.round(gauge_time_delta(gc), 3).alias("time_delta_s"),
        # gauge_rate is per-ns (reference units); ×1e9 → per-second for a
        # numerically well-conditioned oracle comparison
        F.round(gauge_rate(gc) * 1e9, 9).alias("rate"),
        F.round(gauge_idelta_left(gc), 6).alias("idelta_left"),
        F.round(gauge_idelta_right(gc), 6).alias("idelta_right"),
        gc["num_elements"].alias("num_elements"),
    )


@_q(
    "show_series_tag_values",
    """
    SELECT DISTINCT 'series' AS kind,
           'events,event_type=' || event_type
           || ',user_bucket=' || CAST(user_id % 10 AS VARCHAR) AS key,
           CAST(NULL AS VARCHAR) AS value
    FROM events
    UNION
    SELECT 'tag_value', 'lang', lang FROM documents WHERE lang IS NOT NULL
    UNION
    SELECT 'tag_value', 'source', source FROM documents WHERE source IS NOT NULL
    """,
)
def show_series_tag_values(spark, sf_dir):
    """SHOW SERIES (distinct series keys formatted measurement,tag=val,...,
    reference sql/planner.rs:1400-1406; tag-only projection = DISTINCT
    series per rewrite_tag_scan.rs) and SHOW TAG VALUES WITH KEY IN
    (lang, source) (planner.rs:1408-1421), unioned with a kind marker."""
    e = _t(spark, sf_dir, "events")
    d = _t(spark, sf_dir, "documents")
    series = e.select(
        F.lit("series").alias("kind"),
        F.concat(
            F.lit("events,event_type="),
            F.col("event_type"),
            F.lit(",user_bucket="),
            F.pmod(F.col("user_id"), F.lit(10)).cast("string"),
        ).alias("key"),
        F.lit(None).cast("string").alias("value"),
    ).distinct()
    lang = (
        d.select(F.lit("tag_value").alias("kind"), F.lit("lang").alias("key"),
                 F.col("lang").alias("value"))
        .filter(F.col("value").isNotNull())
        .distinct()
    )
    src = (
        d.select(F.lit("tag_value").alias("kind"), F.lit("source").alias("key"),
                 F.col("source").alias("value"))
        .filter(F.col("value").isNotNull())
        .distinct()
    )
    return series.unionAll(lang).unionAll(src).distinct()


_INGEST_ARM_ORACLE = """
    SELECT '{arm}' AS arm, event_type, CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 3) AS sum_value,
           min({t}) AS t_min_us, max({t}) AS t_max_us
    FROM events WHERE event_id < 600 GROUP BY event_type
"""


@_q(
    "ingest_protocol_roundtrip",
    " UNION ALL ".join(
        _INGEST_ARM_ORACLE.format(arm=arm, t=t)
        for arm, t in [
            ("line_protocol", "epoch_us(ts)"),
            ("opentsdb_telnet", "epoch_us(ts)"),
            ("opentsdb_json", "epoch_us(ts)"),
            ("es_bulk", "epoch_us(ts)"),
            ("ndjson", "epoch_us(ts)"),
            # prometheus remote-write sample timestamps are ms (prompb
            # spec) — the only lossy wire format of the five
            ("prometheus", "(epoch_us(ts) // 1000) * 1000"),
        ]
    ),
)
def ingest_protocol_roundtrip(spark, sf_dir):
    """Wire-protocol ingest round-trip (SURVEY §2 rows 6-8): the same 600
    events are formatted as (a) InfluxDB line protocol at ns precision, (b)
    OpenTSDB telnet `put` lines, (c) OpenTSDB HTTP JSON, (d) ES-bulk JSON
    pairs, (e) ndjson log lines, (f) a snappy-compressed Prometheus
    remote-write protobuf — each
    written through the engine's schemaless ingest path (auto-create +
    Catalog.insert, reference main/src/http/http_service.rs write
    endpoints), then queried back through engine SQL and aggregated. The
    oracle computes the same aggregates straight from the source table, so
    any parse/typing/time-precision bug in a protocol path breaks that
    arm's hash. Wire payload assembly is driver-side by nature (these are
    HTTP/TCP request bodies — the serving path, bounded per request); the
    queried-back aggregation runs distributed."""
    import json as _json
    import tempfile

    from cnosdb_spark.engine import Engine
    from cnosdb_spark.sources.prometheus import encode_write_request, snappy_compress

    rows = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_id") < 600)
        .select(
            F.unix_micros("ts").alias("us"), "user_id", "event_type", "value"
        )
        .collect()
    )
    # The oracle counts raw source rows, but the engine's LWW merge keys on
    # (time, tags): two events sharing (user_id, event_type) within the same
    # millisecond would collapse under the prometheus arm (ms wire
    # precision) and fail the row on correct code. Assert the slice is
    # collision-free at ms granularity (which implies µs for the other
    # arms) so a testdata change surfaces as a loud error here rather than
    # a data-dependent hash mismatch downstream.
    ms_keys = {(r["user_id"], r["event_type"], r["us"] // 1000) for r in rows}
    assert len(ms_keys) == len(rows), (
        "ingest_protocol_roundtrip: event slice has (user_id, event_type) "
        "ms-timestamp collisions; the LWW merge would collapse rows the "
        "oracle counts — pick a collision-free slice"
    )
    eng = Engine(spark, tempfile.mkdtemp(prefix="ingest_rt_"))

    lp = "\n".join(
        f"ev_lp,user_id={r['user_id']},event_type={r['event_type']} "
        f"value={r['value']!r} {r['us'] * 1000}"
        for r in rows
    )
    eng.write_lines(lp, precision="ns")

    # µs-magnitude timestamps ride the OpenTSDB heuristic losslessly
    telnet = "\r\n".join(
        f"put ev_tsdb {r['us']} {r['value']!r} "
        f"user_id={r['user_id']} event_type={r['event_type']}"
        for r in rows
    )
    eng.write_open_tsdb(telnet, tcp=True)

    eng.write_open_tsdb_json(
        _json.dumps(
            [
                {
                    "metric": "ev_tsdbj",
                    "timestamp": r["us"],
                    "value": r["value"],
                    "tags": {
                        "user_id": str(r["user_id"]),
                        "event_type": r["event_type"],
                    },
                }
                for r in rows
            ]
        )
    )

    es = "\n".join(
        '{"index": {"_index": "ev_es"}}\n'
        + _json.dumps(
            {
                "time": r["us"] * 1000,  # integer json times are epoch ns
                "user_id": str(r["user_id"]),
                "event_type": r["event_type"],
                "value": r["value"],
            }
        )
        for r in rows
    )
    eng.write_es_log(es, tag_keys={"user_id", "event_type"})

    nd = "\n".join(
        _json.dumps(
            {
                "time": r["us"] * 1000,
                "user_id": str(r["user_id"]),
                "event_type": r["event_type"],
                "value": r["value"],
            }
        )
        for r in rows
    )
    eng.write_ndjson(nd, table="ev_nd", tag_keys={"user_id", "event_type"})

    series: dict[tuple, dict] = {}
    for r in rows:
        key = (str(r["user_id"]), r["event_type"])
        s = series.setdefault(
            key,
            {
                "labels": {
                    "__name__": "ev_prom",
                    "user_id": key[0],
                    "event_type": key[1],
                },
                "samples": [],
            },
        )
        s["samples"].append((r["value"], r["us"] // 1000))
    eng.write_prometheus(
        snappy_compress(encode_write_request(list(series.values()))),
        compressed=True,
    )

    def _agg(arm: str, table: str) -> DataFrame:
        df = eng.sql(f"SELECT time, event_type, value FROM {table}")
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 3).alias("sum_value"),
            F.min(F.unix_micros("time")).alias("t_min_us"),
            F.max(F.unix_micros("time")).alias("t_max_us"),
        ).select(
            F.lit(arm).alias("arm"), "event_type", "n", "sum_value",
            "t_min_us", "t_max_us",
        )

    out = _agg("line_protocol", "ev_lp")
    for arm, table in [
        ("opentsdb_telnet", "ev_tsdb"),
        ("opentsdb_json", "ev_tsdbj"),
        ("es_bulk", "ev_es"),
        ("ndjson", "ev_nd"),
        ("prometheus", "ev_prom"),
    ]:
        out = out.unionAll(_agg(arm, table))
    return out


@_q(
    "external_copy_insert",
    """
    WITH src AS (
      SELECT l_returnflag AS grp, CAST(count(*) AS BIGINT) AS n,
             round(sum(l_quantity), 3) AS sum_qty,
             round(sum(l_extendedprice), 2) AS sum_price
      FROM lineitem WHERE l_orderkey < 400 GROUP BY l_returnflag),
    aff AS (
      SELECT '__affected__' AS grp,
             CAST(count(*) AS BIGINT) AS n,
             CAST(NULL AS DOUBLE) AS sum_qty, CAST(NULL AS DOUBLE) AS sum_price
      FROM lineitem WHERE l_orderkey < 400)
    SELECT 'ext_parquet' AS arm, * FROM src
    UNION ALL SELECT 'copy_out_csv', * FROM src
    UNION ALL SELECT 'copy_out_json', * FROM src
    UNION ALL SELECT 'exact_count', grp, n,
                     CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM src
    UNION ALL SELECT 'insert_select', * FROM src
    UNION ALL SELECT 'insert_select', * FROM aff
    UNION ALL SELECT 'copy_in', * FROM src
    UNION ALL SELECT 'copy_in', * FROM aff
    UNION ALL
    SELECT 'update_delete', l_returnflag AS grp, CAST(count(*) AS BIGINT),
           round(sum(CASE WHEN l_returnflag = 'A' THEN l_quantity * 2
                          ELSE l_quantity END), 3),
           round(sum(l_extendedprice), 2)
    FROM lineitem WHERE l_orderkey < 400 AND l_returnflag <> 'N'
    GROUP BY l_returnflag
    """,
)
def external_copy_insert(spark, sf_dir):
    """External tables + COPY + INSERT through the engine's SQL surface
    (SURVEY §2 rows 5, 9-11, 23; reference sql/planner.rs:2346-2477 COPY,
    CREATE EXTERNAL TABLE in datafusion's DDL, INSERT planner.rs). Arms:

    - ext_parquet: CREATE EXTERNAL TABLE ... STORED AS PARQUET over the
      source file, aggregate through engine SQL (scan stays distributed,
      filter pushes into the parquet scan);
    - copy_out_csv / copy_out_json: COPY INTO '<url>' FROM (query) exports
      the slice, CREATE EXTERNAL TABLE reads it back (CSV header +
      inferSchema; NDJSON), same aggregate — a full writer→reader
      round-trip per format;
    - exact_count: exact_count(x) → count(x) rewriter parity
      (sql/rewriter.py:413; reference transform_exact_count rule) executed
      through the engine path;
    - insert_select: CREATE TABLE + INSERT INTO ... SELECT from the
      external table (positional cast semantics), then aggregate the tskv
      table; '__affected__' row pins the INSERT's affected-rows count;
    - copy_in: COPY INTO <table> FROM '<url>' imports the CSV export into
      a second tskv table (by-name column mapping), same aggregate +
      affected-rows row;
    - update_delete (round 7): UPDATE ... WHERE then DELETE ... WHERE on
      the inserted table (engine read-merge-overwrite, reference
      transform_update.rs / §4.1), aggregate of the survivors vs an
      oracle replaying the mutation as CASE + filter.

    The tskv tables key on (time=l_shipdate, tag rk=orderkey_linenumber),
    unique in the slice, so the LWW merge on read is a no-op — the oracle
    aggregates the raw slice."""
    import tempfile

    from cnosdb_spark.engine import Engine

    work = tempfile.mkdtemp(prefix="ext_copy_")
    eng = Engine(spark, f"{work}/wh")
    # Round-11 layout choice (guide §6.2): the inserted slice spans ~7
    # years of l_shipdate, so daily _tb= buckets fan every tskv write
    # (INSERT, COPY-in, UPDATE/DELETE rewrite) out to ~1222 partition
    # dirs — measured file-commit-bound, not compute-bound. A 365d
    # vnode_duration (the reference's time-shard duration option) gives
    # the backfill tables YEARLY buckets: ~8 dirs, same rows, same
    # merge/pruning semantics at the granularity the data actually
    # needs. Values are layout-independent (oracle-pinned).
    eng.sql("ALTER DATABASE public SET VNODE_DURATION '365d'")
    eng.sql(
        "CREATE EXTERNAL TABLE li_ext STORED AS PARQUET "
        f"LOCATION '{sf_dir}/lineitem.parquet'"
    )
    slice_sql = (
        "SELECT l_shipdate AS time, "
        "concat('r', l_orderkey, '_', l_linenumber) AS rk, "
        "l_returnflag, l_quantity, l_extendedprice "
        "FROM li_ext WHERE l_orderkey < 400"
    )
    eng.sql(
        f"COPY INTO '{work}/li_csv' FROM ({slice_sql}) "
        "FILE_FORMAT = (TYPE = 'CSV')"
    )
    eng.sql(
        f"COPY INTO '{work}/li_json' FROM ({slice_sql}) "
        "FILE_FORMAT = (TYPE = 'JSON')"
    )
    eng.sql(
        "CREATE EXTERNAL TABLE li_csv STORED AS CSV WITH HEADER ROW "
        f"LOCATION '{work}/li_csv'"
    )
    eng.sql(
        f"CREATE EXTERNAL TABLE li_json STORED AS JSON LOCATION '{work}/li_json'"
    )

    def _agg(arm: str, table: str, where: str = "") -> DataFrame:
        df = eng.sql(
            f"SELECT l_returnflag AS grp, CAST(count(*) AS BIGINT) AS n, "
            f"round(sum(l_quantity), 3) AS sum_qty, "
            f"round(sum(l_extendedprice), 2) AS sum_price "
            f"FROM {table} {where} GROUP BY l_returnflag"
        )
        return df.select(F.lit(arm).alias("arm"), "grp", "n", "sum_qty", "sum_price")

    def _affected(arm: str, df: DataFrame) -> DataFrame:
        return df.select(
            F.lit(arm).alias("arm"),
            F.lit("__affected__").alias("grp"),
            F.col("rows").cast("long").alias("n"),
            F.lit(None).cast("double").alias("sum_qty"),
            F.lit(None).cast("double").alias("sum_price"),
        )

    out = _agg("ext_parquet", "li_ext", "WHERE l_orderkey < 400")
    out = out.unionAll(_agg("copy_out_csv", "li_csv"))
    out = out.unionAll(_agg("copy_out_json", "li_json"))
    out = out.unionAll(
        eng.sql(
            "SELECT l_returnflag AS grp, "
            "CAST(exact_count(l_quantity) AS BIGINT) AS n "
            "FROM li_ext WHERE l_orderkey < 400 GROUP BY l_returnflag"
        ).select(
            F.lit("exact_count").alias("arm"), "grp", "n",
            F.lit(None).cast("double").alias("sum_qty"),
            F.lit(None).cast("double").alias("sum_price"),
        )
    )

    eng.sql(
        "CREATE TABLE li_ins(l_quantity DOUBLE, l_extendedprice DOUBLE, "
        "TAGS(rk, l_returnflag))"
    )
    ins = eng.sql(
        "INSERT INTO li_ins(time, rk, l_returnflag, l_quantity, l_extendedprice) "
        "SELECT l_shipdate, concat('r', l_orderkey, '_', l_linenumber), "
        "l_returnflag, l_quantity, l_extendedprice "
        "FROM li_ext WHERE l_orderkey < 400"
    )
    # materialize the PRE-mutation aggregate now (localCheckpoint, eager):
    # the update_delete arm below rewrites li_ins's files, and a lazy plan
    # would re-read the mutated (or deleted) files at driver-collect time
    out = out.unionAll(_agg("insert_select", "li_ins").localCheckpoint())
    out = out.unionAll(_affected("insert_select", ins))

    eng.sql(
        "CREATE TABLE li_cp(l_quantity DOUBLE, l_extendedprice DOUBLE, "
        "TAGS(rk, l_returnflag))"
    )
    cp = eng.sql(
        f"COPY INTO li_cp FROM '{work}/li_csv' "
        "FILE_FORMAT = (TYPE = 'CSV' WITH HEADER ROW)"
    )
    out = out.unionAll(_agg("copy_in", "li_cp"))
    out = out.unionAll(_affected("copy_in", cp))

    # UPDATE / DELETE (§4.1 read-merge-overwrite): mutate the inserted
    # table through engine SQL, aggregate the survivors; the oracle
    # replays the mutation as CASE + filter over the raw slice
    eng.sql("UPDATE li_ins SET l_quantity = l_quantity * 2 WHERE l_returnflag = 'A'")
    eng.sql("DELETE FROM li_ins WHERE l_returnflag = 'N'")
    out = out.unionAll(_agg("update_delete", "li_ins"))
    return out


@_q(
    "lww_dedup_merge",
    """
    WITH w AS (
      SELECT user_id, ts, value, event_type, 1 AS seq FROM events
      UNION ALL
      SELECT user_id, ts, value + 1000, NULL, 2 FROM events WHERE event_id % 10 = 0)
    SELECT user_id, epoch_us(ts) AS ts_us,
           round(arg_max(value, CASE WHEN value IS NOT NULL THEN seq END), 6) AS value,
           arg_max(event_type, CASE WHEN event_type IS NOT NULL THEN seq END) AS event_type,
           CAST(count(*) AS BIGINT) AS n_writes
    FROM w GROUP BY user_id, ts
    """,
)
def lww_dedup(spark, sf_dir):
    """Per-column last-write-wins merge on (series, time): a later write
    with NULL in a field does NOT erase the earlier value (SURVEY §7.4.2;
    reference tskv/src/reader/sort_merge.rs column-cursor merge, pinned by
    cases/sqlancer/repeat_write.slt:12-32). Simulated with a second write
    batch updating value only."""
    e = _t(spark, sf_dir, "events")
    base = e.select("user_id", "ts", "value", "event_type", F.lit(1).alias("seq"))
    upd = (
        e.filter(F.col("event_id") % 10 == 0)
        .select(
            "user_id",
            "ts",
            (F.col("value") + 1000).alias("value"),
            F.lit(None).cast("string").alias("event_type"),
            F.lit(2).alias("seq"),
        )
    )
    w = base.unionAll(upd)
    return w.groupBy("user_id", "ts").agg(
        F.round(
            F.max_by("value", F.when(F.col("value").isNotNull(), F.col("seq"))), 6
        ).alias("value"),
        F.max_by("event_type", F.when(F.col("event_type").isNotNull(), F.col("seq"))).alias(
            "event_type"
        ),
        F.count(F.lit(1)).alias("n_writes"),
    ).select(
        "user_id", F.unix_micros("ts").alias("ts_us"), "value", "event_type", "n_writes"
    )


# =====================================================================
# Training-data-pipeline operators (dedup / similarity / text)
# =====================================================================

_NORM_SQL = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_TOKS_SQL = f"string_split_regex({_NORM_SQL}, ' ')"
_SHINGLE_CTE = f"""
    WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
    sh AS (
      SELECT doc_id, unnest(CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                            ELSE list_transform(range(1, len(t) - 1),
                                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END) AS s
      FROM toks),
    d AS (SELECT DISTINCT doc_id, s FROM sh)
"""


@_q(
    "dedup_exact",
    f"""
    SELECT CAST(min(doc_id) AS BIGINT) AS doc_id,
           CAST(count(*) AS BIGINT) AS dup_count
    FROM documents GROUP BY md5({_NORM_SQL})
    """,
)
def dedup_exact(spark, sf_dir):
    """Exact dedup on normalized-content hash; deterministic winner."""
    d = _t(spark, sf_dir, "documents")
    return dedup.exact_dedup(d, "text", "doc_id")


@_q(
    "ngram_jaccard_pairs",
    _SHINGLE_CTE
    + """
    , keep AS (SELECT s FROM d GROUP BY s HAVING count(*) <= 1000),
    df AS (SELECT d.doc_id, d.s FROM d JOIN keep ON keep.s = d.s),
    sz AS (SELECT doc_id, count(*) AS n FROM df GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
              FROM df a JOIN df b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
    SELECT id_a, id_b, round(c * 1.0 / (sa.n + sb.n - c), 6) AS jaccard
    FROM inter JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
    WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.2
    """,
)
def ngram_jaccard(spark, sf_dir):
    """Word-3-gram Jaccard near-dup pairs via inverted-index join with a
    stop-shingle document-frequency ceiling (bounds per-key join fan-out)."""
    d = _t(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(
        d, "text", "doc_id", n=3, threshold=0.2, max_doc_freq=1000
    )


def _minhash_cte_tail(num_hashes: int = 16, bands: int = 4) -> str:
    """Banding CTE fragment (hashed → sig → buckets) appended after a
    shingle CTE exposing ``sh(doc_id, s)``. Carries the identical
    universal-hash arithmetic as operators.dedup.minhash_signatures:
    h = int(substr(md5(shingle),1,10), 16) (hex parsed with an explicit
    base-16 polynomial — DuckDB has no conv()), then
    mh_i = min((A[i]*h + B[i]) % (2^61-1)); band keys are
    md5('b:|mh..|mh..') exactly as minhash_band_table builds them."""
    from cnosdb_spark.operators.dedup import MINHASH_P, _minhash_coeffs

    rows = num_hashes // bands
    hex_poly = " + ".join(
        f"(instr('0123456789abcdef', substr(md5(s), {j}, 1)) - 1) * {16 ** (10 - j)}"
        for j in range(1, 11)
    )
    mh = ", ".join(
        f"min(({a} * h + {b}) % {MINHASH_P}) AS mh_{i}"
        for i, (a, b) in enumerate(_minhash_coeffs(num_hashes))
    )
    band_exprs = []
    for b in range(bands):
        parts = " || '|' || ".join(f"mh_{b * rows + r}" for r in range(rows))
        band_exprs.append(f"md5('{b}:' || '|' || {parts})")
    bands_arr = ", ".join(band_exprs)
    return f"""
    , hashed AS (SELECT doc_id, CAST({hex_poly} AS BIGINT) AS h FROM sh),
    sig AS (SELECT doc_id, {mh} FROM hashed GROUP BY doc_id),
    buckets AS (SELECT doc_id, unnest([{bands_arr}]) AS bucket FROM sig)
    """


def _minhash_oracle(num_hashes: int = 16, bands: int = 4) -> str:
    return (
        _SHINGLE_CTE
        + _minhash_cte_tail(num_hashes, bands)
        + """
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM buckets a JOIN buckets b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
    """
    )


@_q("minhash_lsh_pairs", _minhash_oracle())
def minhash_lsh(spark, sf_dir):
    """MinHash+LSH banding candidate pairs: shingle → md5-seeded minhash
    signature → 4 bands × 4 rows → bucket equi-join."""
    d = _t(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(d, "text", "doc_id", n=3, num_hashes=16, bands=4)


def _simhash_oracle(bits: int = 16) -> str:
    """SimHash oracle: reconstruct each md5-prefix bit with hex-digit math
    (instr into '0123456789abcdef'), matching operators.dedup.simhash."""
    hexlen = bits // 4
    digit = (
        lambda p: f"(instr('0123456789abcdef', substr(md5(tok), {p}, 1)) - 1)"
    )
    sums = []
    for b in range(bits):
        p = hexlen - b // 4  # hex digit position (1-based), LSB digit last
        k = b % 4
        bit = f"CAST(floor({digit(p)} / {2**k}) AS INT) % 2"
        sums.append(f"sum(CASE WHEN {bit} = 1 THEN 1 ELSE -1 END) AS s{b}")
    sum_sql = ", ".join(sums)
    fp = " + ".join(f"CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END" for b in range(bits))
    return f"""
    WITH tok AS (SELECT doc_id, unnest({_TOKS_SQL}) AS tok FROM documents),
    sums AS (SELECT doc_id, {sum_sql} FROM tok GROUP BY doc_id)
    SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM sums
    """


@_q("simhash_fingerprints", _simhash_oracle())
def simhash_fp(spark, sf_dir):
    """SimHash document fingerprints (16-bit; md5-derived, UDF-free)."""
    d = _t(spark, sf_dir, "documents")
    return dedup.simhash(d, "text", "doc_id", bits=16).withColumnRenamed("_id", "doc_id")


@_q(
    "embedding_cosine_topk",
    """
    WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < 5),
    s AS (SELECT q.qid, e.vec_id AS cid,
                 list_cosine_similarity(e.embedding::DOUBLE[], q.qv) AS cos
          FROM embeddings e, q),
    r AS (SELECT qid, cid, cos,
                 row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rn
          FROM s)
    SELECT qid AS query_id, cid AS vec_id, round(cos, 6) AS cosine,
           CAST(rn AS INT) AS rank
    FROM r WHERE rn <= 10
    """,
)
def embedding_topk(spark, sf_dir):
    """Brute-force cosine top-k ANN baseline: broadcast queries, one corpus
    scan, per-query window top-k."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return similarity.brute_force_topk(emb, queries, k=10)


def _near_dup_oracle(
    bands: int = 16,
    band_dims: int = 4,
    threshold: float = 0.4,
    max_bucket_size: int = 40,
) -> str:
    """Mirror of dedup.embedding_near_dup_pairs' sign-band LSH: DuckDB
    arrays are 1-based, Spark getItem is 0-based.  Replicates the
    ``max_bucket_size`` hot-bucket ceiling (drop buckets holding more than
    that many vectors BEFORE pair expansion) — the ceiling is a
    deterministic function of the corpus, so both engines drop the exact
    same buckets and the hash must still match."""
    band_exprs = []
    for b in range(bands):
        signs = " || ".join(
            f"(CASE WHEN v[{b * band_dims + d + 1}] >= 0 THEN '1' ELSE '0' END)"
            for d in range(band_dims)
        )
        band_exprs.append(f"'{b}:' || {signs}")
    return f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    bk AS (SELECT vec_id, unnest([{", ".join(band_exprs)}]) AS bucket FROM v),
    sz AS (SELECT bucket, count(*) AS n FROM bk GROUP BY bucket),
    bk2 AS (SELECT bk.vec_id, bk.bucket FROM bk JOIN sz USING (bucket)
            WHERE sz.n <= {max_bucket_size}),
    cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
             FROM bk2 a JOIN bk2 b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
    SELECT id_a, id_b, round(list_cosine_similarity(va.v, vb.v), 6) AS cosine
    FROM cand JOIN v va ON va.vec_id = id_a JOIN v vb ON vb.vec_id = id_b
    WHERE list_cosine_similarity(va.v, vb.v) >= {threshold}
    """


def _lsh_topk_oracle_arm(n_planes: int = 4, k: int = 5) -> str:
    signs = " || ".join(
        f"(CASE WHEN v[{i + 1}] >= 0 THEN '1' ELSE '0' END)" for i in range(n_planes)
    )
    return f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    b AS (SELECT vec_id, v, {signs} AS bucket FROM v),
    q AS (SELECT vec_id AS qid, v AS qv, bucket FROM b WHERE vec_id < 20),
    s AS (SELECT q.qid, c.vec_id AS cid,
                 list_cosine_similarity(c.v, q.qv) AS cos
          FROM b c JOIN q USING (bucket)),
    r AS (SELECT qid, cid, cos,
                 row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rn
          FROM s)
    SELECT 'lsh_topk' AS op, qid AS a, cid AS b, round(cos, 6) AS cosine,
           CAST(rn AS INT) AS rank
    FROM r WHERE rn <= {k}
    """


@_q(
    "sign_lsh_similarity",
    "SELECT 'near_dup' AS op, id_a AS a, id_b AS b, cosine, CAST(NULL AS INT) AS rank FROM ("
    + _near_dup_oracle()
    + ") UNION ALL SELECT * FROM ("
    + _lsh_topk_oracle_arm()
    + ")",
)
def sign_lsh_similarity(spark, sf_dir):
    """Sign-LSH similarity family (the 100 TB scale path) — two arms, one
    registry slot (embedding_near_dup + lsh_ann_topk folded — both are the
    same sign-hyperplane banding machinery over dedup.py/similarity.py):

    - near_dup: embedding-cosine near-dup pairs via sign-band LSH
      candidates + exact verify (equi-join on band key, no all-pairs
      nested loop). 16 bands × 4 dims keeps recall high at the low 0.4
      threshold this dataset needs; production near-dup (≥0.9) uses the
      wider 8×8 default. ``max_bucket_size=40`` drops hot band buckets
      before pair expansion — the scale knob that keeps in-bucket pair
      expansion from going quadratic (round-6 BENCH_SCALE measured the
      uncapped demo config at 77.9× wall for 10× data). The ceiling is
      ACTIVE at sf0.01 (12 of 256 buckets exceed it) and the SQL oracle
      replicates it, so the drop logic itself is differentially verified;
      recall vs exact ground truth is unchanged (0.966 with or without the
      ceiling — pairs in dropped buckets still meet in their other, more
      selective bands);
    - lsh_topk: LSH-bucketed approximate top-k — sign-LSH buckets
      (axis-aligned hyperplanes, SQL-reproducible so the oracle replicates
      the bucketing exactly), exact cosine within bucket only.
    """
    emb = _t(spark, sf_dir, "embeddings")
    near = dedup.embedding_near_dup_pairs(
        emb, "embedding", "vec_id", threshold=0.4, bands=16, band_dims=4,
        max_bucket_size=40,
    ).select(
        F.lit("near_dup").alias("op"),
        F.col("id_a").alias("a"),
        F.col("id_b").alias("b"),
        "cosine",
        F.lit(None).cast("int").alias("rank"),
    )
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    topk = similarity.lsh_topk(
        emb, queries, dim=64, k=5, n_planes=4, axis_aligned=True
    ).select(
        F.lit("lsh_topk").alias("op"),
        F.col("query_id").alias("a"),
        F.col("vec_id").alias("b"),
        "cosine",
        "rank",
    )
    return near.unionAll(topk)


_PQ_M, _PQ_K, _PQ_NQ = 8, 16, 10
_PQ_ADC_K, _PQ_SHORTLIST, _PQ_FINAL_K = 5, 150, 10
_IVF_NC = 8


def _pq_oracle(corpus: str | None = None) -> str | None:
    """Differential oracle for the PQ/ADC pipeline: train the IDENTICAL
    codebooks from the identical md5-ordered sample (pure numpy —
    similarity._train_codebooks, the same function the Spark path calls),
    embed them as literals, and replay normalize → encode (argmin per
    subspace) → ADC scoring → shortlist → exact re-rank entirely in
    DuckDB SQL.  Emits ranks only (no ADC floats), so 1e-16 float-order
    differences between engines cannot flip the hash.  Returns None ONLY
    when the corpus file is genuinely absent (row degrades to the
    rows-only check); any other failure RAISES — silent disabling would
    shrink correctness coverage invisibly. The existence check runs
    BEFORE the imports so a host with no corpus AND no duckdb/numpy
    still degrades instead of failing at module import."""
    # the driver evaluates oracles at sf0.01; local sweeps at another
    # SF set SPARK_GRAFT_ORACLE_SF_DIR so the literal codebooks train
    # on the same corpus the Spark side will see
    corpus = corpus or os.environ.get(
        "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
    )
    if not os.path.exists(os.path.join(corpus, "embeddings.parquet")):
        return None

    import duckdb
    import numpy as np

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT embedding::DOUBLE[] FROM '{corpus}/embeddings.parquet' "
        "ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 2048"
    ).fetchall()
    con.close()
    books = similarity._train_codebooks(
        np.array([r[0] for r in rows]), _PQ_M, _PQ_K
    )
    blit = "[" + ", ".join(
        "[" + ", ".join("[" + ", ".join(repr(x) for x in c) + "]" for c in sub)
        + "]"
        for sub in books
    ) + "]"
    sub = 64 // _PQ_M
    adc_sum = " + ".join(
        f"q.dt[{i + 1}][e.code[{i + 1}] + 1]" for i in range(_PQ_M)
    )
    return f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS raw FROM embeddings),
    n AS (SELECT vec_id, raw,
          greatest(sqrt(list_sum(list_transform(raw, e -> e * e))), 1e-12) AS nrm
          FROM v),
    u AS (SELECT vec_id, raw, list_transform(raw, e -> e / nrm) AS x FROM n),
    dist AS (SELECT vec_id, raw,
      list_transform(range(1, {_PQ_M + 1}), i ->
        list_transform(({blit})[i], c ->
          list_sum(list_transform(range(1, {sub + 1}), j ->
            (x[(i-1)*{sub} + j] - c[j]) * (x[(i-1)*{sub} + j] - c[j]))))) AS dt
      FROM u),
    enc AS (SELECT vec_id, raw AS cv,
            list_transform(dt, d -> list_position(d, list_min(d)) - 1) AS code
            FROM dist),
    qd AS (SELECT vec_id AS qid, raw AS qv, dt FROM dist
           WHERE vec_id < {_PQ_NQ}),
    pairs AS (
      SELECT q.qid, e.vec_id AS cid, e.cv, q.qv, {adc_sum} AS adc
      FROM enc e CROSS JOIN qd q),
    adc_rank AS (
      SELECT qid, cid, cv, qv,
             row_number() OVER (PARTITION BY qid ORDER BY adc, cid) AS rn
      FROM pairs),
    refined AS (
      SELECT qid, cid,
             row_number() OVER (PARTITION BY qid
               ORDER BY list_cosine_similarity(cv, qv) DESC, cid) AS rr
      FROM adc_rank WHERE rn <= {_PQ_SHORTLIST}),
    exact AS (
      SELECT q.qid, e.vec_id AS cid,
             row_number() OVER (PARTITION BY q.qid
               ORDER BY list_cosine_similarity(e.raw, q.qv) DESC, e.vec_id) AS re
      FROM v e CROSS JOIN (SELECT vec_id AS qid, raw AS qv FROM v
                           WHERE vec_id < {_PQ_NQ}) q)
    SELECT 'adc' AS op, qid AS query_id, cid AS vec_id, CAST(rn AS INT) AS rank
    FROM adc_rank WHERE rn <= {_PQ_ADC_K}
    UNION ALL
    SELECT 'refine', qid, cid, CAST(rr AS INT) FROM refined
    WHERE rr <= {_PQ_FINAL_K}
    UNION ALL
    SELECT 'ivfpq', qid, cid, CAST(re AS INT) FROM exact
    WHERE re <= {_PQ_FINAL_K}
    """


@_q("pq_ivf_ann", _pq_oracle())
def pq_ivf_ann(spark, sf_dir):
    """Product-quantization ANN (operators/similarity.py — Jégou et al.
    PQ/ADC and the IVF-PQ composition) — three arms, ranks only:

    - adc: raw asymmetric-distance top-5 from the compressed codes. The
      oracle retrains the IDENTICAL codebooks (same md5-ordered sample,
      same numpy) and replays normalize/encode/ADC in SQL — a full
      differential of the quantization arithmetic, not a recall bound;
    - refine: the production two-stage pattern — ADC shortlist of 150,
      exact-cosine re-rank to the final 10;
    - ivfpq: ivf_pq_topk_distributed — the ZERO-driver-collection batch
      variant (per-query ADC distance tables are column expressions over
      codebook literals, probed clusters an equi-join; the path a 100 TB
      batch-scoring job runs) — probing ALL clusters with a corpus-sized
      refine must degrade to EXACT brute-force top-10 (the prune-less
      equivalence invariant; pruned-recall behavior and parity with the
      serving-style ivf_pq_topk are pytest-pinned in
      test_operators_misc.py).
    """
    emb = _t(spark, sf_dir, "embeddings")
    books = similarity.pq_codebooks(emb, "embedding", m=_PQ_M, k=_PQ_K)
    codes = similarity.pq_encode(emb, "embedding", books)
    queries = emb.filter(F.col("vec_id") < _PQ_NQ).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )

    def arm(df, op):
        return df.select(
            F.lit(op).alias("op"), "query_id", "vec_id", F.col("rank")
        )

    adc = arm(similarity.pq_topk(codes, queries, books, k=_PQ_ADC_K), "adc")
    refined = arm(
        similarity.pq_topk(
            codes, queries, books, k=_PQ_FINAL_K, refine=_PQ_SHORTLIST
        ),
        "refine",
    )
    cents = similarity.ivf_centroids(emb, "embedding", n_centroids=_IVF_NC)
    ccodes = similarity.ivf_assign(codes, "embedding", cents)
    ivfpq = arm(
        similarity.ivf_pq_topk_distributed(
            ccodes, queries, cents, books,
            k=_PQ_FINAL_K, n_probe=_IVF_NC, refine=1_000_000_000,
        ),
        "ivfpq",
    )
    return adc.unionAll(refined).unionAll(ivfpq)


_SPAN_K = 8

_SPAN_CTE = f"""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
      FROM documents WHERE len(string_split_regex(trim(text), '\\s+')) >= {_SPAN_K}),
    w0 AS (
      SELECT doc_id, toks, unnest(range(1, len(toks) - {_SPAN_K} + 2)) AS i FROM t),
    w AS (
      SELECT doc_id, i - 1 AS pos,
             md5(array_to_string(toks[i:i+{_SPAN_K}-1], chr(31))) AS h
      FROM w0),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn,
             count(*) OVER (PARTITION BY h) AS c
      FROM w),
    hits AS (SELECT doc_id, pos FROM ranked WHERE c >= 2 AND rn > 1),
    grp AS (
      SELECT doc_id, pos,
             sum(CASE WHEN prev_end IS NULL OR pos > prev_end THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos) AS g
      FROM (SELECT doc_id, pos,
                   max(pos + {_SPAN_K}) OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
            FROM hits)),
    spans AS (
      SELECT doc_id, min(pos) AS span_start,
             CAST(max(pos) + {_SPAN_K} AS BIGINT) AS span_end,
             CAST(count(*) AS BIGINT) AS n_windows
      FROM grp GROUP BY doc_id, g)
"""


@_q(
    "duplicate_spans",
    _SPAN_CTE
    + """
    SELECT 'span' AS op, doc_id, span_start AS v1, span_end AS v2, n_windows AS v3
    FROM spans
    UNION ALL
    SELECT 'remove', d.doc_id,
           CAST(coalesce(s.n_spans, 0) AS BIGINT),
           CAST(coalesce(s.n_toks, 0) AS BIGINT),
           NULL
    FROM documents d
    LEFT JOIN (SELECT doc_id, count(*) AS n_spans,
                      sum(span_end - span_start) AS n_toks
               FROM spans GROUP BY doc_id) s ON s.doc_id = d.doc_id
    """,
)
def duplicate_spans_row(spark, sf_dir):
    """Exact duplicate-SPAN dedup (Lee et al. 2107.06499 — the
    suffix-array workload as a rolling k-token inverted index:
    operators/dedup.py duplicate_spans / remove_duplicate_spans) — two
    arms vs a DuckDB unnest(range(...)) window-hash oracle:

    - span: maximal duplicated token spans [span_start, span_end) with
      the globally-first occurrence of each window kept (v1=start,
      v2=end, v3=n_windows);
    - remove: per-document rewrite counters from remove_duplicate_spans
      (v1=n_spans_removed, v2=n_tokens_removed) — every document, 0 for
      untouched ones.
    """
    d = _t(spark, sf_dir, "documents")
    spans = dedup.duplicate_spans(d, "text", "doc_id", k=_SPAN_K).select(
        F.lit("span").alias("op"),
        "doc_id",
        F.col("span_start").cast("long").alias("v1"),
        F.col("span_end").alias("v2"),
        F.col("n_windows").alias("v3"),
    )
    removed = dedup.remove_duplicate_spans(d, "text", "doc_id", k=_SPAN_K).select(
        F.lit("remove").alias("op"),
        "doc_id",
        F.col("n_spans_removed").alias("v1"),
        F.col("n_tokens_removed").alias("v2"),
        F.lit(None).cast("long").alias("v3"),
    )
    return spans.unionAll(removed)


_DAY_US = 86_400_000_000
_HIST_LO, _HIST_HI, _HIST_BINS = 0.0, 500.0, 50
_HIST_W = (_HIST_HI - _HIST_LO) / _HIST_BINS


def _hist_quantile_sql(q: float, alias: str) -> str:
    """First bin (ascending) whose cumulative count crosses q*total,
    linearly interpolated — the exact arithmetic of
    rollup.histogram_quantile, so the doubles match bit-for-bit."""
    return f"""
      (SELECT round({_HIST_LO} + (b + (total * {q} - (cum - c)) / c) * {_HIST_W}, 6)
       FROM (SELECT b, c, cum, total,
                    row_number() OVER (ORDER BY b) AS rn
             FROM cum WHERE cum.bucket_us = d.bucket_us AND cum >= total * {q})
       WHERE rn = 1) AS {alias}"""


@_q(
    "rollup_two_tier",
    f"""
    WITH e AS (
      SELECT CAST(floor(epoch_us(ts) / {_DAY_US}) AS BIGINT) * {_DAY_US} AS bucket_us,
             value
      FROM events),
    onep AS (
      SELECT bucket_us, CAST(count(value) AS BIGINT) AS v_cnt,
             round(sum(value), 4) AS v1, round(min(value), 6) AS v2,
             round(max(value), 6) AS v3,
             round(sum(value) / count(value), 6) AS v4
      FROM e GROUP BY bucket_us),
    binned AS (
      SELECT bucket_us,
             least(greatest(CAST(floor((value - {_HIST_LO}) / ({_HIST_HI} - {_HIST_LO})
                                        * {_HIST_BINS}) AS INT), 0),
                   {_HIST_BINS - 1}) AS b
      FROM e WHERE value IS NOT NULL),
    binc AS (SELECT bucket_us, b, CAST(count(*) AS DOUBLE) AS c
             FROM binned GROUP BY bucket_us, b),
    cum AS (SELECT bucket_us, b, c,
                   sum(c) OVER (PARTITION BY bucket_us ORDER BY b) AS cum,
                   sum(c) OVER (PARTITION BY bucket_us) AS total
            FROM binc),
    hq AS (
      SELECT d.bucket_us, {_hist_quantile_sql(0.5, "p50")},
                          {_hist_quantile_sql(0.95, "p95")}
      FROM (SELECT DISTINCT bucket_us FROM e) d)
    SELECT 'two_tier' AS op, bucket_us, v_cnt, v1, v2, v3, v4 FROM onep
    UNION ALL
    SELECT 'hist_quantile', bucket_us, NULL, p50, p95, NULL, NULL FROM hq
    """,
)
def rollup_two_tier(spark, sf_dir):
    """Continuous-aggregate rollup READ path (operators/rollup.py — the
    hypertable-style materialized downsample): builds a real store in a
    temp dir (one availableNow refresh over the raw events parquet with a
    50-bin value histogram), then verifies the two read surfaces a
    dashboard depends on against a one-shot DuckDB aggregation of the
    same raw data:

    - two_tier: query_two_tier stitches rolled buckets (< high-water
      mark) with the raw tail (>= hwm) — per day-bucket cnt/sum/min/
      max/avg must equal the one-shot aggregation exactly;
    - hist_quantile: p50/p95 per bucket from the MERGED fixed-bin
      histogram segments via histogram_quantile — the oracle replays the
      same bin/interpolate arithmetic (approximation error is in the
      binning, not the engine, so the doubles match exactly).
    """
    import shutil
    import tempfile

    from cnosdb_spark.operators import rollup as R

    base = tempfile.mkdtemp(prefix="cnos_rollup_row_")
    # the file stream source wants a DIRECTORY — stage the raw file into one
    src = os.path.join(base, "src")
    os.makedirs(src)
    shutil.copy(os.path.join(sf_dir, "events.parquet"), src)
    rp, ck = os.path.join(base, "store"), os.path.join(base, "ck")
    R.refresh_rollup(
        spark, src, rp, ck, "1 day", ["value"], time_col="ts",
        histograms={"value": (_HIST_LO, _HIST_HI, _HIST_BINS)},
    )
    two = R.query_two_tier(spark, src, rp, "1 day", ["value"], time_col="ts").select(
        F.lit("two_tier").alias("op"),
        F.unix_micros("bucket").alias("bucket_us"),
        F.col("value_cnt").cast("long").alias("v_cnt"),
        F.round("value_sum", 4).alias("v1"),
        F.round("value_min", 6).alias("v2"),
        F.round("value_max", 6).alias("v3"),
        F.round("value_avg", 6).alias("v4"),
    )
    hist = R.read_rollup(
        spark, rp, ["value"], histograms={"value": (_HIST_LO, _HIST_HI, _HIST_BINS)}
    ).select(
        F.lit("hist_quantile").alias("op"),
        F.unix_micros("bucket").alias("bucket_us"),
        F.lit(None).cast("long").alias("v_cnt"),
        F.round(
            R.histogram_quantile(F.col("value_hist"), _HIST_LO, _HIST_HI, 0.5), 6
        ).alias("v1"),
        F.round(
            R.histogram_quantile(F.col("value_hist"), _HIST_LO, _HIST_HI, 0.95), 6
        ).alias("v2"),
        F.lit(None).cast("double").alias("v3"),
        F.lit(None).cast("double").alias("v4"),
    )
    return two.unionAll(hist)


_STOPWORDS_SQL = "[" + ", ".join(f"'{w}'" for w in text.STOPWORDS_EN) + "]"


def _langid_per_doc_sql() -> str:
    """Per-document language-ID mirror of operators.text.lang_id."""
    score = {
        lang: "("
        + " + ".join(
            f"len(list_filter({_TOKS_SQL}, w -> w = '{m}'))" for m in markers
        )
        + ")"
        for lang, markers in text.LANG_MARKERS.items()
    }
    return f"""
    SELECT doc_id,
           CASE WHEN greatest(s_en, s_de, s_fr, s_es) <= 0 THEN 'und'
                WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
                WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
                WHEN s_fr >= s_es THEN 'fr'
                ELSE 'es' END AS lang_pred
    FROM (SELECT doc_id,
                 {score['en']} AS s_en, {score['de']} AS s_de,
                 {score['fr']} AS s_fr, {score['es']} AS s_es
          FROM documents)
    """


_LANGID_PER_DOC_SQL = _langid_per_doc_sql()


def _bpe_oracle_values(corpus: str | None = None) -> str | None:
    """Expected per-document REAL-BPE token counts for text_quality_stats'
    bpe column, computed at import with the same ground-truth-from-shared-
    code contract as _dhash_oracle_values: word counting is replicated in
    pure Python (re.ASCII \\s+ split == Spark's Java \\s+), the merge
    table is learned with the SAME train_bpe the Spark side uses (fully
    deterministic from the word table), and documents are encoded with the
    same _encode_word. The Spark side recomputes the word table as a
    DISTRIBUTED aggregation and encodes via the Arrow pandas UDF — so a
    bug in the distributed word counting, the capped top-N, the broadcast
    merge ranks or the batch encode plumbing breaks the hash. Returns
    None (column dropped on both sides) ONLY if the corpus file is
    genuinely absent at import; any other failure RAISES — silent
    disabling would shrink correctness coverage invisibly. The existence
    check runs BEFORE the imports so a host with no corpus AND no duckdb
    still degrades instead of failing at module import."""
    corpus = corpus or os.environ.get(
        "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
    )
    if not os.path.exists(os.path.join(corpus, "documents.parquet")):
        return None

    import re

    import duckdb

    from cnosdb_spark.operators.tokenizer import _encode_word, train_bpe

    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM '{corpus}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    con.close()
    ws = re.compile(r"\s+", re.ASCII)
    counts: dict[str, int] = {}
    for _, text in docs:
        for w in ws.split((text or "").lower()):
            if w:
                counts[w] = counts.get(w, 0) + 1
    table = sorted(
        ((w, n) for w, n in counts.items() if n >= _BPE_MIN_COUNT),
        key=lambda wn: (-wn[1], wn[0]),
    )[:_BPE_MAX_WORDS]
    model = train_bpe(table, n_merges=_BPE_N_MERGES)
    ranks = {tuple(p): i for i, p in enumerate(model["merges"])}
    cache: dict[str, int] = {}
    vals = []
    for doc_id, text in docs:
        n = 0
        for w in (text or "").lower().split():
            got = cache.get(w)
            if got is None:
                got = cache[w] = len(_encode_word(w, ranks))
            n += got
        vals.append(f"({doc_id}, {n})")
    return ",\n    ".join(vals)


_BPE_MIN_COUNT, _BPE_MAX_WORDS, _BPE_N_MERGES = 2, 5000, 200
_BPE_ORACLE = _bpe_oracle_values()


@_q(
    "text_quality_stats",
    f"""
    WITH s AS (
      SELECT doc_id, text,
             CAST(length(text) AS BIGINT) AS n_chars_c,
             CAST(CASE WHEN trim(text) = '' THEN 0
                  ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS n_tokens,
             length(text) - length(regexp_replace(text, '[!-/:-@\\[-`{{-~]', '', 'g')) AS n_punct,
             length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit,
             len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                             w -> list_contains({_STOPWORDS_SQL}, w))) AS n_stop,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE len(string_split_regex(trim(text), '\\s+')) END AS nt
      FROM documents)
    SELECT doc_id, n_chars_c, n_tokens,
           round(CASE WHEN n_chars_c > 0 THEN n_punct * 1.0 / n_chars_c ELSE 0 END, 6) AS punct_ratio,
           round(CASE WHEN n_chars_c > 0 THEN n_digit * 1.0 / n_chars_c ELSE 0 END, 6) AS digit_ratio,
           round(CASE WHEN nt > 0 THEN n_stop * 1.0 / nt ELSE 0 END, 6) AS stopword_ratio,
           round(CASE WHEN nt > 0
                 THEN length(regexp_replace(text, '\\s+', '', 'g')) * 1.0 / nt
                 ELSE 0 END, 6) AS mean_word_len,
           lang_pred,
           md5({_NORM_SQL}) AS fingerprint,
           CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS BIGINT)
             AS n_bpe_tokens
           {', CAST(bp.n AS BIGINT) AS n_bpe_real' if _BPE_ORACLE else ''}
    FROM s JOIN ({_LANGID_PER_DOC_SQL}) lp USING (doc_id)
    {f'JOIN (VALUES {_BPE_ORACLE}) AS bp(doc_id, n) USING (doc_id)' if _BPE_ORACLE else ''}
    """,
)
def text_quality_stats(spark, sf_dir):
    """Text quality statistics (length/punct/digit/stopword ratios) +
    per-document language-ID (marker-stopword argmax heuristic) +
    md5 content fingerprint and BPE-ish-regex token count (folded from
    the retired lang_id_counts / text_token_fingerprint rows — same
    operators, one registry slot).

    n_bpe_real (round 8): the REAL trained-BPE token count — the full
    operators/tokenizer.py stack runs inside the arm (distributed
    word_counts → capped top-N → train_bpe on the bounded table →
    bpe_token_count via the Arrow pandas UDF with broadcast merge
    ranks); the oracle carries per-doc expected counts recomputed at
    import from a pure-Python replication of the counting + the same
    deterministic trainer/encoder (_bpe_oracle_values).

    Round-10 restructure (same outputs, oracle-pinned): the stopword
    count and the four language-marker counts run in ONE
    token_set_counts kernel pass instead of two (with_text_stats +
    lang_id each launched their own), and every text-derived scalar
    (lengths, ratios, fingerprint, regex token count) is projected
    JVM-side BEFORE the kernel — so `text` itself never crosses the
    Python boundary; only doc_id, eight narrow scalars and the token
    array do (guide §4: pass only the columns the function needs)."""
    from cnosdb_spark.operators import tokenizer

    d = _t(spark, sf_dir, "documents")
    t = F.col("text")
    n_chars = F.length(t)
    n_tokens = text.token_count(t)
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[!-/:-@\[-`{-~]", ""))
    n_digit = n_chars - F.length(F.regexp_replace(t, r"[0-9]", ""))
    pre = d.select(
        "doc_id",
        n_chars.cast("long").alias("n_chars_c"),
        n_tokens.cast("long").alias("n_tokens"),
        F.round(
            F.when(n_chars > 0, n_punct / n_chars).otherwise(0.0).cast("double"), 6
        ).alias("punct_ratio"),
        F.round(
            F.when(n_chars > 0, n_digit / n_chars).otherwise(0.0).cast("double"), 6
        ).alias("digit_ratio"),
        F.round(
            F.when(n_tokens > 0, F.length(F.regexp_replace(t, r"\s+", "")) / n_tokens)
            .otherwise(F.lit(0.0))
            .cast("double"),
            6,
        ).alias("mean_word_len"),
        text.fingerprint(t).alias("fingerprint"),
        F.size(F.regexp_extract_all("text", F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"), 0))
        .cast("long")
        .alias("n_bpe_tokens"),
        text.tokens(F.lower(t)).alias("_toks_lc"),
    )
    sets: dict[str, list[str]] = {"_n_stop": text.STOPWORDS_EN}
    sets.update({f"_lm_{lang}": mk for lang, mk in text.LANG_MARKERS.items()})
    counted = text.token_set_counts(pre, "_toks_lc", sets)
    best = F.greatest(
        *[
            F.struct(
                F.col(f"_lm_{lang}").alias("score"),
                F.lit(-i).alias("prio"),
                F.lit(lang).alias("lang"),
            )
            for i, lang in enumerate(text.LANG_MARKERS)
        ]
    )
    out = counted.select(
        "doc_id",
        "n_chars_c",
        "n_tokens",
        "punct_ratio",
        "digit_ratio",
        F.round(
            F.when(F.col("n_tokens") > 0, F.col("_n_stop") / F.col("n_tokens"))
            .otherwise(0.0)
            .cast("double"),
            6,
        ).alias("stopword_ratio"),
        "mean_word_len",
        F.when(best["score"] <= 0, F.lit("und")).otherwise(best["lang"]).alias("lang_pred"),
        "fingerprint",
        "n_bpe_tokens",
    )
    if _BPE_ORACLE:
        wc = tokenizer.word_counts(
            d, "text", min_count=_BPE_MIN_COUNT, max_words=_BPE_MAX_WORDS
        )
        model = tokenizer.train_bpe(wc, n_merges=_BPE_N_MERGES)
        bpe = tokenizer.bpe_token_count(
            d.select("doc_id", "text"), model["merges"], "text",
            out_col="n_bpe_real",
        ).select("doc_id", "n_bpe_real")
        out = out.join(bpe, "doc_id")
    return out


@_q(
    "asof_range_join",
    """
    SELECT 'asof' AS op, t.event_id AS k, round(q.value, 6) AS val
    FROM (SELECT * FROM events WHERE event_type = 'purchase') t
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') q
      ON t.user_id = q.user_id AND q.ts <= t.ts
    UNION ALL
    SELECT 'asof_tol', t.event_id,
           round(CASE WHEN q.ts >= t.ts - INTERVAL 1 HOUR THEN q.value END, 6)
    FROM (SELECT * FROM events WHERE event_type = 'purchase') t
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') q
      ON t.user_id = q.user_id AND q.ts <= t.ts
    UNION ALL
    SELECT 'range', e.user_id, CAST(count(*) AS DOUBLE)
    FROM events e
    JOIN (SELECT user_id, min(ts) AS s, min(ts) + INTERVAL 6 HOUR AS e
          FROM events GROUP BY user_id) iv
      ON e.user_id = iv.user_id AND e.ts >= iv.s AND e.ts < iv.e
    GROUP BY e.user_id
    UNION ALL
    SELECT 'asof_stream', j.event_id, j.val FROM (
      SELECT t.event_id,
             round(CASE WHEN q.ts >= t.ts - INTERVAL 6 HOUR
                   THEN q.value END, 6) AS val
      FROM (SELECT * FROM events WHERE event_type = 'purchase') t
      ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') q
        ON t.user_id = q.user_id AND q.ts <= t.ts) j
    WHERE j.val IS NOT NULL
    """,
)
def asof_range_join(spark, sf_dir):
    """Temporal joins (operators/temporal.py + streaming/stream_table.py)
    vs DuckDB's NATIVE ASOF LEFT JOIN / inequality join — four arms:

    - asof: for each purchase, the most recent same-user click value
      (union + single-shuffle window carry, no join node);
    - asof_tol: same with a 1-hour tolerance (older matches → NULL);
    - range: events counted into per-user [first_ts, first_ts + 6h)
      intervals via the bucketized range join (equi-join on
      (user, hour-bucket) + exact refinement — never a nested loop);
    - asof_stream: the STREAM-STREAM as-of enrichment
      (stream_table.asof_join_streams: watermarked interval join chained
      with a watermarked max_by aggregation, both state stores evictable
      via the bounded 6-hour lookback) run for real through writeStream
      availableNow over staged event files, with far-future sentinel rows
      on both streams to push the final watermark past all real data —
      inner semantics, verified against the same DuckDB ASOF oracle with
      the tolerance as an inner filter.
    """
    e = _t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )

    def asof_arm(op: str, tolerance: str | None):
        return temporal.asof_join(
            purchases,
            clicks,
            key="user_id",
            left_time="ts",
            right_time="ts",
            value_cols=["value"],
            tolerance=tolerance,
        ).select(
            F.lit(op).alias("op"),
            F.col("event_id").alias("k"),
            F.round("value_right", 6).alias("val"),
        )

    iv = e.groupBy("user_id").agg(F.min("ts").alias("s")).select(
        "user_id", "s", (F.col("s") + F.expr("INTERVAL 6 HOURS")).alias("e")
    )
    pts = e.select("user_id", "ts")
    rng = (
        temporal.interval_range_join(
            pts, iv, point_time="ts", start_col="s", end_col="e",
            key="user_id", bucket="1 hour",
        )
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("double").alias("val"))
        .select(F.lit("range").alias("op"), F.col("user_id").alias("k"), "val")
    )
    streamed = _asof_stream_arm(spark, purchases, clicks)
    return (
        asof_arm("asof", None)
        .unionAll(asof_arm("asof_tol", "1 HOUR"))
        .unionAll(rng)
        .unionAll(streamed)
    )


def _asof_stream_arm(spark, purchases, clicks):
    """Run asof_join_streams for real (availableNow over staged files) and
    return the enriched rows as (op='asof_stream', k=event_id, val).
    Far-future sentinel rows (user_id = -1/-2 — matching nothing) on BOTH
    streams push each stream's watermark 60 days past the real data, so
    the chained stateful operators (interval join → max_by agg, append
    mode) emit every real group before the availableNow query drains."""
    import tempfile
    from datetime import timedelta

    from cnosdb_spark.streaming import stream_table

    base = tempfile.mkdtemp(prefix="asof_stream_row_")
    t_path, q_path, out = f"{base}/trades", f"{base}/quotes", f"{base}/out"
    max_ts = purchases.unionByName(
        clicks.select(F.col("ts")), allowMissingColumns=True
    ).agg(F.max("ts")).first()[0]
    far = max_ts + timedelta(days=60)

    left = purchases.select("event_id", "user_id", F.col("ts").alias("p_ts"))
    left.unionByName(
        spark.createDataFrame([(-1, -1, far)], schema=left.schema)
    ).write.parquet(t_path)
    right = clicks.select("user_id", F.col("ts").alias("c_ts"), "value")
    right.unionByName(
        spark.createDataFrame([(-2, far, 0.0)], schema=right.schema)
    ).write.parquet(q_path)

    t_s = spark.readStream.schema(left.schema).parquet(t_path)
    q_s = spark.readStream.schema(right.schema).parquet(q_path)
    enriched = stream_table.asof_join_streams(
        t_s, q_s, key="user_id", left_time="p_ts", right_time="c_ts",
        left_id="event_id", value_cols=["value"], lookback="6 hours",
    )
    # state partitions sized from the staged input (_stream_scope): the
    # interval join + max_by agg otherwise pay one state store per
    # SHUFFLE partition per micro-batch — measured 2.2× at sf0.1
    with _stream_scope(spark, t_path, q_path):
        q = (
            enriched.writeStream.option("checkpointLocation", f"{base}/ck")
            .trigger(availableNow=True)
            .format("parquet")
            .start(out)
        )
    _await_stream(q, 300)
    return spark.read.parquet(out).select(
        F.lit("asof_stream").alias("op"),
        F.col("event_id").alias("k"),
        F.round("value_right", 6).alias("val"),
    )


_STRAT_FRACS = {"src0": 0.25, "src1": 1.0, "src2": 0.5, "src3": 0.75}
_STRAT_CASE = " ".join(
    f"WHEN '{k}' THEN {v}" for k, v in _STRAT_FRACS.items()
)


@_q(
    "scoring_sampling",
    f"""
    WITH doc_terms AS (
        SELECT doc_id AS _doc, term, CAST(count(*) AS BIGINT) AS tf
        FROM (SELECT doc_id, unnest({_TOKS_SQL}) AS term
              FROM documents WHERE trim(text) <> '')
        GROUP BY doc_id, term),
    df_t AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM doc_terms GROUP BY term),
    n AS (SELECT CAST(count(*) AS BIGINT) AS _n FROM documents),
    ranked AS (
        SELECT _doc, doc_terms.term, tf * (ln((1 + _n) / (1 + df)) + 1) AS tfidf,
               row_number() OVER (PARTITION BY _doc
                                  ORDER BY tf * (ln((1 + _n) / (1 + df)) + 1) DESC,
                                           doc_terms.term ASC) AS rank
        FROM doc_terms JOIN df_t ON doc_terms.term = df_t.term CROSS JOIN n)
    SELECT 'tfidf' AS op, _doc AS k, term AS s, round(tfidf, 6) AS val
    FROM ranked WHERE rank <= 2
    UNION ALL
    SELECT 'strat', doc_id, source, CAST(n_chars AS DOUBLE)
    FROM documents
    WHERE (('0x' || substring(md5('strat|' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
           / 4294967296.0)
          < CASE source {_STRAT_CASE} ELSE 0.0 END
    UNION ALL
    SELECT 'bm25', _doc, '', round(bm25, 6) FROM (
      WITH qt AS (SELECT * FROM doc_terms WHERE term IN ('the', 'data', 'time')),
      lens AS (
        SELECT doc_id AS _doc,
               CAST(CASE WHEN trim(text) = '' THEN 0
                         ELSE len({_TOKS_SQL}) END AS DOUBLE) AS dl
        FROM documents),
      nn AS (SELECT CAST(count(*) AS BIGINT) AS _n FROM documents),
      avgdl AS (SELECT avg(dl) AS _avgdl FROM lens),
      dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM qt GROUP BY term),
      scored AS (
        SELECT qt._doc,
               ln(1 + (_n - df + 0.5) / (df + 0.5))
                 * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / _avgdl)) AS _s
        FROM qt JOIN dfq ON qt.term = dfq.term
                JOIN lens ON qt._doc = lens._doc
        CROSS JOIN nn CROSS JOIN avgdl)
      SELECT _doc, sum(_s) AS bm25 FROM scored GROUP BY _doc)
    UNION ALL
    SELECT op, doc_id, '', val FROM (
      WITH counts AS (SELECT term, CAST(sum(tf) AS BIGINT) AS cw
                      FROM doc_terms GROUP BY term),
      tot AS (SELECT CAST(sum(cw) AS BIGINT) AS _t,
                     CAST(count(*) AS BIGINT) AS _v FROM counts),
      lm_scored AS (
        SELECT _doc, tf, tf * log10((cw + 0.5) / (_t + 0.5 * _v)) AS _lp
        FROM doc_terms JOIN counts ON doc_terms.term = counts.term CROSS JOIN tot),
      per_doc AS (
        SELECT _doc, CAST(sum(tf) AS BIGINT) AS n_tokens, sum(_lp) AS _lp_sum
        FROM lm_scored GROUP BY _doc)
      SELECT 'lm_ntok' AS op, d.doc_id,
             CAST(coalesce(p.n_tokens, 0) AS DOUBLE) AS val
      FROM documents d LEFT JOIN per_doc p ON d.doc_id = p._doc
      UNION ALL
      SELECT 'lm_lp', d.doc_id, round(p._lp_sum / p.n_tokens, 6)
      FROM documents d LEFT JOIN per_doc p ON d.doc_id = p._doc)
    UNION ALL
    SELECT 'mix', doc_id, source, CAST(n_chars AS DOUBLE) FROM (
      WITH st AS (SELECT source, CAST(sum(n_chars) AS DOUBLE) AS stoks
                  FROM documents GROUP BY source),
      rt AS (SELECT source,
                    least(1.0, (CASE source WHEN 'src0' THEN 0.2
                                            WHEN 'src1' THEN 0.2
                                            WHEN 'src3' THEN 0.6
                                            ELSE 0.0 END) * 15000 / stoks) AS rate
             FROM st WHERE stoks > 0)
      SELECT d.doc_id, d.source, d.n_chars
      FROM documents d JOIN rt ON d.source = rt.source
      WHERE (('0x' || substring(md5('mix|' || CAST(d.doc_id AS VARCHAR)), 1, 8))::UBIGINT
             / 4294967296.0) < rate)
    UNION ALL
    SELECT 'pack', doc_id, s, CAST(seq_start AS DOUBLE) FROM (
      WITH p AS (
        SELECT doc_id, n_chars,
               md5('pack|' || CAST(doc_id AS VARCHAR)) AS h,
               (('0x' || substring(md5('pack|' || CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
                % 8) AS shard
        FROM documents WHERE n_chars > 0),
      q AS (
        SELECT doc_id, shard, n_chars,
               coalesce(sum(n_chars) OVER (PARTITION BY shard ORDER BY h, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS seq_start
        FROM p)
      SELECT doc_id,
             shard || ':' || CAST(seq_start // 2048 AS VARCHAR) || ':'
                   || CAST((seq_start + n_chars - 1) // 2048 AS VARCHAR) AS s,
             seq_start
      FROM q)
    UNION ALL
    SELECT 'split', doc_id,
           CASE WHEN (('0x' || substring(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
                      / 4294967296.0) < 0.8 THEN 'train'
                WHEN (('0x' || substring(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
                      / 4294967296.0) < 0.9 THEN 'val'
                ELSE 'test' END,
           CAST(n_chars AS DOUBLE)
    FROM documents
    UNION ALL
    SELECT 'cap', doc_id, source, CAST(n_chars AS DOUBLE) FROM (
      SELECT doc_id, source, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id ASC) AS rk
      FROM documents) WHERE rk <= 5
    UNION ALL
    SELECT 'chunk', doc_id, s, CAST(slice_len AS DOUBLE) FROM (
      WITH p AS (
        SELECT doc_id, n_chars,
               md5('pack|' || CAST(doc_id AS VARCHAR)) AS h,
               (('0x' || substring(md5('pack|' || CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
                % 8) AS shard
        FROM documents WHERE n_chars > 0),
      q AS (
        SELECT doc_id, shard, n_chars,
               coalesce(sum(n_chars) OVER (PARTITION BY shard ORDER BY h, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS seq_start
        FROM p),
      b AS (
        SELECT doc_id, shard, n_chars, seq_start,
               unnest(generate_series(CAST(seq_start // 2048 AS BIGINT),
                                      CAST((seq_start + n_chars - 1) // 2048 AS BIGINT))) AS bin
        FROM q)
      SELECT doc_id,
             shard || ':' || CAST(bin AS VARCHAR) || ':'
                   || CAST(greatest(bin * 2048 - seq_start, 0) AS VARCHAR) AS s,
             least((bin + 1) * 2048 - seq_start, n_chars)
               - greatest(bin * 2048 - seq_start, 0) AS slice_len
      FROM b)
    """,
)
def scoring_sampling(spark, sf_dir):
    """Corpus scoring + deterministic sampling (operators/scoring.py,
    operators/curation.py) — four arms, one row:

    - tfidf: top-2 characteristic terms per document by smoothed TF-IDF
      (one (doc,term) shuffle; doc-count scalar broadcast);
    - strat: stratified-sample keep-set — md5 id-hash fraction below the
      per-source rate; identical arithmetic runs in the DuckDB oracle, so
      the keep/drop decisions must match row-for-row (re-shard-stable by
      construction);
    - bm25 (round-9 graduation from pytest-only): BM25 relevance of every
      doc against the fixed query bag ('the','data','time') — the
      Robertson idf and the per-term saturation replay term-for-term in
      the oracle, same expression shapes;
    - lm_ntok / lm_lp (round-9): self-trained add-0.5 unigram LM token
      count and mean log10-probability per doc (scoring.py
      unigram_lm_scores); empty docs carry NULL lm_lp on both sides;
    - mix (round-10): mixture_sample data-mixing keep-set — per-stratum
      rate = min(1, weight-share-of-budget / stratum tokens), keep iff
      md5 id-hash fraction below it; weights name 3 of 20 sources and
      src3's allocation exceeds its size so the rate-cap-at-1 branch is
      ACTIVE; the oracle re-derives rates and keep decisions in SQL;
    - pack (round-10): pack_sequences concat-then-chunk packing —
      deterministic (shard, md5-hash, id) layout, per-shard running
      token offset, bin ids from one windowed cumsum; the oracle replays
      the exact window in SQL (s carries shard:first_bin:last_bin, val
      the shard-local token offset);
    - split / cap / chunk (round-10): split_dataset's deterministic
      train/val/test id-hash assignment, cap_per_stratum's top-k-per-
      domain window cap, and pack_chunks' per-(doc,bin) slice manifest
      (slice offsets + lengths from the same packing window, exploded
      per occupied bin) — all replayed in SQL.
    """
    d = _t(spark, sf_dir, "documents")
    tfidf = scoring.tf_idf_topk_terms(d, k=2).select(
        F.lit("tfidf").alias("op"),
        F.col("doc_id").alias("k"),
        F.col("term").alias("s"),
        F.col("tfidf").alias("val"),
    )
    strat = curation.stratified_sample(d, "source", _STRAT_FRACS, salt="strat").select(
        F.lit("strat").alias("op"),
        F.col("doc_id").alias("k"),
        F.col("source").alias("s"),
        F.col("n_chars").cast("double").alias("val"),
    )
    bm25 = scoring.bm25_scores(d, ["the", "data", "time"]).select(
        F.lit("bm25").alias("op"),
        F.col("doc_id").alias("k"),
        F.lit("").alias("s"),
        F.col("bm25").alias("val"),
    )
    lm = scoring.unigram_lm_scores(d, add_k=0.5)
    lm_ntok = lm.select(
        F.lit("lm_ntok").alias("op"),
        F.col("doc_id").alias("k"),
        F.lit("").alias("s"),
        F.col("n_tokens").cast("double").alias("val"),
    )
    lm_lp = lm.select(
        F.lit("lm_lp").alias("op"),
        F.col("doc_id").alias("k"),
        F.lit("").alias("s"),
        F.col("lm_logprob").alias("val"),
    )
    mix = curation.mixture_sample(
        d,
        "source",
        {"src0": 0.2, "src1": 0.2, "src3": 0.6},
        budget_tokens=15000,
        token_col="n_chars",
        salt="mix",
    ).select(
        F.lit("mix").alias("op"),
        F.col("doc_id").alias("k"),
        F.col("source").alias("s"),
        F.col("n_chars").cast("double").alias("val"),
    )
    pack = curation.pack_sequences(
        d, "n_chars", capacity=2048, shards=8, salt="pack"
    ).select(
        F.lit("pack").alias("op"),
        F.col("doc_id").alias("k"),
        F.concat_ws(
            ":", F.col("shard"), F.col("first_bin"), F.col("last_bin")
        ).alias("s"),
        F.col("seq_start").cast("double").alias("val"),
    )
    split = curation.split_dataset(
        d, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}, salt="split"
    ).select(
        F.lit("split").alias("op"),
        F.col("doc_id").alias("k"),
        F.col("split").alias("s"),
        F.col("n_chars").cast("double").alias("val"),
    )
    cap = curation.cap_per_stratum(d, "source", "n_chars", k=5).select(
        F.lit("cap").alias("op"),
        F.col("doc_id").alias("k"),
        F.col("source").alias("s"),
        F.col("n_chars").cast("double").alias("val"),
    )
    chunk = curation.pack_chunks(
        d, "n_chars", capacity=2048, shards=8, salt="pack"
    ).select(
        F.lit("chunk").alias("op"),
        F.col("doc_id").alias("k"),
        F.concat_ws(":", F.col("shard"), F.col("bin"), F.col("slice_start"))
        .alias("s"),
        F.col("slice_len").cast("double").alias("val"),
    )
    return (
        tfidf.unionAll(strat).unionAll(bm25).unionAll(lm_ntok).unionAll(lm_lp)
        .unionAll(mix).unionAll(pack).unionAll(split).unionAll(cap)
        .unionAll(chunk)
    )


# =====================================================================
# Pandas-UDF operators (non-SQL-expressible → rows-only checks)
# =====================================================================

@_q(
    "data_quality_scores",
    """
    WITH p AS (SELECT user_id, epoch_us(ts) / 1000000000.0 AS t, value AS v
               FROM events),
    d AS (SELECT user_id,
                 t - lag(t) OVER (PARTITION BY user_id ORDER BY t) AS dt
          FROM p),
    stats AS (SELECT user_id,
                quantile_cont(CASE WHEN dt > 0 THEN dt END, 0.5) AS med_dt,
                avg(dt) AS mean_dt, stddev_pop(dt) AS std_dt,
                sum(CASE WHEN dt = 0 THEN 1 ELSE 0 END) AS redundancy
              FROM d GROUP BY user_id),
    cnts AS (SELECT user_id, count(*) AS cnt FROM p GROUP BY user_id),
    miss AS (SELECT d.user_id,
               sum(CASE WHEN s.med_dt > 0 AND d.dt > s.mean_dt + 3 * s.std_dt
                        THEN greatest(CAST(round(d.dt / s.med_dt) AS BIGINT) - 1, 0)
                        ELSE 0 END) AS missing,
               sum(CASE WHEN s.med_dt > 0 AND d.dt > 0 AND d.dt < s.med_dt / 2
                        THEN 1 ELSE 0 END) AS late
             FROM d JOIN stats s USING (user_id)
             WHERE d.dt IS NOT NULL GROUP BY d.user_id),
    vmed AS (SELECT user_id, quantile_cont(v, 0.5) AS med_v
             FROM p GROUP BY user_id),
    vmad AS (SELECT p.user_id, quantile_cont(abs(p.v - m.med_v), 0.5) AS mad,
                    min(m.med_v) AS med_v
             FROM p JOIN vmed m USING (user_id) GROUP BY p.user_id),
    inval AS (SELECT p.user_id,
                sum(CASE WHEN 1.4826 * vm.mad > 0
                         AND abs(p.v - vm.med_v) > 3 * (1.4826 * vm.mad)
                         THEN 1 ELSE 0 END) AS invalid
              FROM p JOIN vmad vm USING (user_id) GROUP BY p.user_id)
    SELECT c.user_id,
           round(1 - m.missing * 1.0 / (c.cnt + m.missing), 6) AS completeness,
           round(1 - s.redundancy * 1.0 / c.cnt, 6) AS consistency,
           round(1 - m.late * 1.0 / c.cnt, 6) AS timeliness,
           round(1 - i.invalid * 1.0 / c.cnt, 6) AS validity
    FROM cnts c JOIN stats s USING (user_id) JOIN miss m USING (user_id)
                JOIN inval i USING (user_id)
    """,
)
def data_quality_scores(spark, sf_dir):
    """IoTDB-style data-quality aggregates (SURVEY §2.4; reference
    aggregate_function/data_quality/) via grouped-map applyInPandas; the
    oracle replays the interval/MAD formulas in SQL (see
    functions/quality.py for the per-metric math)."""
    e = _t(spark, sf_dir, "events")
    out = data_quality(e, "ts", "value", ["user_id"])
    return out.select(
        "user_id",
        F.round("completeness", 6).alias("completeness"),
        F.round("consistency", 6).alias("consistency"),
        F.round("timeliness", 6).alias("timeliness"),
        F.round("validity", 6).alias("validity"),
    )


def _lttb_oracle_values(n_out: int = 16, corpus: str | None = None) -> str | None:
    """Expected LTTB keep-set for the round-9 lttb arm, replayed at import
    in local numpy over the same corpus (the _refine_oracle pattern):
    per-series sort by time, t at ns-scale float64 — exactly what
    applyInPandas's datetime64[ns].astype(int64) feeds the kernel. The
    kernel itself is independently loop-pinned in tests/test_downsample.py,
    so the arm differentially verifies the DISTRIBUTED half (grouping,
    in-group sort, applyInPandas schema/plumbing) against a local
    ground-truth replay. Emits (user_id, ts_us) VALUES — values join back
    to the events table in SQL, keeping the literal small.

    Returns None ONLY when the corpus file is genuinely absent (arm
    disabled on both sides). Any other failure RAISES: a broad
    `except → None` here would silently shrink correctness coverage while
    CORRECTNESS stays all-green (round-9 VERDICT finding #2).

    Ties on (user_id, ts) are collapsed to min(value) BEFORE the replay
    (and the Spark side dedups identically) — otherwise both the ORDER BY
    and the events re-join are ambiguous on tied timestamps."""
    corpus = corpus or os.environ.get(
        "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
    )
    if not os.path.exists(os.path.join(corpus, "events.parquet")):
        return None

    import duckdb
    import numpy as np

    from cnosdb_spark.operators.downsample import _lttb_numpy

    con = duckdb.connect()
    rows = con.execute(
        "SELECT user_id, epoch_us(ts) AS t, min(value) "
        f"FROM '{corpus}/events.parquet' "
        "GROUP BY user_id, epoch_us(ts) ORDER BY user_id, t"
    ).fetchall()
    con.close()
    by_user: dict = {}
    for uid, t_us, v in rows:
        by_user.setdefault(uid, ([], []))
        by_user[uid][0].append(t_us)
        by_user[uid][1].append(v)
    vals = []
    for uid, (ts_us, vs) in sorted(by_user.items()):
        t = (np.array(ts_us, dtype=np.int64) * 1000).astype(np.float64)
        v = np.array(
            [float("nan") if x is None else x for x in vs], dtype=np.float64
        )
        for i in _lttb_numpy(t, v, n_out):
            vals.append(f"({uid}, {ts_us[i]})")
    return ",\n      ".join(vals)


_LTTB_N_OUT = 16
_LTTB_CORPUS = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
_LTTB_ORACLE = _lttb_oracle_values(_LTTB_N_OUT, _LTTB_CORPUS)


@_q(
    "ts_value_fill_repair",
    """
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS t,
             CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v
      FROM events),
    w AS (
      SELECT user_id, t, v,
             last_value(v IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY t
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             first_value(v IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY t
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             last_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY t
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
             first_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY t
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
      FROM e)
    SELECT 'fill' AS op, user_id, t AS ts_us,
           CAST(floor(CASE WHEN v IS NOT NULL THEN v
                           WHEN pv IS NULL THEN nv
                           WHEN nv IS NULL THEN pv
                           ELSE pv + (nv - pv) / (nt - pt) * (t - pt) END
                      * 1000000 + 0.5) AS BIGINT) AS value_e6
    FROM w
    UNION ALL
    SELECT 'repair', user_id, ts_us, value_e6 FROM (
    WITH RECURSIVE pts AS (
      SELECT user_id, epoch_us(ts) AS t, value AS v,
             row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
      FROM events),
    sp AS (
      SELECT user_id,
             (v - lag(v) OVER (PARTITION BY user_id ORDER BY rn))
             / (t / 1000000.0 - lag(t) OVER (PARTITION BY user_id ORDER BY rn)
                / 1000000.0) AS speed
      FROM pts),
    med AS (SELECT user_id, quantile_cont(speed, 0.5) AS med
            FROM sp WHERE speed IS NOT NULL GROUP BY user_id),
    bounds AS (
      SELECT sp.user_id,
             min(med.med) - 3 * (1.4826 * quantile_cont(abs(sp.speed - med.med), 0.5))
               AS smin,
             min(med.med) + 3 * (1.4826 * quantile_cont(abs(sp.speed - med.med), 0.5))
               AS smax
      FROM sp JOIN med USING (user_id) WHERE sp.speed IS NOT NULL
      GROUP BY sp.user_id),
    rec AS (
      SELECT user_id, rn, t, v AS outv FROM pts WHERE rn = 1
      UNION ALL
      SELECT q.user_id, q.rn, q.t,
             CASE WHEN q.v < r.outv + b.smin * (q.t / 1000000.0 - r.t / 1000000.0)
                  THEN r.outv + b.smin * (q.t / 1000000.0 - r.t / 1000000.0)
                  WHEN q.v > r.outv + b.smax * (q.t / 1000000.0 - r.t / 1000000.0)
                  THEN r.outv + b.smax * (q.t / 1000000.0 - r.t / 1000000.0)
                  ELSE q.v END
      FROM rec r
      JOIN pts q ON q.user_id = r.user_id AND q.rn = r.rn + 1
      JOIN bounds b ON b.user_id = q.user_id)
    SELECT user_id, t AS ts_us,
           CAST(floor(outv * 1000000 + 0.5) AS BIGINT) AS value_e6
    FROM rec)
    UNION ALL
    SELECT 'ewma', user_id, ts_us, value_e6 FROM (
    WITH RECURSIVE p AS (
      SELECT user_id, epoch_us(ts) AS t, value AS v,
             row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
      FROM events),
    rec AS (
      SELECT user_id, rn, t, v AS s FROM p WHERE rn = 1
      UNION ALL
      SELECT q.user_id, q.rn, q.t, 0.3 * q.v + 0.7 * r.s
      FROM rec r JOIN p q ON q.user_id = r.user_id AND q.rn = r.rn + 1)
    SELECT user_id, t AS ts_us,
           CAST(floor(s * 1000000 + 0.5) AS BIGINT) AS value_e6
    FROM rec)
    UNION ALL
    SELECT 'tsrepair', user_id, ts_us, value_e6 FROM (
    WITH p AS (
      SELECT user_id, epoch_us(ts) AS t, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn,
             count(*)     OVER (PARTITION BY user_id) AS cnt,
             min(epoch_us(ts)) OVER (PARTITION BY user_id) AS start
      FROM events),
    d AS (SELECT user_id,
                 t - lag(t) OVER (PARTITION BY user_id ORDER BY rn) AS dt
          FROM p),
    iv AS (SELECT user_id, CAST(trunc(quantile_cont(dt, 0.5)) AS BIGINT) AS iv
           FROM d WHERE dt > 0 GROUP BY user_id),
    snap AS (
      SELECT p.user_id, p.rn, p.value,
             CASE WHEN p.cnt < 3 OR iv.iv IS NULL OR iv.iv <= 0 THEN p.t
                  ELSE p.start
                       + CAST(floor((p.t - p.start) / iv.iv + 0.5) AS BIGINT) * iv.iv
             END AS nt
      FROM p LEFT JOIN iv USING (user_id))
    SELECT user_id, nt AS ts_us,
           CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS value_e6
    FROM (SELECT *, row_number() OVER (PARTITION BY user_id, nt ORDER BY rn) AS r2
          FROM snap)
    WHERE r2 = 1)
    """
    + (
        f"""
    UNION ALL
    SELECT 'lttb', k.user_id, k.ts_us,
           CAST(floor(e.value * 1000000 + 0.5) AS BIGINT) AS value_e6
    FROM (VALUES
      {_LTTB_ORACLE}) AS k(user_id, ts_us)
    JOIN (SELECT user_id, epoch_us(ts) AS ts_us, min(value) AS value
          FROM events GROUP BY 1, 2) e
      ON e.user_id = k.user_id AND e.ts_us = k.ts_us
    """
        if _LTTB_ORACLE
        else ""
    ),
)
def ts_value_fill_repair(spark, sf_dir):
    """Per-series sequential value transforms (SURVEY §2.6 ts_gen_func
    family + the downsample module) — three arms, one row:

    - fill: NaNs injected deterministically then linearly interpolated per
      series (reference ts_gen_func/data_repair/value_fill.rs; np.interp
      slope-first float order + edge clamping — the oracle mirrors both);
    - repair: clamp each point's rate-of-change to the series' MAD-based
      speed bounds, sequentially against the already-repaired previous
      point (value_repair.rs; the oracle replays the recurrence as a
      recursive CTE, one iteration per series row index);
    - ewma: operators/downsample.py exponential smoothing
      (s_i = 0.3*x_i + 0.7*s_{i-1}, seeded with the first value) — pandas
      ewm(adjust=False) is bit-exact with the literal recursion, so the
      same recursive-CTE oracle pattern verifies it;
    - tsrepair (round-7 fold of the former ts_timestamp_repair row):
      ts_gen_func timestamp_repair (reference ts_gen_func/data_repair/
      timestamp_repair.rs) — snap per-series timestamps to the modal
      (median) interval from the series start, keep-first on collisions;
    - lttb (round-9 graduation from pytest-only): Largest-Triangle-Three-
      Buckets downsample to 16 points per series
      (operators/downsample.py lttb) — the oracle replays the keep-set
      locally at import (_lttb_oracle_values) and re-joins values in SQL.
    """
    # Round-11 fusion (guide §4.1/§4.2 + §2.4): all five arms are
    # per-series sequential kernels keyed on user_id. They used to run as
    # FIVE separate grouped-map applyInPandas pipelines — five events
    # scans, five hash shuffles, five Python crossings, 5×1500
    # per-group pandas invocations at sf0.1 — unioned after the fact.
    # One multi-series mapInArrow kernel now computes every arm for every
    # series of a partition in one call: one scan, one hash exchange on
    # user_id + in-partition (user_id, ts) sort, ~one Python call per
    # TASK (manual series boundaries via numpy split — the guide §4.2
    # batching shape), versus 7500 per-group slices before. The
    # per-series numpy math is the IDENTICAL module-level kernel each
    # standalone operator uses (repair.fix_value_fill / fix_value_repair
    # / fix_timestamp_repair, downsample._lttb_numpy, pandas
    # ewm(adjust=False)), so the floats are bit-for-bit the old
    # pipeline's; only the plan shape changed.
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    from pyspark.sql import types as T

    from cnosdb_spark.functions.repair import (
        fix_timestamp_repair,
        fix_value_fill,
        fix_value_repair,
    )
    from cnosdb_spark.operators.downsample import _lttb_numpy

    e = _t(spark, sf_dir, "events")
    include_lttb = bool(_LTTB_ORACLE)
    if include_lttb and os.path.realpath(sf_dir) != os.path.realpath(_LTTB_CORPUS):
        # the keep-set literal was replayed at import against
        # _LTTB_CORPUS; joining it against a different corpus would
        # report spurious mismatches. Fail loudly instead.
        raise RuntimeError(
            f"lttb arm oracle replayed against {_LTTB_CORPUS} at import "
            f"but query called with sf_dir={sf_dir}; set "
            "SPARK_GRAFT_ORACLE_SF_DIR to match or disable the arm"
        )
    lttb_n_out = _LTTB_N_OUT

    proj = e.select(
        "user_id",
        F.unix_micros("ts").alias("_ts_us"),
        "value",
        # the fill arm's deterministic NaN injection, projected JVM-side
        F.when(F.col("event_id") % 7 == 0, None)
        .otherwise(F.col("value"))
        .alias("_vfill"),
    )
    uid_type = proj.schema["user_id"].dataType
    out_schema = T.StructType(
        [
            T.StructField("op", T.StringType()),
            T.StructField("user_id", uid_type),
            T.StructField("ts_us", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )

    def _all_arms(batches):
        # the partition arrives hash-clustered on user_id and sorted by
        # (user_id, ts): concatenate its batches (one partition is a
        # bounded slice of series), then numpy-split on series boundaries
        tbl = pa.Table.from_batches(list(batches))
        if tbl.num_rows == 0:
            return
        uids = tbl.column("user_id").to_numpy(zero_copy_only=False)
        all_ts = tbl.column("_ts_us").to_numpy(zero_copy_only=False).astype("int64")
        all_v = tbl.column("value").to_numpy(zero_copy_only=False).astype("float64")
        all_vf = tbl.column("_vfill").to_numpy(zero_copy_only=False).astype("float64")
        bounds = np.flatnonzero(
            np.concatenate(([True], uids[1:] != uids[:-1]))
        ).tolist() + [len(uids)]
        ops: list[np.ndarray] = []
        ouid: list[np.ndarray] = []
        otss: list[np.ndarray] = []
        ovss: list[np.ndarray] = []

        for si in range(len(bounds) - 1):
            lo, hi = bounds[si], bounds[si + 1]
            uid = uids[lo]
            ts, vals, vfill = all_ts[lo:hi], all_v[lo:hi], all_vf[lo:hi]

            def emit(op: str, t_arr, v_arr):
                t_arr = np.asarray(t_arr, dtype="int64")
                ops.append(np.full(len(t_arr), op, dtype=object))
                ouid.append(np.full(len(t_arr), uid))
                otss.append(t_arr)
                ovss.append(np.asarray(v_arr, dtype="float64"))

            ft, fv = fix_value_fill(ts, vfill, "linear")
            emit("fill", ft, fv)
            rt, rv = fix_value_repair(ts, vals)
            emit("repair", rt, rv)
            # ewma: pandas ewm(adjust=False) — downsample.ewma's kernel
            emit("ewma", ts, pd.Series(vals).ewm(alpha=0.3, adjust=False).mean())
            tt, tv = fix_timestamp_repair(ts, vals)
            emit("tsrepair", tt, tv)
            if include_lttb:
                # same (user_id, ts) tie collapse as the oracle replay
                # (rows are ts-sorted: segment mins via reduceat), then
                # the lttb kernel over ns floats exactly as
                # downsample.lttb (datetime64[ns].astype(int64) → ns;
                # float64(µs)*1000.0 rounds to the identical float64)
                starts = np.flatnonzero(
                    np.concatenate(([True], ts[1:] != ts[:-1]))
                )
                ut = ts[starts]
                uv = np.minimum.reduceat(vals, starts)
                idx = _lttb_numpy(ut.astype("float64") * 1000.0, uv, lttb_n_out)
                emit("lttb", ut[idx], uv[idx])

        yield pa.RecordBatch.from_arrays(
            [
                pa.array(np.concatenate(ops), type=pa.string()),
                pa.array(np.concatenate(ouid), type=pa.int64()),
                pa.array(np.concatenate(otss), type=pa.int64()),
                pa.array(np.concatenate(ovss), type=pa.float64()),
            ],
            names=["op", "user_id", "ts_us", "value"],
        )

    fused = (
        proj.repartition("user_id")
        .sortWithinPartitions("user_id", "_ts_us")
        .mapInArrow(_all_arms, out_schema)
    )
    return fused.select(
        "op",
        "user_id",
        "ts_us",
        F.floor(F.col("value") * 1000000 + 0.5).cast("long").alias("value_e6"),
    )


@_q(
    "pipeline_curation",
    f"""
    WITH stats AS (
      SELECT doc_id, text,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE len(string_split_regex(trim(text), '\\s+')) END AS nt,
             length(text) - length(regexp_replace(text, '[!-/:-@\\[-`{{-~]', '', 'g'))
               AS n_punct
      FROM documents),
    filtered AS (
      SELECT doc_id, text, nt FROM stats
      WHERE nt > 0
        AND length(regexp_replace(text, '\\s+', '', 'g')) * 1.0 / nt >= 3
        AND CASE WHEN length(text) > 0 THEN n_punct * 1.0 / length(text) ELSE 0 END < 0.1),
    winners AS (
      SELECT min(doc_id) AS doc_id FROM filtered
      GROUP BY md5({_NORM_SQL})),
    kept AS (
      SELECT f.doc_id, f.nt FROM filtered f JOIN winners w ON w.doc_id = f.doc_id),
    shards AS (
      SELECT doc_id, nt,
             CAST(('0x' || substr(md5('export|' || CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
                  % 8 AS BIGINT) AS shard
      FROM kept),
    exp AS (
      SELECT shard, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|'
                       || CAST(nt AS VARCHAR)), 1, 8))::BIGINT) AS BIGINT) AS h
      FROM shards GROUP BY shard)
    SELECT * FROM (
      SELECT 'curate' AS op, doc_id AS k, CAST(nt AS BIGINT) AS v1,
             CAST(NULL AS BIGINT) AS v2
      FROM kept ORDER BY md5(CAST(doc_id AS VARCHAR)) LIMIT 100)
    UNION ALL SELECT 'export', shard, n, h FROM exp
    UNION ALL SELECT 'export_verify', shard, 1, n FROM exp
    UNION ALL
    SELECT 'qmodel', doc_id, 1, CAST(NULL AS BIGINT)
    FROM documents
    WHERE doc_id % 2 = 1 AND regexp_matches(text, '[a-z]')
    UNION ALL
    SELECT 'decon', k, v1, v2 FROM (
      WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS tk FROM documents),
      sh AS (SELECT doc_id, unnest(list_distinct(
               CASE WHEN len(tk) < 8 THEN [array_to_string(tk, ' ')]
                    ELSE [array_to_string(tk[i+1:i+8], ' ')
                          FOR i IN generate_series(0, len(tk)-8)] END)) AS g
             FROM toks),
      bench AS (SELECT DISTINCT g FROM sh WHERE doc_id % 53 = 0),
      m AS (SELECT sh.doc_id, CAST(count(*) AS BIGINT) AS mn
            FROM sh JOIN bench USING (g) GROUP BY sh.doc_id)
      SELECT doc_id AS k, mn AS v1, CAST(1 AS BIGINT) AS v2 FROM m
      UNION ALL
      SELECT -1, (SELECT count(*) FROM documents) - (SELECT count(*) FROM m),
             0)
    UNION ALL
    SELECT 'bp', doc_id, v1, v2 FROM (
      WITH src AS (
        SELECT doc_id,
               text || chr(10) || chr(10) || 'Shared Footer Alpha 2024.'
                    || CASE WHEN doc_id % 3 = 0
                            THEN chr(10) || chr(10)
                                 || 'Shared footer beta terms apply.'
                            ELSE '' END AS t
        FROM documents),
      pl AS (SELECT doc_id,
                    list_filter(list_transform(string_split_regex(t, '\\n{{2,}}'),
                                               x -> trim(x)),
                                x -> x <> '') AS parts
             FROM src),
      ph AS (SELECT doc_id,
                    unnest(list_transform(parts,
                      p -> md5(trim(regexp_replace(lower(p), '\\s+', ' ', 'g'))))) AS h
             FROM pl),
      bpset AS (SELECT h FROM ph GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
      bl AS (SELECT coalesce(list(h), []) AS hs FROM bpset),
      kept AS (
        SELECT doc_id,
               list_filter(parts,
                 p -> NOT list_contains(hs,
                        md5(trim(regexp_replace(lower(p), '\\s+', ' ', 'g'))))) AS keeps,
               len(parts) AS ntot
        FROM pl CROSS JOIN bl)
      SELECT doc_id,
             CAST(len(keeps) * 1000 + ntot AS BIGINT) AS v1,
             ('0x' || substr(md5(coalesce(array_to_string(keeps, chr(10) || chr(10)), '')), 1, 8))::BIGINT AS v2
      FROM kept)
    UNION ALL
    SELECT 'rep', doc_id, v1, v2 FROM (
      WITH rsrc AS (
        SELECT doc_id,
               text || chr(10) || substr(text, 1, 50)
                    || CASE WHEN doc_id % 2 = 0
                            THEN chr(10) || substr(text, 1, 50) ELSE '' END
                    || CASE WHEN doc_id % 5 = 0
                            THEN chr(10) || chr(10) || substr(text, 1, 80)
                                 || chr(10) || chr(10) || substr(text, 1, 80)
                            ELSE '' END AS rt
        FROM documents),
      seg AS (
        SELECT doc_id,
               list_filter(list_transform(string_split_regex(rt, '\\n'),
                                          x -> trim(x)), x -> x <> '') AS ls,
               list_filter(list_transform(string_split_regex(rt, '\\n{{2,}}'),
                                          x -> trim(x)), x -> x <> '') AS ps
        FROM rsrc),
      fr AS (
        SELECT doc_id,
          CASE WHEN len(ls) > 0
               THEN (len(ls) - len(list_distinct(ls))) * 1.0 / len(ls)
               ELSE 0.0 END AS dlf,
          CASE WHEN list_sum(list_transform(ls, x -> length(x))) > 0
               THEN (list_sum(list_transform(ls, x -> length(x)))
                     - list_sum(list_transform(list_distinct(ls), x -> length(x))))
                    * 1.0 / list_sum(list_transform(ls, x -> length(x)))
               ELSE 0.0 END AS dlcf,
          CASE WHEN len(ps) > 0
               THEN (len(ps) - len(list_distinct(ps))) * 1.0 / len(ps)
               ELSE 0.0 END AS dpf,
          CASE WHEN list_sum(list_transform(ps, x -> length(x))) > 0
               THEN (list_sum(list_transform(ps, x -> length(x)))
                     - list_sum(list_transform(list_distinct(ps), x -> length(x))))
                    * 1.0 / list_sum(list_transform(ps, x -> length(x)))
               ELSE 0.0 END AS dpcf
        FROM seg)
      SELECT doc_id,
             CAST(floor(dlf * 1000000 + 0.5) * 10000000
                  + floor(dlcf * 1000000 + 0.5) AS BIGINT) AS v1,
             CAST(floor(dpf * 1000000 + 0.5) * 10000000
                  + floor(dpcf * 1000000 + 0.5) AS BIGINT) AS v2
      FROM fr)
    UNION ALL
    SELECT 'pii', doc_id, v1, v2 FROM (
      WITH psrc AS (
        SELECT doc_id,
               text || CASE WHEN doc_id % 3 = 0
                            THEN ' contact user' || CAST(doc_id AS VARCHAR)
                                 || '@example.com now' ELSE '' END
                    || CASE WHEN doc_id % 4 = 0
                            THEN ' host 10.0.' || CAST(doc_id % 200 AS VARCHAR)
                                 || '.17 up' ELSE '' END
                    || CASE WHEN doc_id % 5 = 0
                            THEN ' call +1 (555) 010-'
                                 || CAST(1000 + doc_id % 9000 AS VARCHAR)
                                 || ' today' ELSE '' END AS pt
        FROM documents),
      r1 AS (SELECT doc_id,
                    CAST(len(regexp_extract_all(pt,
                      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')) AS BIGINT) AS ne,
                    regexp_replace(pt,
                      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}',
                      '<EMAIL>', 'g') AS t1
             FROM psrc),
      r2 AS (SELECT doc_id, ne,
                    CAST(len(regexp_extract_all(t1,
                      '\\b(\\d{{1,3}}\\.){{3}}\\d{{1,3}}\\b')) AS BIGINT) AS ni,
                    regexp_replace(t1, '\\b(\\d{{1,3}}\\.){{3}}\\d{{1,3}}\\b',
                                   '<IP>', 'g') AS t2
             FROM r1),
      r3 AS (SELECT doc_id, ne, ni,
                    CAST(len(regexp_extract_all(t2,
                      '\\+?\\d[\\d\\s().-]{{7,}}\\d\\b')) AS BIGINT) AS np,
                    regexp_replace(t2, '\\+?\\d[\\d\\s().-]{{7,}}\\d\\b',
                                   '<PHONE>', 'g') AS t3
             FROM r2)
      SELECT doc_id, ne * 1000000 + ni * 1000 + np AS v1,
             ('0x' || substr(md5(t3), 1, 8))::BIGINT AS v2
      FROM r3)
    """,
)
def pipeline_curation(spark, sf_dir):
    """Composite training-data curation pipeline: quality filter (mean word
    length + punctuation ratio) → exact-dedup keep-one → deterministic
    hash-sample of 100 docs. The shape a 100 TB curation job takes: each
    stage is a narrow projection/filter or one keyed aggregation.

    Round-8 export arms — the deterministic shuffled shard export
    (operators/curation.py shuffle_export) runs FOR REAL on the curated
    (pre-sample) set, a full writer → reader round-trip:

    - export: per-shard row count + order-insensitive md5-based content
      hash computed from the WRITTEN parquet files read back; the oracle
      re-derives both straight from the source table by replicating the
      md5 shard function in SQL — a lost, duplicated or mis-sharded row
      breaks the hash;
    - export_verify: verify_export's manifest-vs-files check must report
      ok for every shard, and the manifest's per-shard row counts must
      equal the SQL-derived truth.

    Round-9 qmodel arm (graduating the last pytest-only pipeline
    operator): the trainable CCNet-style quality filter
    (quality_model.py — HashingTF + stats features + distributed
    LogisticRegression) trains on the EVEN-doc-id half of the corpus
    against deterministically CORRUPTED twins (every word suffixed
    '9!' — disjoint tokens, degraded stat features), then must rank
    every held-out ODD original ABOVE its own corrupted twin. The L-BFGS
    weights aren't bit-replicable in SQL, so the contract is the paired
    accuracy assertion (the ivf_ann_topk pattern): v1 = 1 per holdout
    doc, and the oracle pins the holdout doc set + the all-ones
    expectation. max_iter=10 since round 11 (was 25): L-BFGS converges
    on this linearly-separable pairing long before 25 passes — measured
    min P(orig) − P(corrupt) = 0.911/0.910/0.881 at sf0.001/0.01/0.1
    with 10 iterations (vs 0.883 at 25 on the largest corpus), the
    declared flags identical, and the training arm's driver wall drops
    ~2.4× (8.7 → 3.6 s). Flips stay structurally remote."""
    import tempfile

    d = _t(spark, sf_dir, "documents")
    stats = text.with_text_stats(d, "text")
    filtered = stats.filter(
        (F.col("n_tokens") > 0)
        & (F.col("mean_word_len") >= 3)
        & (F.col("punct_ratio") < 0.1)
    ).select("doc_id", "text", F.col("n_tokens").alias("nt"))
    winners = dedup.exact_dedup(filtered, "text", "doc_id").select("doc_id")
    kept = filtered.join(winners, "doc_id")

    path = tempfile.mkdtemp(prefix="pipeline_export_") + "/export"
    exp_in = kept.select("doc_id", F.col("nt").cast("long").alias("n_tokens"))
    manifest = curation.shuffle_export(
        exp_in, path, id_col="doc_id", shards=8, salt="export"
    )
    # The export (just written, this invocation, fresh tempdir) holds
    # exactly kept's (doc_id, n_tokens) rows — the curate arm samples
    # from the written files instead of re-running the text-stats kernel
    # + dedup tower a second time. sample_deterministic hashes doc_id,
    # so shard order is immaterial; the arm's rows are identical.
    curate = (
        sample_deterministic(
            spark.read.parquet(path).select(
                "doc_id", F.col("n_tokens").alias("nt")
            ),
            "doc_id",
            100,
        )
        .select(
            F.lit("curate").alias("op"),
            F.col("doc_id").cast("long").alias("k"),
            F.col("nt").cast("long").alias("v1"),
            F.lit(None).cast("long").alias("v2"),
        )
    )
    row_h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("doc_id").cast("string"),
                    F.lit("|"),
                    F.col("n_tokens").cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    export = (
        spark.read.parquet(path)
        .withColumn("_rh", row_h)
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("_rh").alias("h"))
        .select(
            F.lit("export").alias("op"),
            F.col("shard").cast("long").alias("k"),
            F.col("n").alias("v1"),
            F.col("h").alias("v2"),
        )
    )
    verify = curation.verify_export(spark, path).select(
        F.lit("export_verify").alias("op"),
        F.col("shard").cast("long").alias("k"),
        F.col("ok").cast("long").alias("v1"),
        F.col("n_rows").cast("long").alias("v2"),
    )

    from cnosdb_spark.operators import quality_model

    def _corrupt(c):
        return F.regexp_replace(c, r"([a-z]+)", r"$19!")

    base = d.select("doc_id", "text")
    train = base.filter("doc_id % 2 = 0 AND text RLIKE '[a-z]'")
    model = quality_model.train_quality_classifier(
        train.select("text"),
        train.select(_corrupt(F.col("text")).alias("text")),
        num_features=1024,
        max_iter=10,
    )
    # only docs the corruption actually alters: a doc with no [a-z] run
    # gets an identical "corrupted" twin (P(orig)==P(corrupt), v1=0), so
    # the all-ones expectation would depend on corpus content otherwise.
    hold = base.filter("doc_id % 2 = 1 AND text RLIKE '[a-z]'")
    p_orig = quality_model.score_quality(hold, model).select(
        "doc_id", F.col("quality_prob").alias("_po")
    )
    p_corr = quality_model.score_quality(
        hold.select("doc_id", _corrupt(F.col("text")).alias("text")), model
    ).select("doc_id", F.col("quality_prob").alias("_pc"))
    qmodel = p_orig.join(p_corr, "doc_id").select(
        F.lit("qmodel").alias("op"),
        F.col("doc_id").cast("long").alias("k"),
        (F.col("_po") > F.col("_pc")).cast("long").alias("v1"),
        F.lit(None).cast("long").alias("v2"),
    )

    # round-10 arms: the four remaining pytest-only curation staples.
    # decon: 8-gram benchmark decontamination — the "benchmark" is the
    # doc_id%53 slice of the corpus itself, so every benchmark doc
    # self-matches and the broadcast probe join is provably ACTIVE.
    bench = base.filter(F.col("doc_id") % 53 == 0).select("text")
    dec = curation.decontaminate(base, bench, "text", "doc_id", n=8)
    dec_hits = dec.filter("contaminated").select(
        F.lit("decon").alias("op"),
        F.col("doc_id").cast("long").alias("k"),
        F.col("matched_ngrams").cast("long").alias("v1"),
        F.lit(1).cast("long").alias("v2"),
    )
    dec_clean = (
        dec.filter(~F.col("contaminated"))
        .agg(F.count(F.lit(1)).cast("long").alias("v1"))
        .select(
            F.lit("decon").alias("op"),
            F.lit(-1).cast("long").alias("k"),
            "v1",
            F.lit(0).cast("long").alias("v2"),
        )
    )

    # bp: cross-document boilerplate stripping over a corpus with
    # CONSTRUCTED shared footers (the raw corpus has no multi-paragraph
    # docs), so the min_docs>=2 threshold and the position-sorted
    # reassembly are both active; v2 hashes the rebuilt text.
    bp_in = base.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit("\n\nShared Footer Alpha 2024."),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.lit("\n\nShared footer beta terms apply."),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    bpo = curation.strip_boilerplate(bp_in, "text", "doc_id", min_docs=2)
    bp_arm = bpo.select(
        F.lit("bp").alias("op"),
        F.col("doc_id").cast("long").alias("k"),
        (F.col("n_paras_kept") * 1000 + F.col("n_paras_total"))
        .cast("long")
        .alias("v1"),
        F.conv(F.substring(F.md5("text_clean"), 1, 8), 16, 10)
        .cast("long")
        .alias("v2"),
    )

    # rep: Gopher-style duplicate line/paragraph fractions over text with
    # CONSTRUCTED repeats (doc_id%2 duplicates a line, doc_id%5 a
    # paragraph); the four ratios pack into two scaled-int columns.
    rt = F.concat(
        F.col("text"),
        F.lit("\n"),
        F.substring("text", 1, 50),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.lit("\n"), F.substring("text", 1, 50)),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.lit("\n\n"), F.substring("text", 1, 80),
                F.lit("\n\n"), F.substring("text", 1, 80),
            ),
        ).otherwise(F.lit("")),
    )
    rep_in = base.select("doc_id", rt.alias("text"))
    reps = curation.repetition_stats(rep_in, "text")
    _e6 = lambda c: F.floor(F.col(c) * 1000000 + 0.5)  # noqa: E731
    rep_arm = reps.select(
        F.lit("rep").alias("op"),
        F.col("doc_id").cast("long").alias("k"),
        (_e6("dup_line_frac") * 10000000 + _e6("dup_line_char_frac"))
        .cast("long")
        .alias("v1"),
        (_e6("dup_para_frac") * 10000000 + _e6("dup_para_char_frac"))
        .cast("long")
        .alias("v2"),
    )

    # pii: typed-placeholder redaction over text with CONSTRUCTED PII
    # (email/IP/phone appended on disjoint doc_id residues); v1 packs the
    # three progressive counts, v2 hashes the fully redacted text.
    pt = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com now"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(
                F.lit(" host 10.0."),
                (F.col("doc_id") % 200).cast("string"),
                F.lit(".17 up"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.lit(" call +1 (555) 010-"),
                (F.lit(1000) + F.col("doc_id") % 9000).cast("string"),
                F.lit(" today"),
            ),
        ).otherwise(F.lit("")),
    )
    pii_in = base.select("doc_id", pt.alias("text"))
    piid = curation.redact_pii(pii_in, "text")
    pii_arm = piid.select(
        F.lit("pii").alias("op"),
        F.col("doc_id").cast("long").alias("k"),
        (F.col("n_email") * 1000000 + F.col("n_ip") * 1000 + F.col("n_phone"))
        .cast("long")
        .alias("v1"),
        F.conv(F.substring(F.md5("text_redacted"), 1, 8), 16, 10)
        .cast("long")
        .alias("v2"),
    )

    return (
        curate.unionAll(export).unionAll(verify).unionAll(qmodel)
        .unionAll(dec_hits).unionAll(dec_clean).unionAll(bp_arm)
        .unionAll(rep_arm).unionAll(pii_arm)
    )


def _png_decode_oracle_values(n: int = 48, seed: int = 7) -> str:
    """Expected features of the png_decode arm, recomputed at import from
    the SAME seeded arrays synthetic_png_media encodes — ground truth that
    never touches PNG bytes, so the arm differentially verifies
    encode → decode losslessness + the decode path itself (a decoder bug,
    or a silent fallback to the byte-stub, changes mean/std and breaks
    the hash).  Scaled ints (floor(x*1e4+0.5)) dodge the Spark-vs-Python
    round() half-way flavors."""
    import math

    import numpy as np

    vals = []
    rng = np.random.default_rng(seed)
    for i in range(n):
        h, w = 6 + (i % 7), 8 + (i % 5)
        arr = rng.integers(0, 256, size=(h, w), dtype=np.uint8).astype(np.float64)
        vals.append(
            f"({i}, {arr.size}, {math.floor(arr.mean() * 1e4 + 0.5)}.0, "
            f"{math.floor(arr.std() * 1e4 + 0.5)}.0)"
        )
    return ",\n    ".join(vals)


def _wav_decode_oracle_values(n: int = 32, seed: int = 11) -> str:
    """Expected features of the wav_decode arm — same contract as
    _png_decode_oracle_values: recomputed at import from the seeded int16
    sample arrays synthetic_wav_media encodes, never via WAV bytes.
    PCM16 encode → decode is exactly samples/32768, so ground truth is
    the normalized-array moments; scale 1e6 (values live in [-1, 1))."""
    import math

    import numpy as np

    vals = []
    rng = np.random.default_rng(seed)
    for i in range(n):
        n_samp = 120 + (i % 9) * 41
        a = rng.integers(-32768, 32768, size=n_samp, dtype=np.int16)
        a = a.astype(np.float64) / 32768.0
        vals.append(
            f"({i}, {a.size}, {math.floor(a.mean() * 1e6 + 0.5)}.0, "
            f"{math.floor(a.std() * 1e6 + 0.5)}.0)"
        )
    return ",\n    ".join(vals)


def _dhash_oracle_values(n: int = 48, seed: int = 7) -> str:
    """Expected dHash fingerprints of the dhash arm, recomputed at import
    from the SAME seeded arrays synthetic_png_media encodes — ground truth
    that never touches PNG bytes, so the arm differentially verifies the
    encode → decode → pool → hash chain and the distributed mapInPandas
    plumbing (the pooling/hash arithmetic itself is independently pinned
    against a loop reference in tests/test_operators_misc.py). The signed
    64-bit hash is split into two unsigned 32-bit halves so the doubles
    carry it exactly (2^32 < 2^53)."""
    import numpy as np

    from cnosdb_spark.operators.multimodal import dhash_from_gray

    rng = np.random.default_rng(seed)
    vals = []
    for i in range(n):
        h, w = 6 + (i % 7), 8 + (i % 5)
        arr = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        u = dhash_from_gray(arr) & ((1 << 64) - 1)
        vals.append(f"({i}, {u >> 32}.0, {u & 0xFFFFFFFF}.0)")
    return ",\n    ".join(vals)


def _afp_oracle_values(n: int = 32, seed: int = 11) -> str:
    """Expected audio fingerprints of the afp arm — same contract as
    _dhash_oracle_values: recomputed at import from the seeded int16
    sample arrays synthetic_wav_media encodes (PCM16 decode is exactly
    samples/32768, so the array-side fingerprint equals the
    decode-chain's), split into exact unsigned 32-bit halves."""
    import numpy as np

    from cnosdb_spark.operators.multimodal import audio_fingerprint_from_samples

    rng = np.random.default_rng(seed)
    vals = []
    for i in range(n):
        n_samp = 120 + (i % 9) * 41
        a = rng.integers(-32768, 32768, size=n_samp, dtype=np.int16)
        u = audio_fingerprint_from_samples(a.astype(np.float64) / 32768.0)
        u &= (1 << 64) - 1
        vals.append(f"({i}, {u >> 32}.0, {u & 0xFFFFFFFF}.0)")
    return ",\n    ".join(vals)


def _dhash_pairs_oracle(
    cap: int = 20, bands: int = 4, bits: int = 64, max_ham: int = 6
) -> str:
    """Oracle for the dh_pairs/dh_drop arms: the dHash fingerprints are
    recomputed at import from the SAME seeded template-heavy arrays
    synthetic_template_png_media encodes (ground truth never touching
    PNG), but the ENTIRE banding pipeline — chunk extraction, bucket
    sizing, the max_bucket_size hot-bucket ceiling, pair expansion and
    the exact-hamming verify — is re-derived in SQL, so the ceiling's
    drop logic in dedup.fingerprint_near_dup_pairs is differentially
    verified, the same contract as _near_dup_oracle for the sign-LSH
    path. DuckDB's >> is arithmetic and xor/bit_count use two's
    complement, matching Spark's shiftright/bitwiseXOR/bit_count on
    signed 64-bit fingerprints (mask makes sign-extension irrelevant)."""
    from cnosdb_spark.operators.multimodal import (
        dhash_from_gray,
        template_png_arrays,
    )

    fps = {i: dhash_from_gray(a) for i, a in sorted(template_png_arrays().items())}
    vals = ",\n    ".join(f"({i}, {fp})" for i, fp in fps.items())
    chunk = bits // bands
    mask = (1 << chunk) - 1
    band_rows = ", ".join(f"({b})" for b in range(bands))
    return f"""
    WITH fp(media_id, fpv) AS (VALUES
    {vals}),
    ch AS (SELECT media_id, fpv, b.b AS band,
                  ((fpv >> (b.b * {chunk})) & {mask}) AS chunkv
           FROM fp, (VALUES {band_rows}) AS b(b)),
    sz AS (SELECT band, chunkv, count(*) AS n FROM ch GROUP BY band, chunkv),
    keep AS (SELECT ch.media_id, ch.fpv, ch.band, ch.chunkv
             FROM ch JOIN sz USING (band, chunkv) WHERE sz.n <= {cap}),
    cand AS (SELECT DISTINCT a.media_id AS id_a, a.fpv AS fa,
                    b.media_id AS id_b, b.fpv AS fb
             FROM keep a JOIN keep b
             ON a.band = b.band AND a.chunkv = b.chunkv
                AND a.media_id < b.media_id),
    pairs AS (SELECT id_a, id_b, bit_count(xor(fa, fb)) AS hamming
              FROM cand WHERE bit_count(xor(fa, fb)) <= {max_ham}),
    hist AS (SELECT count(*) FILTER (WHERE n > {cap}) AS n_hot,
                    count(*) FILTER (WHERE n >= 2 AND n <= {cap}) AS n_kept
             FROM sz)
    SELECT 'dh_pairs' AS op, CAST(id_a AS BIGINT) AS media_id,
           'image' AS kind, CAST(id_b AS BIGINT) AS n_units,
           CAST(hamming AS DOUBLE) AS f1, CAST(NULL AS DOUBLE) AS f2
    FROM pairs
    UNION ALL
    SELECT 'dh_drop', CAST(-1 AS BIGINT), 'image', CAST(n_hot AS BIGINT),
           CAST(n_kept AS DOUBLE), CAST(NULL AS DOUBLE)
    FROM hist
    """


@_q(
    "multimodal_features",
    f"""
    -- pinned expected output, five arms:
    --  * stub: synthetic payloads are seeded (seed=42) and the stub
    --    features are deterministic byte-histogram moments — literal table
    --  * png_decode: REAL PNG decode (vendored pure-python codec /
    --    operators/multimodal.py png_decode_gray) over synthetic_png_media;
    --    expected rows recomputed at import from the same seeded arrays,
    --    never via PNG — see _png_decode_oracle_values
    --  * wav_decode: REAL PCM WAV decode (stdlib wave / wav_decode_pcm)
    --    over synthetic_wav_media; same ground-truth-from-arrays contract
    --  * dhash: perceptual image fingerprint (decode -> 8x9 mean-pool ->
    --    gradient-sign hash, operators/multimodal.py image_dhash) split
    --    into exact 32-bit halves; same ground-truth-from-arrays contract
    --  * dh_pairs/dh_drop: full image near-dup banding with an ACTIVE
    --    max_bucket_size hot-bucket ceiling over a template-heavy corpus;
    --    the oracle re-derives banding+ceiling+verify in SQL
    SELECT * FROM ({_dhash_pairs_oracle()})
    UNION ALL
    SELECT 'dhash' AS op, CAST(media_id AS BIGINT) AS media_id,
           'image' AS kind, CAST(64 AS BIGINT) AS n_units,
           CAST(hi AS DOUBLE) AS f1, CAST(lo AS DOUBLE) AS f2
    FROM (VALUES
    {_dhash_oracle_values()})
    AS dh(media_id, hi, lo)
    UNION ALL
    SELECT 'afp' AS op, CAST(media_id AS BIGINT) AS media_id,
           'audio' AS kind, CAST(64 AS BIGINT) AS n_units,
           CAST(hi AS DOUBLE) AS f1, CAST(lo AS DOUBLE) AS f2
    FROM (VALUES
    {_afp_oracle_values()})
    AS af(media_id, hi, lo)
    UNION ALL
    SELECT 'png_decode' AS op, CAST(media_id AS BIGINT) AS media_id,
           'image' AS kind, CAST(n_px AS BIGINT) AS n_units,
           CAST(fm AS DOUBLE) AS f1, CAST(fs AS DOUBLE) AS f2
    FROM (VALUES
    {_png_decode_oracle_values()})
    AS p(media_id, n_px, fm, fs)
    UNION ALL
    SELECT 'wav_decode' AS op, CAST(media_id AS BIGINT) AS media_id,
           'audio' AS kind, CAST(n_samp AS BIGINT) AS n_units,
           CAST(fm AS DOUBLE) AS f1, CAST(fs AS DOUBLE) AS f2
    FROM (VALUES
    {_wav_decode_oracle_values()})
    AS wv(media_id, n_samp, fm, fs)
    UNION ALL
    SELECT 'stub' AS op, CAST(media_id AS BIGINT) AS media_id, kind,
           CAST(n_bytes AS BIGINT) AS n_units,
           CAST(f_mean AS DOUBLE) AS f1,
           CAST(f_std AS DOUBLE) AS f2
    FROM (VALUES
    (0, 'image', 64, 129.0313, 74.2094),
    (1, 'audio', 96, 124.3333, 72.026),
    (2, 'video', 128, 123.9141, 72.3679),
    (3, 'image', 160, 129.9688, 75.3686),
    (4, 'audio', 192, 130.4063, 70.7841),
    (5, 'video', 64, 118.25, 73.1206),
    (6, 'image', 96, 110.375, 69.6044),
    (7, 'audio', 128, 124.0156, 73.1498),
    (8, 'video', 160, 132.75, 72.5501),
    (9, 'image', 192, 133.901, 73.6874),
    (10, 'audio', 64, 134.6094, 71.4925),
    (11, 'video', 96, 126.9688, 74.6756),
    (12, 'image', 128, 126.1094, 78.2492),
    (13, 'audio', 160, 122.6938, 77.1405),
    (14, 'video', 192, 126.5208, 77.0682),
    (15, 'image', 64, 131.7813, 75.4566),
    (16, 'audio', 96, 140.4271, 79.7667),
    (17, 'video', 128, 122.3047, 71.9182),
    (18, 'image', 160, 120.5563, 75.4889),
    (19, 'audio', 192, 127.2708, 70.2783),
    (20, 'video', 64, 144.5, 67.8772),
    (21, 'image', 96, 139.8333, 75.6801),
    (22, 'audio', 128, 123.7266, 74.9303),
    (23, 'video', 160, 132.8438, 70.2129),
    (24, 'image', 192, 126.7396, 71.6613),
    (25, 'audio', 64, 115.7813, 77.1631),
    (26, 'video', 96, 117.2292, 77.1589),
    (27, 'image', 128, 132.875, 80.5689),
    (28, 'audio', 160, 116.75, 75.7277),
    (29, 'video', 192, 122.4271, 74.198),
    (30, 'image', 64, 121.375, 75.9452),
    (31, 'audio', 96, 125.75, 67.7426),
    (32, 'video', 128, 133.0391, 72.3555),
    (33, 'image', 160, 126.4438, 74.037),
    (34, 'audio', 192, 124.1094, 70.7262),
    (35, 'video', 64, 125.0781, 69.6961),
    (36, 'image', 96, 122.2708, 69.1519),
    (37, 'audio', 128, 110.3984, 71.8176),
    (38, 'video', 160, 141.8813, 70.7734),
    (39, 'image', 192, 128.3802, 78.6416),
    (40, 'audio', 64, 129.9219, 73.1572),
    (41, 'video', 96, 137.7292, 70.982),
    (42, 'image', 128, 125.9844, 71.1814),
    (43, 'audio', 160, 129.0188, 75.0961),
    (44, 'video', 192, 133.7604, 73.3911),
    (45, 'image', 64, 125.8438, 77.3701),
    (46, 'audio', 96, 124.6771, 73.9353),
    (47, 'video', 128, 125.0234, 71.1906),
    (48, 'image', 160, 119.0625, 78.0416),
    (49, 'audio', 192, 130.9167, 71.1665),
    (50, 'video', 64, 118.5313, 73.377),
    (51, 'image', 96, 124.1771, 73.751),
    (52, 'audio', 128, 127.3906, 71.6824),
    (53, 'video', 160, 123.725, 78.0401),
    (54, 'image', 192, 134.7448, 71.479),
    (55, 'audio', 64, 122.9063, 71.3317),
    (56, 'video', 96, 125.1875, 73.9551),
    (57, 'image', 128, 114.0469, 75.524),
    (58, 'audio', 160, 129.9938, 74.5272),
    (59, 'video', 192, 124.849, 73.9428),
    (60, 'image', 64, 113.5625, 69.2525),
    (61, 'audio', 96, 121.8333, 76.1812),
    (62, 'video', 128, 136.6953, 77.2098),
    (63, 'image', 160, 124.7438, 69.9965))
    AS t(media_id, kind, n_bytes, f_mean, f_std)
    """,
)
def multimodal_features(spark, sf_dir):
    """Multimodal binary-column plumbing (operators/multimodal.py),
    five mapInPandas arms:

    - stub: deterministic byte-histogram features over opaque payloads —
      the schema/batch-shape/partitioning plumbing a real CNN/audio
      embedding kernel would use;
    - png_decode: the REAL image codec path — synthetic_png_media encodes
      seeded grayscale arrays to valid PNGs (png_encode_gray), executors
      decode them back (real_decode → PIL when present, else the vendored
      pure-python png_decode_gray) and emit pixel-moment features;
    - wav_decode: the REAL audio codec path — synthetic_wav_media encodes
      seeded int16 PCM noise to valid WAVs, executors decode through
      soundfile when present, else the stdlib-wave wav_decode_pcm;
    - dhash (round 7): the perceptual image-dedup fingerprint
      (image_dhash: decode → 8x9 area-mean-pool → gradient-sign hash),
      the hashing half of image_near_dup_pairs, emitted as exact 32-bit
      halves;
    - afp (round 7): the audio-dedup fingerprint (audio_fingerprint:
      WAV decode → 17-window FFT → 4 log-band energy deltas,
      Haitsma-Kalker), the hashing half of audio_near_dup_pairs, same
      32-bit-halves emission;
    - dh_pairs + dh_drop (round 8): the FULL image near-dup pipeline
      (image_near_dup_pairs: decode → dhash → hamming banding →
      max_bucket_size ceiling → exact-hamming verify) over a
      template-heavy corpus (synthetic_template_png_media) where the
      ceiling is ACTIVE: 4 hot buckets of 23-28 near-identical template
      variants are dropped before pair expansion (suppressing their
      ~435 in-bucket pairs — the quadratic blowup the ceiling exists to
      stop) while a 4-member family under the cap survives with hamming
      0-3 pairs. dh_drop reports (n hot buckets dropped, n kept
      expandable buckets) from dedup.fingerprint_band_stats. The oracle
      (_dhash_pairs_oracle) re-derives banding, bucket sizes, the
      ceiling and the verify in SQL — only the fingerprints themselves
      come from the shared ground-truth arrays.

    Both codec arms' oracles recompute expectations from the same seeded
    arrays without ever touching PNG/WAV bytes, so a decoder bug or a
    silent stub fallback breaks the hash.  n_units = decoded sample/pixel
    count; features scaled-int (floor(x*scale+0.5)) to dodge round()
    flavor differences between engines.
    """
    media = synthetic_media(spark, n=64)
    stub = extract_features(media).select(
        F.lit("stub").alias("op"),
        "media_id",
        "kind",
        F.col("n_bytes").cast("long").alias("n_units"),
        F.round(F.element_at("feature", 1), 4).alias("f1"),
        F.round(F.element_at("feature", 2), 4).alias("f2"),
    )
    def codec_arm(media_df, op, scale):
        return extract_features(media_df, use_codec=True).select(
            F.lit(op).alias("op"),
            "media_id",
            "kind",
            F.element_at("feature", 8).cast("long").alias("n_units"),
            F.floor(F.element_at("feature", 1) * scale + F.lit(0.5))
            .cast("double")
            .alias("f1"),
            F.floor(F.element_at("feature", 2) * scale + F.lit(0.5))
            .cast("double")
            .alias("f2"),
        )

    png = codec_arm(multimodal.synthetic_png_media(spark, n=48), "png_decode", 1e4)
    wav = codec_arm(multimodal.synthetic_wav_media(spark, n=32), "wav_decode", 1e6)
    mask32 = F.lit((1 << 32) - 1)

    def fp_arm(fps_df, op, kind, fp_col):
        # arithmetic shiftright sign-extends; masking to 32 bits makes
        # both halves exact non-negative doubles
        return fps_df.select(
            F.lit(op).alias("op"),
            "media_id",
            F.lit(kind).alias("kind"),
            F.lit(64).cast("long").alias("n_units"),
            F.shiftright(fp_col, 32).bitwiseAND(mask32).cast("double").alias("f1"),
            F.col(fp_col).bitwiseAND(mask32).cast("double").alias("f2"),
        )

    dhash = fp_arm(
        multimodal.image_dhash(multimodal.synthetic_png_media(spark, n=48)),
        "dhash", "image", "dhash",
    )
    afp = fp_arm(
        multimodal.audio_fingerprint(multimodal.synthetic_wav_media(spark, n=32)),
        "afp", "audio", "afp",
    )

    tpl = multimodal.synthetic_template_png_media(spark)
    dh_pairs = multimodal.image_near_dup_pairs(
        tpl, bands=4, max_hamming=6, max_bucket_size=20
    ).select(
        F.lit("dh_pairs").alias("op"),
        F.col("id_a").cast("long").alias("media_id"),
        F.lit("image").alias("kind"),
        F.col("id_b").cast("long").alias("n_units"),
        F.col("hamming").cast("double").alias("f1"),
        F.lit(None).cast("double").alias("f2"),
    )
    dh_drop = (
        dedup.fingerprint_band_stats(
            multimodal.image_dhash(tpl).filter(F.col("dhash").isNotNull()),
            "media_id", "dhash", bits=64, bands=4,
        )
        .agg(
            F.count(F.when(F.col("n") > 20, 1)).cast("long").alias("n_hot"),
            F.count(F.when(F.col("n") <= 20, 1)).cast("double").alias("n_kept"),
        )
        .select(
            F.lit("dh_drop").alias("op"),
            F.lit(-1).cast("long").alias("media_id"),
            F.lit("image").alias("kind"),
            F.col("n_hot").alias("n_units"),
            F.col("n_kept").alias("f1"),
            F.lit(None).cast("double").alias("f2"),
        )
    )
    return (
        stub.unionAll(png).unionAll(wav).unionAll(dhash).unionAll(afp)
        .unionAll(dh_pairs).unionAll(dh_drop)
    )


# =====================================================================
# Extended relational / window / function coverage
# =====================================================================

@_q(
    "sessionization",
    """
    WITH g AS (
      SELECT user_id, ts,
             CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER
                  (PARTITION BY user_id ORDER BY ts)) > 1800000000
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    agg AS (
      SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions,
             CAST(count(*) AS BIGINT) AS n_events
      FROM g GROUP BY user_id)
    SELECT 'batch' AS arm, * FROM agg
    UNION ALL
    SELECT 'stream', * FROM agg
    """,
)
def sessionization(spark, sf_dir):
    """Sessionization, two arms against ONE lag-gap oracle:

    - batch: lag-gap > 30min starts a new session (common OLAP pattern);
    - stream (round 8): streaming/stream_table.py sessionize_stream run
      FOR REAL — events + a far-future sentinel staged to parquet,
      readStream → F.session_window(gap=30min) → writeStream
      availableNow (the _asof_stream_arm pattern); per-user session and
      event counts from the CLOSED sessions must equal the batch rule's.
      Boundary note: session_window splits at gap >= 30min vs the batch
      rule's > 30min — the corpus has zero exact-1800s gaps (asserted in
      the arm), so the semantics coincide; an exact-boundary corpus
      would be a real divergence, surfaced loudly by the assert.
    """
    e = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    new_s = F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0)
    batch = (
        e.withColumn("_ns", new_s)
        .groupBy("user_id")
        .agg(F.sum("_ns").alias("n_sessions"), F.count(F.lit(1)).alias("n_events"))
        .select(F.lit("batch").alias("arm"), "user_id", "n_sessions", "n_events")
    )
    stream = _sessionize_stream_arm(spark, e)
    return batch.unionAll(stream)


def _sessionize_stream_arm(spark, e):
    """Run sessionize_stream for real (availableNow over staged files,
    far-future sentinel advancing the watermark so every real session
    closes) and fold the emitted sessions to per-user counts."""
    import tempfile
    from datetime import timedelta

    from cnosdb_spark.streaming import stream_table

    src = e.select("user_id", "ts")
    # loud guard for the >= vs > gap-boundary divergence (docstring above)
    w = W.partitionBy("user_id").orderBy("ts")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    n_exact = src.withColumn("_g", gap_us).filter(
        F.col("_g") == 1_800_000_000
    ).limit(1).count()
    assert n_exact == 0, (
        "sessionization stream arm: corpus has an exact-30min gap — "
        "session_window (>=) and the batch lag rule (>) diverge here"
    )

    base = tempfile.mkdtemp(prefix="sessionize_stream_row_")
    in_path, out = f"{base}/in", f"{base}/out"
    far = src.agg(F.max("ts")).first()[0] + timedelta(days=60)
    src.unionByName(
        spark.createDataFrame([(-1, far)], schema=src.schema)
    ).write.parquet(in_path)
    s = spark.readStream.schema(src.schema).parquet(in_path)
    sessions = stream_table.sessionize_stream(
        s, key="user_id", time_col="ts", gap="30 minutes", watermark="1 hour"
    )
    with _stream_scope(spark, in_path):
        q = (
            sessions.writeStream.option("checkpointLocation", f"{base}/ck")
            .trigger(availableNow=True)
            .format("parquet")
            .start(out)
        )
    _await_stream(q, 300)
    return (
        spark.read.parquet(out)
        .filter(F.col("user_id") >= 0)  # drop the sentinel's session
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
        )
        .select(F.lit("stream").alias("arm"), "user_id", "n_sessions", "n_events")
    )


@_q(
    "gis_point_distance",
    """
    SELECT event_id,
           round(sqrt((value - 50) * (value - 50)
                 + (CAST(user_id % 10 AS DOUBLE) - 5) * (CAST(user_id % 10 AS DOUBLE) - 5)), 6)
             AS dist
    FROM events WHERE event_id < 500 AND value IS NOT NULL
    """,
)
def gis_point_distance(spark, sf_dir):
    """st_distance over WKT points (SURVEY §2.8 GIS; reference
    scalar_function/gis/). The oracle computes the euclidean formula
    directly — validating the WKT parse + distance UDF end-to-end."""
    from cnosdb_spark.functions.gis import st_distance

    e = _t(spark, sf_dir, "events").filter(
        (F.col("event_id") < 500) & F.col("value").isNotNull()
    )
    wkt = F.concat(
        F.lit("POINT("),
        F.col("value").cast("string"),
        F.lit(" "),
        F.pmod(F.col("user_id"), F.lit(10)).cast("string"),
        F.lit(")"),
    )
    return e.select(
        "event_id",
        F.round(st_distance(wkt, F.lit("POINT(50 5)")), 6).alias("dist"),
    )


@_q(
    "streaming_tumbling_agg",
    """
    WITH mx AS (SELECT max(epoch_us(ts)) AS m FROM events)
    SELECT (epoch_us(ts) - epoch_us(ts) % 3600000000) AS window_start_us,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 4)     AS sum_value
    FROM events GROUP BY 1, 2
    HAVING window_start_us + 3600000000 < (SELECT m FROM mx) - 3600000000
    """,
)
def streaming_tumbling_agg(spark, sf_dir):
    """Incremental micro-batch aggregation (SURVEY §2.9): readStream over
    the events table, tumbling window count, availableNow trigger,
    append-mode parquet sink + checkpoint — the reference's
    MicroBatchStreamExecution shape (stream/basic.slt), and the plan shape
    that scales: state-store partial aggs + distributed sink, no
    driver-side complete-mode materialization.

    STREAM-PURE: every returned row came through the writeStream path.
    Append mode emits exactly the windows closed by the watermark
    (end <= max_ts - 1h, flushed by the trailing no-data micro-batch);
    both sides restrict to windows STRICTLY closed
    (end < max_ts - 1h) so Spark's <=-vs-< eviction boundary can't
    flip a row, and no batch-computed aggregate is ever unioned in.

    The schema is taken from the batch reader (post-normalization), so
    whatever the parquet encoding of ``ts`` (nanos-long / µs-NTZ / µs-LTZ)
    the stream sees TimestampType — round 2's wrong answer came from
    hardcoding the nanos-long assumption here.
    """
    import shutil
    import tempfile

    batch = _t(spark, sf_dir, "events")
    # the file stream source wants a directory; stage the table file into one
    stage = tempfile.mkdtemp(prefix="events_stream_")
    shutil.copy(os.path.join(sf_dir, "events.parquet"), stage)
    raw = spark.readStream.schema(
        spark.read.parquet(os.path.join(stage, "events.parquet")).schema
    ).parquet(stage)
    sdf = normalize_timestamps(raw)
    agg = (
        sdf.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
    )
    out_dir = tempfile.mkdtemp(prefix="stream_sink_")
    with _stream_scope(spark, stage):
        q = (
            agg.writeStream.outputMode("append")
            .format("parquet")
            .option("path", os.path.join(out_dir, "data"))
            .option("checkpointLocation", os.path.join(out_dir, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
    _await_stream(q, 300)
    emitted = spark.read.parquet(os.path.join(out_dir, "data"))
    # watermark bound from the batch MAX only (a filter constant, not data)
    max_us = batch.agg(F.max(F.unix_micros("ts"))).collect()[0][0]
    closed = emitted.filter(
        F.unix_micros(F.col("window.end")) < F.lit(max_us - 3_600_000_000)
    )
    return closed.select(
        F.unix_micros(F.col("window.start")).alias("window_start_us"),
        "event_type",
        "n",
        "sum_value",
    )


@_q(
    "streaming_interval_update",
    """
    SELECT (epoch_us(ts) - epoch_us(ts) % 3600000000) AS window_start_us,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 4)     AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def streaming_interval_update(spark, sf_dir):
    """Interval-trigger (processingTime) + update-output-mode incremental
    aggregation (SURVEY §2.9; reference execution/stream/trigger/
    executor.rs interval loop): the staged table is split into two files,
    maxFilesPerTrigger=1 forces one micro-batch per file, and each batch
    emits only the keys it changed via foreachBatch into parquet. The
    final answer takes the LATEST emission per key — which must equal the
    batch aggregation, proving exactly-once incremental state. No
    watermark: update-mode state is complete, so file order can't drop
    rows (the production path run_incremental_agg adds one)."""
    import glob
    import shutil
    import tempfile

    batch = _t(spark, sf_dir, "events")
    stage = tempfile.mkdtemp(prefix="events_interval_")
    half1, half2 = tempfile.mkdtemp(), tempfile.mkdtemp()
    med = batch.selectExpr("percentile(unix_micros(ts), 0.5) AS m").collect()[0]["m"]
    batch.filter(F.unix_micros("ts") <= med).coalesce(1).write.mode("overwrite").parquet(half1)
    batch.filter(F.unix_micros("ts") > med).coalesce(1).write.mode("overwrite").parquet(half2)
    for i, h in enumerate((half1, half2)):
        shutil.copy(glob.glob(os.path.join(h, "*.parquet"))[0],
                    os.path.join(stage, f"part{i}.parquet"))

    sdf = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    agg = sdf.groupBy(F.window("ts", "1 hour"), "event_type").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value")
    )
    out_dir = tempfile.mkdtemp(prefix="interval_updates_")

    def sink(bdf, batch_id):
        bdf.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(out_dir)

    with _stream_scope(spark, stage):
        q = (
            agg.writeStream.outputMode("update")
            .foreachBatch(sink)
            .option("checkpointLocation", os.path.join(stage, "_ckpt"))
            .trigger(processingTime="500 milliseconds")
            .start()
        )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    updates = spark.read.parquet(out_dir)
    latest = (
        updates.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("window", "event_type").orderBy(F.col("batch_id").desc())
            ),
        )
        .filter("rn = 1")
    )
    return latest.select(
        F.unix_micros(F.col("window.start")).alias("window_start_us"),
        "event_type",
        "n",
        "sum_value",
    )


def tsbs_last_point(spark, sf_dir):
    """TSBS last-loc shape: latest point per series — one agg with max_by,
    no window sort (the plan the reference's time-ordered scan feeds)."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.unix_micros(F.max("ts")).alias("last_ts_us"),
        F.max_by("value", "ts").alias("last_value"),
        F.max_by("event_type", "ts").alias("last_type"),
    )


def tsbs_threshold_windows(spark, sf_dir):
    """TSBS high-load shape: 10-min windows whose avg exceeds a threshold,
    counted per series."""
    e = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    return (
        e.withColumn("_ws", us - F.pmod(us, F.lit(600_000_000)))
        .groupBy("user_id", "_ws")
        .agg(F.avg("value").alias("_av"))
        .filter(F.col("_av") > 75)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_high_windows"))
    )


def tsbs_daily_activity(spark, sf_dir):
    """TSBS daily-activity shape: per-series per-day counts and averages."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy(
        "user_id", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("value"), 6).alias("avg_value"))


# =====================================================================
# Extra dedup / ANN coverage
# =====================================================================

@_q(
    "dedup_cluster_resolution",
    "WITH RECURSIVE toks AS (SELECT doc_id, "
    + _TOKS_SQL
    + """ AS t FROM documents),
    sh AS (
      SELECT doc_id, unnest(CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                            ELSE list_transform(range(1, len(t) - 1),
                                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END) AS s
      FROM toks),
    d AS (SELECT DISTINCT doc_id, s FROM sh),
    keep AS (SELECT s FROM d GROUP BY s HAVING count(*) <= 1000),
    df AS (SELECT d.doc_id, d.s FROM d JOIN keep ON keep.s = d.s),
    sz AS (SELECT doc_id, count(*) AS n FROM df GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
              FROM df a JOIN df b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
    pairs AS (
      SELECT id_a, id_b
      FROM inter JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
      WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.2),
    edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    reach AS (
      SELECT doc_id AS id, doc_id AS lab FROM documents
      UNION
      SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id)
    """
    + _minhash_cte_tail()
    + """
    , corpus_b AS (SELECT doc_id, bucket FROM buckets WHERE doc_id % 5 <> 0),
    batch_b AS (SELECT doc_id, bucket FROM buckets WHERE doc_id % 5 = 0)
    SELECT 'cluster' AS op, id AS doc_id, CAST(min(lab) AS BIGINT) AS v,
           (id = min(lab)) AS flag, '' AS src
    FROM reach GROUP BY id
    UNION ALL
    SELECT 'incr', id_a, id_b, TRUE, 'index' FROM (
      SELECT DISTINCT n.doc_id AS id_a, c.doc_id AS id_b
      FROM batch_b n JOIN corpus_b c ON n.bucket = c.bucket)
    UNION ALL
    SELECT 'incr', id_a, id_b, TRUE, 'batch' FROM (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM batch_b a JOIN batch_b b ON a.bucket = b.bucket AND a.doc_id < b.doc_id)
    UNION ALL
    SELECT 'sdedup', id_a, id_b, TRUE, 'index' FROM (
      SELECT DISTINCT n.doc_id AS id_a, c.doc_id AS id_b
      FROM batch_b n JOIN corpus_b c ON n.bucket = c.bucket)
    UNION ALL
    SELECT 'sdedup', id_a, id_b, TRUE, 'batch' FROM (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM batch_b a JOIN batch_b b ON a.bucket = b.bucket AND a.doc_id < b.doc_id)
    """,
)
def dedup_cluster_resolution(spark, sf_dir):
    """Dedup pipeline resolution family — two arms, one row:

    - cluster: near-dup pairs → connected components (min-label
      propagation): the keep-one decision for a dedup pipeline.
      Iterative joins with per-round localCheckpoint, no driver-side row
      loops; the oracle computes the same components via a recursive
      transitive closure;
    - incr (round-9 graduation of the incremental dedup index from
      pytest-only): the production ingest loop — the corpus slice
      (doc_id % 5 != 0, "yesterday") is reduced to its PERSISTABLE
      minhash_band_table index, then dedup_against_index checks the new
      batch (doc_id % 5 == 0, "today") against the index plus itself
      WITHOUT touching corpus text; the oracle re-derives both joins
      from the full-corpus banding CTE filtered by the same split
      (per-doc signatures are subset-invariant, so index rows equal the
      filtered bucket rows);
    - sdedup (round-10): the same ingest check executed through the
      ALWAYS-ON streaming wrapper (dedup_stream_against_index:
      readStream → foreachBatch → parquet append with checkpoint) in one
      availableNow tick — the streamed flag set must byte-match the
      batch path's.
    """
    d = _t(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(d, "text", "doc_id", n=3, threshold=0.2)
    ids = d.select(F.col("doc_id").alias("_id"))
    out = dedup.resolve_duplicate_clusters(ids, pairs, "_id")
    cluster = out.select(
        F.lit("cluster").alias("op"),
        F.col("id").alias("doc_id"),
        F.col("cluster_id").alias("v"),
        F.col("is_canonical").alias("flag"),
        F.lit("").alias("src"),
    )
    corpus = d.filter(F.col("doc_id") % 5 != 0)
    batch = d.filter(F.col("doc_id") % 5 == 0)
    index = dedup.minhash_band_table(
        corpus, "text", "doc_id", n=3, num_hashes=16, bands=4
    )
    incr = dedup.dedup_against_index(
        batch, index, "text", "doc_id", n=3, num_hashes=16, bands=4
    ).select(
        F.lit("incr").alias("op"),
        F.col("id_new").alias("doc_id"),
        F.col("id_match").alias("v"),
        F.lit(True).alias("flag"),
        F.col("source").alias("src"),
    )

    # sdedup (round-10): the SAME ingest check run through the always-on
    # streaming wrapper for real — staged batch files, readStream →
    # foreachBatch(dedup_against_index) → parquet append, availableNow in
    # one tick so the flagged pairs must equal the one-shot incr result
    # (the oracle replays them independently). Multi-tick semantics (the
    # self-updating index) are pinned in tests/test_streaming.py.
    import tempfile

    sbase = tempfile.mkdtemp(prefix="sdedup_row_")
    batch.select("doc_id", "text").write.parquet(f"{sbase}/in")
    b_stream = spark.readStream.schema("doc_id bigint, text string").parquet(
        f"{sbase}/in"
    )
    # NOT _stream_scope'd: this stream is STATELESS (foreachBatch runs the
    # minhash check as a batch job) — the in-batch kernel work wants the
    # full reducer count; the A/B read 0.92× with the scope applied
    q = (
        dedup.dedup_stream_against_index(
            b_stream, index, f"{sbase}/out", f"{sbase}/ck",
            "text", "doc_id", n=3, num_hashes=16, bands=4,
        )
        .trigger(availableNow=True)
        .start()
    )
    _await_stream(q, 300)
    sdedup = spark.read.parquet(f"{sbase}/out").select(
        F.lit("sdedup").alias("op"),
        F.col("id_new").alias("doc_id"),
        F.col("id_match").alias("v"),
        F.lit(True).alias("flag"),
        F.col("source").alias("src"),
    )
    return cluster.unionAll(incr).unionAll(sdedup)


def _refine_oracle(corpus: str | None = None) -> str | None:
    """Oracle half of ivf_ann_topk's refine arms: replicate centroid
    seeding (md5-ordered sample) + 2 spherical-Lloyd iterations in pure
    numpy over the same corpus at import, then emit (a) the final
    per-cluster member counts via an IN-SQL argmax-cosine assignment to
    the numpy-refined centroid literals, and (b) the final inertia as a
    scaled-int literal. The Spark side refines DISTRIBUTED
    (refine_centroids: expression assignment + posexplode mean, float
    sums in partition order) — parity holds because assignments only
    flip on exact cosine ties (measure-zero on this corpus) and the
    inertia is compared at 1e-4 granularity, far above the ~1e-15
    reduction-order noise.

    Returns None ONLY when the corpus file is genuinely absent; any other
    failure RAISES (same loud-disabling contract as _lttb_oracle_values —
    a broad `except → None` silently shrinks correctness coverage)."""
    corpus = corpus or os.environ.get(
        "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
    )
    if not os.path.exists(os.path.join(corpus, "embeddings.parquet")):
        return None

    import hashlib
    import math

    import duckdb
    import numpy as np

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding::DOUBLE[] FROM '{corpus}/embeddings.parquet' "
        "ORDER BY vec_id"
    ).fetchall()
    con.close()
    ids = [r[0] for r in rows]
    V = np.array([r[1] for r in rows], dtype=np.float64)
    order = sorted(
        range(len(ids)),
        key=lambda i: hashlib.md5(str(ids[i]).encode()).hexdigest(),
    )
    cents = V[order[: _RC_K]].copy()
    inertia = 0.0
    for _ in range(_RC_ITER):
        Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        Cn = cents / np.maximum(
            np.linalg.norm(cents, axis=1, keepdims=True), 1e-12
        )
        sims = Vn @ Cn.T
        assign = sims.argmax(axis=1)
        inertia = float((1.0 - sims.max(axis=1)).mean())
        new = []
        for c in range(_RC_K):
            mask = assign == c
            new.append(V[mask].mean(axis=0) if mask.any() else cents[c])
        cents = np.array(new)
    cent_lits = ", ".join(
        "[" + ", ".join(repr(float(x)) for x in c) + "]" for c in cents
    )
    inert_int = math.floor(inertia * 1e4 + 0.5)
    return f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    sims AS (SELECT vec_id,
                    [list_cosine_similarity(v, c) FOR c IN [{cent_lits}]] AS s
             FROM v),
    asg AS (SELECT vec_id, list_position(s, list_max(s)) - 1 AS cluster FROM sims)
    SELECT 'refine_cluster' AS op, CAST(cluster AS BIGINT) AS k,
           TRUE AS cosines_exact, TRUE AS recall_ok,
           CAST(count(*) AS BIGINT) AS v
    FROM asg GROUP BY cluster
    UNION ALL
    SELECT 'refine_inertia', -1, TRUE, TRUE, {inert_int}
    """


_RC_K, _RC_ITER = 8, 2
_REFINE_ORACLE = _refine_oracle()


_SEMDEDUP_ORACLE = """
    SELECT * FROM (
      WITH cent AS (
        SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1 AS cid,
               embedding::DOUBLE[] AS c
        FROM embeddings ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 8),
      vv AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
      sims AS (SELECT vv.vec_id, vv.emb, cent.cid,
                      list_cosine_similarity(vv.emb, cent.c) AS s
               FROM vv CROSS JOIN cent),
      asg AS (SELECT vec_id, emb, cid AS cluster FROM (
                SELECT *, row_number() OVER (PARTITION BY vec_id
                                             ORDER BY s DESC, cid) AS rn
                FROM sims) WHERE rn = 1),
      shadows AS (SELECT b.vec_id AS hid, min(a.vec_id) AS dup_of
                  FROM asg a JOIN asg b
                  ON a.cluster = b.cluster AND a.vec_id < b.vec_id
                  WHERE list_cosine_similarity(a.emb, b.emb) >= 0.42
                  GROUP BY b.vec_id)
      SELECT 'semdedup' AS op, CAST(vv.vec_id AS BIGINT) AS k,
             (s.dup_of IS NULL) AS cosines_exact, TRUE AS recall_ok,
             CAST(s.dup_of AS BIGINT) AS v
      FROM vv LEFT JOIN shadows s ON s.hid = vv.vec_id)
"""


@_q(
    "ivf_ann_topk",
    """
    SELECT 'ivf' AS op, vec_id AS k, TRUE AS cosines_exact, TRUE AS recall_ok,
           CAST(NULL AS BIGINT) AS v
    FROM embeddings WHERE vec_id < 10
    """
    + f"UNION ALL {_SEMDEDUP_ORACLE}"
    + (f"UNION ALL SELECT * FROM ({_REFINE_ORACLE})" if _REFINE_ORACLE else ""),
)
def ivf_ann_topk(spark, sf_dir):
    """IVF approximate nearest neighbors: deterministic centroids (hash
    sample + one distributed Lloyd step), n_probe cluster probing. The
    centroid float math is engine-specific (partial-sum order), so the
    driver-checked contract is the accuracy assertion the judge asked for:
    per query, (a) every IVF-returned cosine equals the true cosine
    computed from the raw vectors (verified by joining back to the
    brute-force scores), and (b) recall@5 vs brute force ≥ 0.5 (measured
    min 0.6/0.6/0.8 at sf0.001/0.01/0.1; 5-of-8 clusters probed — SF-
    independent since round 11).

    Round-8 refine arms — the DISTRIBUTED Lloyd refinement
    (similarity.refine_centroids: expression assignment + posexplode
    groupBy(cluster, dim) mean, only k*dim rows shuffled) runs 2
    iterations from the md5-sampled seeds; the oracle replays seeding +
    refinement in pure numpy at import (_refine_oracle) and re-derives
    the final per-cluster member counts with an in-SQL argmax-cosine
    assignment to its centroid literals:

    - refine_cluster: per-cluster member count under the refined
      centroids must match the numpy ground truth's SQL assignment;
    - refine_inertia: avg(1 - best_cosine) after the final iteration,
      compared at 1e-4 granularity (far above reduction-order noise).

    Round-9 semdedup arm (graduated from pytest-only): SemDeDup semantic
    dedup (similarity.semantic_dedup, Abbas et al. 2023) over UNREFINED
    md5-seeded centroids (n_iter=0 ⇒ the centroids are exact corpus
    vectors the oracle re-derives in pure SQL — no float-refinement
    ambiguity); threshold 0.42 is ACTIVE on this corpus (12 within-
    cluster shadow pairs, min |cos−0.42| margin 3.2e-3 ≫ the ~1e-15
    engine cosine skew), and the oracle replays assignment + the
    within-cluster shadow join + min-dup_of resolution entirely in SQL."""
    emb = _t(spark, sf_dir, "embeddings")
    cents = similarity.ivf_centroids(emb, "embedding", n_centroids=8)
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    # n_probe=5 (round 11, was 4): at the sf0.001 smoke corpus the
    # 4-probe search left query 1's recall@5 at 0.4 — under the 0.5
    # contract floor — making the row's hash SF-dependent (the inherited
    # r10 smoke-tier mismatch). Probing 5 of 8 clusters clears the floor
    # at EVERY SF (measured min recall 0.6/0.6/0.8 at sf0.001/0.01/0.1)
    # and leaves the declared output (the accuracy flags) bit-identical
    # at the gated tiers, where every flag was already TRUE.
    ivf = similarity.ivf_topk(emb, queries, cents, k=5, n_probe=5)
    brute = similarity.brute_force_topk(emb, queries, k=5).select(
        "query_id",
        F.col("vec_id").alias("_bid"),
        F.col("cosine").alias("_bcos"),
    )
    # exact-cosine check: recompute each returned pair's cosine from raw vectors
    raw = emb.select(
        F.col("vec_id").alias("_rid"), F.col("embedding").cast("array<double>").alias("_rv")
    )
    qraw = emb.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").cast("array<double>").alias("_qv")
    )
    checked = (
        ivf.join(raw, ivf.vec_id == raw._rid)
        .join(qraw, "query_id")
        .withColumn(
            "_true_cos",
            F.round(similarity.cosine_expr(F.col("_rv"), F.col("_qv")), 6),
        )
    )
    per_query = checked.groupBy("query_id").agg(
        (F.sum(F.when(F.col("cosine") == F.col("_true_cos"), 0).otherwise(1)) == 0).alias(
            "cosines_exact"
        ),
        F.collect_set("vec_id").alias("_ids"),
    )
    brute_ids = brute.groupBy("query_id").agg(F.collect_set("_bid").alias("_bids"))
    ivf_arm = (
        per_query.join(brute_ids, "query_id")
        .withColumn(
            "recall_ok",
            (
                F.size(F.array_intersect("_ids", "_bids"))
                / F.size("_bids")
                >= 0.5
            ),
        )
        .select(
            F.lit("ivf").alias("op"),
            F.col("query_id").cast("long").alias("k"),
            "cosines_exact",
            "recall_ok",
            F.lit(None).cast("long").alias("v"),
        )
    )
    seeds0 = similarity.ivf_centroids(emb, "embedding", n_centroids=8, n_iter=0)
    sd = similarity.semantic_dedup(emb, seeds0, threshold=0.42).select(
        F.lit("semdedup").alias("op"),
        F.col("vec_id").cast("long").alias("k"),
        F.col("is_kept").alias("cosines_exact"),
        F.lit(True).alias("recall_ok"),
        F.col("dup_of").cast("long").alias("v"),
    )
    ivf_arm = ivf_arm.unionAll(sd)
    if not _REFINE_ORACLE:
        return ivf_arm
    seeds = similarity.ivf_centroids(emb, "embedding", n_centroids=_RC_K, n_iter=0)
    refined, hist = similarity.refine_centroids(
        emb, "embedding", seeds, n_iter=_RC_ITER
    )
    asg = similarity.ivf_assign(
        emb.select("vec_id", F.col("embedding").cast("array<double>").alias("_v")),
        "_v",
        refined,
    )
    clusters = asg.groupBy("_cluster").agg(F.count(F.lit(1)).alias("v")).select(
        F.lit("refine_cluster").alias("op"),
        F.col("_cluster").cast("long").alias("k"),
        F.lit(True).alias("cosines_exact"),
        F.lit(True).alias("recall_ok"),
        F.col("v").cast("long").alias("v"),
    )
    inertia = spark.createDataFrame(
        [("refine_inertia", -1, True, True, int(math.floor(hist[-1] * 1e4 + 0.5)))],
        "op string, k long, cosines_exact boolean, recall_ok boolean, v long",
    )
    return ivf_arm.unionAll(clusters).unionAll(inertia)


# =====================================================================
# Contract functions
# =====================================================================

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: tumbling time_window aggregation over the events stream
    table at sf0.001 (SURVEY §7.2 minimum slice)."""
    return time_window_tumbling(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_REGISTRY)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
