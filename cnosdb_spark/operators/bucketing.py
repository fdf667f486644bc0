"""Bucketed-table helpers: shuffle-free co-located joins.

The brief's third join tool after broadcast and salting: pre-shuffle
BOTH fact tables into the same hash buckets AT WRITE TIME
(``bucketBy`` + ``saveAsTable``), and every future equi-join or
aggregation on the bucket key runs with ZERO exchange — the buckets are
already co-located.  At 100 TB this converts the recurring
"lineitem ⋈ orders every night" shuffle (the single most expensive
exchange in the warehouse) into a one-time layout cost.

Spark-native bucketing only engages through the session catalog
(``saveAsTable`` — plain ``.parquet(path)`` writes lose the bucket
metadata), so these helpers wrap table-name-based IO.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    n_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a managed table hash-bucketed on ``key``.
    ``sort`` additionally sorts each bucket file on the key so the
    downstream join skips its per-partition sort too (SortMergeJoin
    reads both sides pre-sorted)."""
    keys = [key] if isinstance(key, str) else list(key)
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)


def bucketed_tables_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two tables previously written with ``write_bucketed`` on the
    same key and bucket count — plans as an exchange-free SortMergeJoin
    (verify with ``df.explain()``: no ``Exchange hashpartitioning`` above
    either scan)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
