"""Wire-protocol parsers (line protocol, OpenTSDB, ES bulk, ndjson,
Prometheus remote-write) — each module turns one request body into
``{table: (DataFrame, tag_keys)}`` for the engine's schemaless write path.
"""

from __future__ import annotations

import os


def batch_df(spark, data, schema):
    """Build a DataFrame from a driver-local protocol batch at a slice
    count derived from the batch size, not ``defaultParallelism``.

    ``createDataFrame(list)`` parallelizes into defaultParallelism slices
    (32 here), so a 600-row ingest request became 32 near-empty partitions
    — and every downstream job over it (count/range guard, the partitioned
    data write, the series-index append) paid a 32-task stage, while the
    ``partitionBy(_tb)`` write sprayed up to slices x buckets tiny files
    that every later merge-on-read scan re-listed. Slicing to
    ``ceil(rows / SPARK_GRAFT_INGEST_ROWS_PER_SLICE)`` (default 4096) keeps
    small request bodies at one fuller task and converges to the old
    behavior for genuinely large batches (cap: defaultParallelism).

    The slice count is set at ``parallelize`` time, NOT via
    ``.coalesce(n)`` on the 32-slice frame: a coalesced task re-runs each
    parent PythonRDD partition's compute serially — measured ~125 ms of
    Python-worker round-trip per parent slice, i.e. a flat ~4 s per
    action for coalesce(1) over 32 slices, versus 0.2 s when the data is
    one slice from the start. ``parallelize`` slices the list in order,
    so the parse order — the LWW within-batch tie-break — is unchanged.
    """
    per = max(1, int(os.environ.get("SPARK_GRAFT_INGEST_ROWS_PER_SLICE", "4096")))
    target = min(
        spark.sparkContext.defaultParallelism, max(1, -(-len(data) // per))
    )
    return spark.createDataFrame(
        spark.sparkContext.parallelize(list(data), target), schema
    )
