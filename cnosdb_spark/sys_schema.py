"""System schema views: information_schema + query tracking.

Reference: /root/reference query_server/query/src/metadata/
{information_schema_provider, cluster_schema_provider}/ — DATABASES,
TABLES, COLUMNS, QUERIES system tables (tests: cases/sys_table/*.slt).

Spark-first: plain DataFrames derived from catalog metadata, registered
as ``__information_schema__<name>`` temp views; the engine's qualifier
rewrites ``information_schema.<name>`` references onto them. QUERIES /
KILL QUERY map onto tracked StreamingQuery handles + the Spark job group
of the session (the analogue of QueryTracker, dispatcher/query_tracker.rs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .schema import TIME_COL


def databases_df(spark: SparkSession, catalog) -> DataFrame:
    rows = []
    for db in catalog.list_databases():
        opts = catalog.database_options(db)
        rows.append(
            (
                catalog.tenant,
                db,
                opts.get("ttl") or "INF",
                int(opts.get("shard", 1)),
                int(opts.get("replica", 1)),
            )
        )
    return spark.createDataFrame(
        rows or [(catalog.tenant, "public", "INF", 1, 1)][:0],
        "tenant_name string, database_name string, ttl string, shard bigint, replica bigint",
    )


def tables_df(spark: SparkSession, catalog, external: dict, streams: dict) -> DataFrame:
    rows = []
    for db in catalog.list_databases():
        for t in catalog.list_tables(db):
            rows.append((catalog.tenant, db, t, "BASE TABLE", "TSKV"))
    for t in external:
        rows.append((catalog.tenant, "public", t, "EXTERNAL", external[t][0].upper()))
    for t in streams:
        rows.append((catalog.tenant, "public", t, "STREAM", "TSKV"))
    return spark.createDataFrame(
        rows,
        "table_tenant string, table_database string, table_name string, "
        "table_type string, table_engine string",
    )


def columns_df(spark: SparkSession, catalog) -> DataFrame:
    rows = []
    for db in catalog.list_databases():
        for t in catalog.list_tables(db):
            schema = catalog.get_schema(db, t)
            rows.append((db, t, TIME_COL, "TIME", "TIMESTAMP"))
            for tag in schema.tags:
                rows.append((db, t, tag, "TAG", "STRING"))
            for f, ftype in schema.fields.items():
                rows.append((db, t, f, "FIELD", ftype.upper()))
    return spark.createDataFrame(
        rows,
        "database_name string, table_name string, column_name string, "
        "column_type string, data_type string",
    )


class QueryTracker:
    """SHOW QUERIES / KILL QUERY over streaming query handles
    (reference dispatcher/query_tracker.rs + SHOW QUERIES planner path)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def queries_df(self) -> DataFrame:
        rows = []
        for q in self.spark.streams.active:
            rows.append(
                (
                    str(q.id),
                    q.name or "",
                    "STREAM",
                    "RUNNING" if q.isActive else "DONE",
                )
            )
        return self.spark.createDataFrame(
            rows, "query_id string, query_text string, query_type string, state string"
        )

    def kill(self, query_id: str) -> bool:
        for q in self.spark.streams.active:
            if str(q.id) == query_id or (q.name and q.name == query_id):
                q.stop()
                return True
        return False
