"""information_schema + SHOW QUERIES / KILL QUERY (cases/sys_table/*.slt)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cnosdb_spark.engine import Engine


@pytest.fixture()
def eng(spark, tmp_path):
    e = Engine(spark, str(tmp_path / "wh"))
    e.sql("CREATE DATABASE db1")
    e.sql("CREATE TABLE db1.m(f0 DOUBLE, f1 BIGINT, TAGS(host))")
    return e


def test_information_schema_tables(eng):
    rows = eng.sql(
        "SELECT table_database, table_name, table_engine FROM information_schema.tables "
        "WHERE table_database = 'db1'"
    ).collect()
    assert [(r[0], r[1], r[2]) for r in rows] == [("db1", "m", "TSKV")]


def test_information_schema_columns(eng):
    rows = eng.sql(
        "SELECT column_name, column_type, data_type FROM information_schema.columns "
        "WHERE table_name = 'm' ORDER BY column_name"
    ).collect()
    got = {(r[0], r[1]) for r in rows}
    assert got == {("time", "TIME"), ("host", "TAG"), ("f0", "FIELD"), ("f1", "FIELD")}


def test_information_schema_databases(eng):
    dbs = {r["database_name"] for r in eng.sql(
        "SELECT database_name FROM information_schema.databases"
    ).collect()}
    assert {"public", "db1"} <= dbs


def test_show_and_kill_queries(eng, spark, tmp_path):
    src = str(tmp_path / "stream_src")
    from datetime import datetime

    spark.createDataFrame(
        [(datetime(2024, 1, 1), 1.0)], "time timestamp, v double"
    ).write.parquet(src)
    sdf = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    q = (
        sdf.groupBy().count().writeStream.outputMode("complete")
        .format("memory").queryName("tracked_q").trigger(processingTime="10 seconds")
        .start()
    )
    try:
        rows = eng.sql("SHOW QUERIES").collect()
        assert any(r["query_text"] == "tracked_q" for r in rows)
        killed = eng.sql("KILL QUERY 'tracked_q'").collect()[0]["killed"]
        assert killed
        q.awaitTermination(60)
        assert not q.isActive
    finally:
        if q.isActive:
            q.stop()
