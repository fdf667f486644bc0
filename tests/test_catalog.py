"""Catalog + tskv table model tests: LWW merge-on-read semantics pinned by
the reference (cases/sqlancer/repeat_write.slt:12-32), TTL, SHOW SERIES /
SHOW TAG VALUES, compaction, schema evolution."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from cnosdb_spark.catalog import Catalog
from cnosdb_spark.schema import TskvTableSchema


@pytest.fixture()
def cat(spark, tmp_path):
    return Catalog(spark, str(tmp_path / "warehouse"))


def _mk_table(cat, db="db1", name="m2"):
    cat.create_database(db)
    schema = TskvTableSchema(
        tenant="cnosdb",
        db=db,
        name=name,
        tags=["t0", "t1"],
        fields={"f0": "double", "f1": "boolean"},
    )
    cat.create_table(db, schema)
    return schema


def test_create_insert_read(spark, cat):
    _mk_table(cat)
    df = spark.createDataFrame(
        [(datetime(2024, 1, 1, 0, 0, 0), "a", "x", 1.0, True)],
        ["time", "t0", "t1", "f0", "f1"],
    )
    assert cat.insert("db1", "m2", df) == 1
    out = cat.read("db1", "m2").collect()
    assert len(out) == 1
    assert out[0]["f0"] == 1.0 and out[0]["f1"] is True


def test_lww_per_column_merge(spark, cat):
    """repeat_write.slt: write f0=1,f1=true then f0=2 (f1 absent) at the
    same (series, time) → merged row is (2.0, true): a later NULL does NOT
    erase the earlier value."""
    _mk_table(cat)
    ts = datetime(2024, 1, 1, 0, 0, 0)
    w1 = spark.createDataFrame([(ts, "a", "x", 1.0, True)], ["time", "t0", "t1", "f0", "f1"])
    w2 = spark.createDataFrame([(ts, "a", "x", 2.0)], ["time", "t0", "t1", "f0"])
    cat.insert("db1", "m2", w1)
    cat.insert("db1", "m2", w2)
    rows = cat.read("db1", "m2").collect()
    assert len(rows) == 1
    assert rows[0]["f0"] == 2.0
    assert rows[0]["f1"] is True  # NULL write did not erase

    # raw view keeps both physical writes
    assert cat.read_raw("db1", "m2").count() == 2

    # compaction materializes the merge
    cat.compact("db1", "m2")
    assert cat.read_raw("db1", "m2").count() == 1
    rows = cat.read("db1", "m2").collect()
    assert rows[0]["f0"] == 2.0 and rows[0]["f1"] is True


def test_distinct_series_and_tag_values(spark, cat):
    _mk_table(cat)
    rows = [
        (datetime(2024, 1, 1, 0, 0, i), t0, t1, float(i), None)
        for i, (t0, t1) in enumerate([("a", "x"), ("a", "x"), ("b", "y"), ("b", None)])
    ]
    cat.insert(
        "db1",
        "m2",
        spark.createDataFrame(
            rows, "time timestamp, t0 string, t1 string, f0 double, f1 boolean"
        ),
    )
    series = [r["key"] for r in cat.show_series("db1", "m2").collect()]
    assert series == ["m2,t0=a,t1=x", "m2,t0=b", "m2,t0=b,t1=y"]
    tv = [(r["key"], r["value"]) for r in cat.show_tag_values("db1", "m2", ["t0", "t1"]).collect()]
    assert tv == [("t0", "a"), ("t0", "b"), ("t1", "x"), ("t1", "y")]


def test_ttl_filter(spark, cat):
    cat.create_database("dbttl", ttl="1 HOUR")
    schema = TskvTableSchema(
        tenant="cnosdb", db="dbttl", name="m", tags=["t0"], fields={"f0": "double"}
    )
    cat.create_table("dbttl", schema)
    old = datetime(2000, 1, 1)
    now = datetime.utcnow()
    # Writes older than now - ttl hit an expired bucket and are rejected,
    # mirroring the reference's meta bucket-creation error.
    with pytest.raises(ValueError, match="expired bucket"):
        cat.insert(
            "dbttl", "m",
            spark.createDataFrame([(old, "a", 1.0)], ["time", "t0", "f0"]),
        )
    mid = now - timedelta(minutes=30)
    cat.insert(
        "dbttl", "m", spark.createDataFrame([(mid, "a", 1.5)], ["time", "t0", "f0"])
    )
    cat.insert(
        "dbttl", "m", spark.createDataFrame([(now, "b", 2.0)], ["time", "t0", "f0"])
    )
    rows = cat.read("dbttl", "m").collect()
    assert sorted(r["t0"] for r in rows) == ["a", "b"]
    # read-side retention filter (catalog.py read): shrink the TTL so the
    # already-written 30-min-old row falls outside the window — no insert
    # guard involved, only the query-time filter can hide it
    cat.create_database("dbttl", ttl="10 MINUTE")
    rows = cat.read("dbttl", "m").collect()
    assert [r["t0"] for r in rows] == ["b"]


def test_alter_add_drop_field(spark, cat):
    _mk_table(cat)
    cat.alter_table_add_field("db1", "m2", "f2", "bigint")
    assert cat.get_schema("db1", "m2").schema_version == 2
    df = spark.createDataFrame(
        [(datetime(2024, 1, 2), "a", "x", 1.0, None, 7)],
        "time timestamp, t0 string, t1 string, f0 double, f1 boolean, f2 long",
    )
    cat.insert("db1", "m2", df)
    assert "f2" in cat.read("db1", "m2").columns
    cat.alter_table_drop_field("db1", "m2", "f2")
    assert "f2" not in cat.read("db1", "m2").columns


def test_tag_field_overlap_rejected():
    with pytest.raises(ValueError):
        TskvTableSchema("t", "d", "m", tags=["a"], fields={"a": "double"})
    with pytest.raises(ValueError):
        TskvTableSchema("t", "d", "m", tags=["time"], fields={})
    with pytest.raises(ValueError):
        TskvTableSchema("t", "d", "m", tags=[], fields={"f": "blob"})


def test_ns_decomposition_consistent_across_ingest_paths(spark, tmp_path):
    """The same pre-epoch ns-resolution point ingested via SQL INSERT
    (integer time literal) and via line protocol must land on the same
    (time, _ns_res) merge key: both decompose with FLOOR division + pmod
    residue, so LWW keeps ONE row, and time*1000 + residue reconstructs
    the original ns value exactly."""
    from cnosdb_spark.engine import Engine

    eng = Engine(spark, str(tmp_path / "wh"))
    eng.sql("CREATE TABLE mns(f0 BIGINT, TAGS(t0))")
    ns = -10_000_000_000_000_001  # |v| >= 1e16 → ns-magnitude, pre-epoch
    eng.sql(f"INSERT INTO mns(time, t0, f0) VALUES ({ns}, 'a', 1)")
    eng.write_lines(f"mns,t0=a f0=2i {ns}")
    rows = eng.sql("SELECT t0, f0 FROM mns").collect()
    # same merge key → LWW keeps only the later write
    assert len(rows) == 1
    assert rows[0]["f0"] == 2


def test_update_delete_preserve_ns_residue(spark, tmp_path):
    """UPDATE/DELETE rewrite the table read-modify-write style; the sub-µs
    residue must ride through the rewrite or ns-distinct rows (same µs,
    1 ns apart) silently merge on the next read (SURVEY §7.4.6 residual;
    reference transform_update.rs:41-120 rewrites full storage rows keyed
    on raw i64 ns, tskv_table_schema.rs:409-415)."""
    from cnosdb_spark.engine import Engine

    eng = Engine(spark, str(tmp_path / "wh"))
    eng.sql("CREATE TABLE mres(f0 BIGINT, TAGS(t0))")
    ns1 = 1_700_000_000_000_000_001  # same µs, 1 ns apart → distinct rows
    ns2 = 1_700_000_000_000_000_002
    eng.sql(
        f"INSERT INTO mres(time, t0, f0) VALUES ({ns1}, 'a', 1), "
        f"({ns2}, 'a', 2), ({ns1}, 'b', 3)"
    )
    assert eng.sql("SELECT f0 FROM mres").count() == 3

    # field UPDATE rewrites every matched partition — both ns-twins survive
    eng.sql("UPDATE mres SET f0 = f0 + 10 WHERE f0 <= 2")
    got = sorted(r["f0"] for r in eng.sql("SELECT f0 FROM mres").collect())
    assert got == [3, 11, 12]

    # a second update through the rewritten files still sees distinct rows
    eng.sql("UPDATE mres SET f0 = f0 * 100 WHERE f0 >= 11")
    got = sorted(r["f0"] for r in eng.sql("SELECT f0 FROM mres").collect())
    assert got == [3, 1100, 1200]

    # DELETE of another series rewrites the bucket; twins stay distinct
    eng.sql("DELETE FROM mres WHERE t0 = 'b'")
    got = sorted(r["f0"] for r in eng.sql("SELECT f0 FROM mres").collect())
    assert got == [1100, 1200]
