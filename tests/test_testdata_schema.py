"""Guard against driver testdata encoding drift.

Round-2 postmortem: the driver regenerated `events.parquet` with `ts` as
µs-NTZ instead of TIMESTAMP(NANOS) and nine operators silently broke at
load. This test pins the ONE invariant every time-series helper relies on
— `read_table` yields `TimestampType` (µs, UTC) for every declared
timestamp column, whatever the parquet file says — so the next
regeneration fails here, loudly, instead of as cryptic oracle errors.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import types as T

from cnosdb_spark.session import read_table

SF_DIR = "/root/testdata/sf0.001"

# columns that must surface as TimestampType after read_table, per table
EXPECTED_TS_COLS = {
    "events": ["ts"],
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
    "documents": [],
    "embeddings": [],
    "region": [],
    "nation": [],
    "customer": [],
    "supplier": [],
    "part": [],
}


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata absent")
def test_read_table_normalizes_every_timestamp(spark):
    for name, want_ts in EXPECTED_TS_COLS.items():
        path = os.path.join(SF_DIR, f"{name}.parquet")
        if not os.path.exists(path):
            pytest.fail(f"driver table {name} missing from {SF_DIR}")
        df = read_table(spark, SF_DIR, name)
        fields = {f.name: f.dataType for f in df.schema.fields}
        for col in want_ts:
            # date-typed is acceptable for date-semantics columns; what is
            # NOT acceptable is NTZ (unix_micros rejects) or raw long
            assert col in fields, f"{name}.{col} disappeared from testdata"
            dt = fields[col]
            assert not isinstance(dt, T.TimestampNTZType), (
                f"{name}.{col} surfaced as TIMESTAMP_NTZ — read_table must "
                "normalize it (see session.normalize_timestamps)"
            )
            assert isinstance(dt, (T.TimestampType, T.DateType)), (
                f"{name}.{col} is {dt}, expected TimestampType/DateType "
                "after normalization — testdata encoding drifted again?"
            )
        # no column in ANY table may remain NTZ
        for col, dt in fields.items():
            assert not isinstance(dt, T.TimestampNTZType), (
                f"{name}.{col} is TIMESTAMP_NTZ after read_table"
            )


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata absent")
def test_events_ts_values_are_sane(spark):
    """The normalized ts must land in the generator's era (not 1970 — the
    symptom of treating µs as ns), and unix_micros must work on it."""
    from pyspark.sql import functions as F

    df = read_table(spark, SF_DIR, "events")
    row = df.select(
        F.min(F.unix_micros("ts")).alias("lo"), F.max(F.unix_micros("ts")).alias("hi")
    ).collect()[0]
    # 2000-01-01 .. 2100-01-01 in µs
    assert 946_684_800_000_000 < row["lo"] <= row["hi"] < 4_102_444_800_000_000, (
        f"events.ts range [{row['lo']}, {row['hi']}] µs is outside any "
        "plausible generator era — unit mix-up (ns-vs-µs) in the load path?"
    )
