"""Driver-gate mimic: every queries() entry with an oracle must match DuckDB
at sf0.01 (row count + schema + order-insensitive values); entries without
an oracle must at least run and return a stable schema."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from .conftest import SF_DIR
from .oracle import compare

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()

WITH_ORACLE = sorted(set(QUERIES) & set(ORACLES))
ROWS_ONLY = sorted(set(QUERIES) - set(ORACLES))


def test_every_oracle_has_query():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing, f"oracle_sql keys without queries(): {missing}"


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR)
    ddf = duck.execute(ORACLES[name]).df()
    errs = compare(sdf, ddf, name)
    assert not errs, "\n".join(errs)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, name):
    sdf = QUERIES[name](spark, SF_DIR)
    n = sdf.count()
    assert n >= 0
    assert len(sdf.columns) > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


def test_registry_is_exactly_fifty():
    """The driver reports only the FIRST 50 registrations — more would
    silently drop rows from CORRECTNESS_r*, fewer wastes driver-verified
    coverage. Keep the registry at the cap by FOLDING, not appending."""
    assert len(QUERIES) == 50, f"registry has {len(QUERIES)} entries, expected 50"
