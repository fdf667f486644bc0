"""The import-time oracle replay helpers (_lttb_oracle_values,
_refine_oracle, _pq_oracle, _bpe_oracle_values) must be LOUD: they may
return None only when the corpus file is genuinely absent — any failure
while the corpus exists must raise, because a silent None removes the
arm from BOTH the engine and oracle sides and CORRECTNESS stays
all-green with quietly smaller coverage (round-9 VERDICT finding #2).

No SparkSession needed; these run driver-local."""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entry_mod

CORPUS = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


def test_absent_corpus_disables_quietly(tmp_path):
    assert entry_mod._lttb_oracle_values(16, str(tmp_path)) is None
    assert entry_mod._refine_oracle(str(tmp_path)) is None
    assert entry_mod._pq_oracle(str(tmp_path)) is None
    assert entry_mod._bpe_oracle_values(str(tmp_path)) is None


def test_lttb_broken_replay_raises(monkeypatch):
    """A corpus that exists but whose replay breaks must raise, not
    disable: monkeypatch the kernel the replay calls to blow up."""
    import cnosdb_spark.operators.downsample as ds

    def boom(*a, **k):
        raise RuntimeError("replay broken")

    monkeypatch.setattr(ds, "_lttb_numpy", boom)
    with pytest.raises(RuntimeError, match="replay broken"):
        entry_mod._lttb_oracle_values(16, CORPUS)


def test_refine_broken_replay_raises(monkeypatch):
    import cnosdb_spark.operators.similarity  # noqa: F401  (imported by helper)
    import duckdb

    def boom(*a, **k):
        raise RuntimeError("duckdb broken")

    monkeypatch.setattr(duckdb, "connect", boom)
    with pytest.raises(RuntimeError, match="duckdb broken"):
        entry_mod._refine_oracle(CORPUS)


def test_lttb_arm_refuses_mismatched_sf_dir(spark, tmp_path):
    """The keep-set literal was replayed against _LTTB_CORPUS at import;
    calling ts_value_fill_repair with a different sf_dir must fail loudly
    instead of joining the keep-set against the wrong corpus (spurious
    mismatches would be silent-in-cause)."""
    if not entry_mod._LTTB_ORACLE:
        pytest.skip("lttb arm disabled (corpus absent)")
    other = tmp_path / "sfX"
    other.mkdir()
    # needs an events.parquet for the loader not to fail first? No —
    # the guard fires before any read of sf_dir's events for the arm;
    # but _t() reads events for the other arms, so copy the real one.
    import shutil

    shutil.copy(
        os.path.join(CORPUS, "events.parquet"), other / "events.parquet"
    )
    with pytest.raises(RuntimeError, match="lttb arm oracle"):
        entry_mod.queries()["ts_value_fill_repair"](spark, str(other))
