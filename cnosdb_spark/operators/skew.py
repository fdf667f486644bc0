"""Skew-mitigation join helper: deterministic key salting.

AQE's skew-join splitting (on in session.py) handles most skew by
splitting oversized shuffle partitions AFTER materialization.  Salting
attacks the problem earlier — the hot key never concentrates on one
task in the first place — and is the standard fix when one key carries
an extreme share (a null-ish sentinel, a mega-tenant) or when AQE's
post-hoc split can't help (e.g. the skewed side feeds an aggregation
that must co-group).

``salted_join`` spreads the SKEWED side across ``n_salts`` subkeys with
a deterministic hash of the row (reproducible across runs — no RNG) and
replicates the other side once per salt, then equi-joins on
(key, salt).  Replication multiplies the small side by ``n_salts`` —
use only when that side is join-key-unique-ish and small relative to
the hot key's row count.  Inner and left (skewed-side-preserving) joins
only: the replicated side would emit one NULL-padded row PER SALT for
right/full outer semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str | list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join ``skewed`` (the side with hot keys) to ``other`` on ``on``,
    spreading each key over ``n_salts`` shuffle subkeys.

    Output columns = the plain ``skewed.join(other, on, how)`` result
    (salt columns dropped); row multiset identical to the unsalted join.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left joins, got {how!r} — the "
            "replicated side breaks right/full outer NULL-padding"
        )
    keys = [on] if isinstance(on, str) else list(on)
    # deterministic per-row spread: hash of ALL skewed columns (not just
    # the key — hashing only the key would put every hot-key row in the
    # same salt bucket and defeat the point) MIXED with a per-row ordinal
    # (monotonically_increasing_id) so even fully-duplicated rows — the
    # sentinel/default-row case where every column is identical — still
    # spread across salts.  The ordinal depends on partition layout and
    # may change under stage retry/recomputation, so _salt itself is NOT
    # stable across runs — never key anything durable off it.  The join
    # RESULT is salt-value-independent (the other side is replicated for
    # every salt), so the output multiset is reproducible regardless.
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in skewed.columns], F.monotonically_increasing_id()),
        F.lit(n_salts),
    )
    s = skewed.withColumn("_salt", salt.cast("int"))
    o = other.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    out = s.join(o, keys + ["_salt"], how)
    return out.drop("_salt")
