"""Skew-salted equi-join (engine-new; the join-side companion of the
salted aggregation in operators/lineage.py::salted_agg — the brief's
"salting for skew" applied to big-big joins).

When one join key is hot (a boilerplate domain, a null-ish default, one
giant publisher), a plain shuffle join sends the whole hot key to ONE
reducer and the stage runs at the speed of that task.  ``salted_join``
splits every left row onto one of ``n_salt`` sub-keys via a deterministic
row hash and replicates each right row onto all ``n_salt`` sub-keys, so
the join key becomes (key, salt) and the hot key fans out over ``n_salt``
tasks.  Cost: the right side shuffles ``n_salt``x — use it when BOTH
sides are too big to broadcast and the left carries the skew; broadcast
stays the right plan for dimension-sized right sides, and AQE's
skew-join split (when its thresholds trigger) needs no code change.

Output equality with the plain join holds for ``inner`` and ``left``
joins: every left row carries exactly one salt, and its key's right
matches exist on every salt replica, so matches and non-matches are
preserved 1:1 (NULL keys never match, exactly as in the unsalted join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(left: DataFrame, right: DataFrame, on: str,
                n_salt: int = 8, how: str = "inner") -> DataFrame:
    """Equi-join ``left`` and ``right`` on column ``on`` with the hot-key
    shuffle spread over ``n_salt`` sub-keys.  Supports ``inner`` and
    ``left`` joins (the shapes where per-left-row salting is lossless)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]),
                  F.lit(n_salt)).cast("int")
    l = left.withColumn("_salt", salt)
    r = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))))
    return l.join(r, [on, "_salt"], how).drop("_salt")
