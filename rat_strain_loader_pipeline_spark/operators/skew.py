"""Skew mitigation beyond AQE.

AQE's skew-join splitting (on in `session.py`) handles most hot keys at
runtime by splitting oversized shuffle partitions — prefer it. Salting
is for the cases AQE cannot reach:

- the join output feeds a window/groupBy on the SAME hot key, so the
  downstream stage re-concentrates the key anyway unless pre-split;
- deliberate pre-partitioned layouts (bucketed stores) where a runtime
  re-plan is off the table;
- hot-key replication for broadcast-ineligible medium dimensions.

``salted_join`` keeps determinism: fact rows scatter by a hash of their
own columns (no randomness — retry-safe, plan-stable), the smaller side
replicates ``n_salts`` ways. Output equals the unsalted join exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    keys: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with salt-split hot keys: ``fact`` scatters into
    ``n_salts`` sub-keys deterministically, ``dim`` replicates each row
    ``n_salts`` times, the join runs on ``keys + [salt]``.

    Supported ``how``: inner / left / left_semi / left_anti (the fact
    side is preserved; right/full would need dim-side de-replication).
    Replication multiplies the dim shuffle by ``n_salts`` — use for
    medium dimensions with hot fact keys, not for huge dim sides.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(f"salted_join does not support how={how!r}")
    fact_salt = F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(n_salts)).cast(
        "int"
    )
    f = fact.withColumn(_SALT, fact_salt)
    d = dim.withColumn(_SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    return f.join(d, keys + [_SALT], how).drop(_SALT)


def salt_distribution(df: DataFrame, keys: list[str], n_salts: int = 8) -> DataFrame:
    """Diagnostic: rows per (key, salt) bucket — verify a hot key
    actually splits before committing to a salted plan."""
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts)).cast("int")
    return df.withColumn(_SALT, salt).groupBy(*keys, _SALT).count()
