"""Skewed-key join handling.

First line of defense at scale is AQE's runtime skew-join splitting
(``spark.sql.adaptive.skewJoin.enabled``, on by default in our bench/test
configs) — it needs no code.  ``salted_join`` is the explicit fallback for
the cases AQE can't fix: a broadcast-ineligible dimension joined on a key
where a handful of values dominate (the classic null/`unknown`/celebrity
hot keys), or engines/versions where AQE is off.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(skewed: DataFrame, other: DataFrame, on: list[str],
                how: str = "inner", n_salt: int = 16,
                seed: int = 42) -> DataFrame:
    """Equi-join where ``skewed``'s join keys are heavily skewed.

    The skewed side gets a uniform random salt in [0, n_salt); the other
    side is replicated n_salt times (explode of a literal array — stays
    JVM-side, no shuffle of its own).  Joining on keys+salt splits each hot
    key's row group across n_salt reducers.  Result is identical to the
    unsalted join for 'inner' and 'left' (each skewed row pairs with every
    match exactly once, via its single salt value).

    Cost model: replicates ``other`` n_salt× — use when other is much
    smaller than the skewed side but too big (or too mid-plan) to
    broadcast.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner'|'left' "
                         "(right/full would need salting the other side)")
    salt_vals = F.array(*[F.lit(i) for i in range(n_salt)])
    skewed_s = skewed.withColumn(
        "__salt", (F.rand(seed) * n_salt).cast("int"))
    other_s = other.withColumn("__salt", F.explode(salt_vals))
    return skewed_s.join(other_s, on + ["__salt"], how).drop("__salt")
