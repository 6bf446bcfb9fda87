"""Skew mitigation for joins: salting.

AQE's skew-join handles sort-merge skew automatically
(spark.sql.adaptive.skewJoin.enabled); salting is the explicit tool for
the cases AQE can't split — e.g. a broadcast-unfriendly dimension keyed
by a power-law column (user_id with a few whales), or aggregations.

`salted_join(facts, dims, key, n_salts)`:
  facts gain a random-ish but DETERMINISTIC salt (hash of a row id mod
  n_salts), dims are replicated n_salts times; the join key becomes
  (key, salt) so one hot key spreads over n_salts reducer partitions.
Result is row-identical to the plain join (asserted in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    facts: DataFrame,
    dims: DataFrame,
    key: str,
    n_salts: int = 8,
    salt_source: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join. `salt_source` names a fact column whose
    hash derives the salt (deterministic, no rand() -> stable across
    retries/speculative tasks, which rand() is NOT)."""
    src = F.col(salt_source) if salt_source else F.monotonically_increasing_id()
    salted_facts = facts.withColumn(
        "_salt", F.pmod(F.xxhash64(src), F.lit(n_salts)).cast("int")
    )
    salted_dims = dims.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted_facts.join(salted_dims, [key, "_salt"], how)
    return out.drop("_salt")


def salted_count(df: DataFrame, key: str, n_salts: int = 8) -> DataFrame:
    """Two-phase skewed count: partial count on (key, salt), then final
    sum on key — the map-side combine Spark already does for counts, but
    explicit for aggregates that would otherwise see one hot reducer
    (e.g. collect_list-ish payloads).

    The salt must vary WITHIN a key (a hash of the key itself is
    constant per key and spreads nothing), so it is derived from
    monotonically_increasing_id. NOTE: that id is only best-effort
    stable — if an upstream stage recomputes with a different row
    order (shuffle nondeterminism, task retry), rows can land in
    different salt groups. That is harmless HERE because a count is
    salt-invariant (any partition of the rows sums to the same total),
    but do NOT copy this pattern into salt-sensitive aggregates; for
    those, pass an explicit value-derived salt column the way
    `salted_join(salt_source=...)` does."""
    return (
        df.withColumn(
            "_salt",
            F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts)).cast("int"),
        )
        .groupBy(key, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
        .groupBy(key)
        .agg(F.sum("_partial").alias("n"))
    )
