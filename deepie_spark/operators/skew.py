"""Skew handling: salting + two-phase aggregation.

Hub entities (a person/company mentioned on millions of pages)
concentrate shuffle keys in canonicalization joins and entity-count
aggregations.  The north rule requires explicit handling; two tools:

  - ``salted_count`` / ``two_phase_agg``: partial aggregate on
    (key, salt) then final on key — caps any one reducer's input at
    1/n_salts of the hub's rows.
  - ``salted_join``: explode the small/dim side n_salts times and salt
    the fact side, so one hot key spreads over n_salts reducers.

AQE skew-join splitting (enabled in session.py) covers sort-merge
joins at runtime; the explicit salt is for aggregations (where AQE
does not help) and for deterministic plans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int = 16, col_name: str = "_salt") -> DataFrame:
    """Deterministic pseudo-random salt derived from the whole row where
    possible: monotonically varying partition-local id keeps it cheap
    and shuffle-free."""
    return df.withColumn(
        col_name,
        F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int"),
    )


def salted_count(df: DataFrame, key_cols: list[str], n_salts: int = 16) -> DataFrame:
    """groupBy(key).count() resistant to hot keys: partial count on
    (key, salt), final sum on key."""
    partial = (
        with_salt(df, n_salts)
        .groupBy(*key_cols, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
    )
    return partial.groupBy(*key_cols).agg(F.sum("_partial").alias("count"))


def two_phase_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, Column],
    finals: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """Generic salted two-phase aggregation.

    ``aggs``: partial aggregate expressions (over raw rows);
    ``finals``: final expressions over the partial columns."""
    partial = (
        with_salt(df, n_salts)
        .groupBy(*key_cols, "_salt")
        .agg(*[expr.alias(name) for name, expr in aggs.items()])
    )
    return partial.groupBy(*key_cols).agg(
        *[expr.alias(name) for name, expr in finals.items()]
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``fact`` has hot keys: dim is exploded n_salts
    times, fact rows get a deterministic salt, join key becomes
    (key, salt).  Dim grows n_salts x — use for small/medium dims that
    are still too big (or too hot) to broadcast."""
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    salted_fact = with_salt(fact, n_salts)
    out = salted_fact.join(salted_dim, [key, "_salt"], how)
    return out.drop("_salt")
