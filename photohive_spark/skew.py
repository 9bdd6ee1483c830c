"""Skew handling: salting + cost-aware repartitioning.

North_rule demands explicit skew handling for the long-tail ``n_tok``
distribution (feature-extraction cost is O(n_tok log n_tok), so a handful
of million-token docs can pin one task while thousands of short docs
finish). Two tools:

- ``salt``/``unsalt``: classic key salting for hot groupBy/join keys;
- ``rebalance_by_cost``: repartitionByRange on a *cost proxy* column so
  each partition carries roughly equal work, not equal rows — the
  distributed analog of the reference's single-image threading setup
  (``src/utilities.c:127-129``) which has no multi-item balancing at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

from .config import DEFAULT_CONFIG, EngineConfig


def salt(df: DataFrame, key: str, buckets: int,
         salted_name: str = "_salted_key") -> DataFrame:
    """Append a deterministic salt to a hot key: ``key || '#' || pmod(hash(
    monotonically_increasing_id), buckets)``. Aggregations then run
    two-stage: groupBy(salted) partial -> groupBy(key) final."""
    return df.withColumn(
        salted_name,
        F.concat_ws("#", F.col(key),
                    F.pmod(F.hash(F.monotonically_increasing_id()),
                           F.lit(buckets)).cast("string")))


def unsalt(col_name: str):
    """Recover the original key from a salted key column."""
    return F.substring_index(F.col(col_name), "#", 1)


def two_stage_agg(df: DataFrame, key: str, buckets: int, aggs: dict):
    """Salted two-stage aggregation for additive aggregates.

    ``aggs`` maps output name -> (partial_expr, final_fn) where partial_expr
    is applied in the salted stage and final_fn recombines. Example:
    ``{"cnt": (F.count("*"), F.sum), "total": (F.sum("x"), F.sum)}``.

    The salt lives in its own column (never string-concatenated into the
    key), so keys containing the salt separator can't be merged.
    """
    salted = df.withColumn(
        "_salt_bucket",
        F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(buckets)))
    partial = salted.groupBy(key, "_salt_bucket").agg(
        *[expr.alias(f"_p_{name}") for name, (expr, _) in aggs.items()])
    final = (partial
             .groupBy(key)
             .agg(*[fn(F.col(f"_p_{name}")).alias(name)
                    for name, (_, fn) in aggs.items()]))
    return final


def rebalance_by_cost(df: DataFrame, cost_col: str = "n_tok",
                      num_partitions: int | None = None,
                      cfg: EngineConfig = DEFAULT_CONFIG) -> DataFrame:
    """Spread heavy rows across partitions so no task pins on the long tail.

    Hash-repartition on a per-row stripe key: each doc (heavy or light)
    lands in a pseudo-random partition, so the handful of long-tail docs
    (n_tok >= cfg.long_tail_ntok) are spread ~uniformly instead of
    clumping wherever the input file layout put them. (A range partition
    on a cost tier would do the OPPOSITE — sort all heavy rows into the
    same final range.) One shuffle, paid only when the caller knows the
    downstream map is cost-skewed; AQE cannot fix map-side cost skew
    because row counts look balanced.
    """
    n = num_partitions or cfg.shuffle_partitions
    stripe = F.pmod(F.hash(F.col("doc_id"), F.col(cost_col)), F.lit(n))
    return (df.withColumn("_stripe", stripe)
              .repartition(n, "_stripe")
              .drop("_stripe"))
