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
    """
    salted = salt(df, key, buckets)
    partial = salted.groupBy("_salted_key").agg(
        *[expr.alias(f"_p_{name}") for name, (expr, _) in aggs.items()])
    final = (partial
             .withColumn(key, unsalt("_salted_key"))
             .groupBy(key)
             .agg(*[fn(F.col(f"_p_{name}")).alias(name)
                    for name, (_, fn) in aggs.items()]))
    return final


def rebalance_by_cost(df: DataFrame, cost_col: str = "n_tok",
                      num_partitions: int | None = None,
                      cfg: EngineConfig = DEFAULT_CONFIG) -> DataFrame:
    """Range-repartition on a shuffled-within-cost-tier key so heavy rows
    spread across partitions instead of clumping.

    ``repartitionByRange`` on (cost_bucket, random-ish hash) puts the
    long-tail docs (n_tok >= cfg.long_tail_ntok) into their own key space,
    striped across partitions; short docs pack densely. One shuffle, paid
    only when the caller knows the downstream map is cost-skewed.
    """
    n = num_partitions or cfg.shuffle_partitions
    tier = (F.col(cost_col) >= cfg.long_tail_ntok).cast("int")
    return (df.withColumn("_tier", tier)
              .withColumn("_stripe", F.pmod(F.hash("doc_id"), F.lit(n)))
              .repartitionByRange(n, "_tier", "_stripe")
              .drop("_tier", "_stripe"))
