"""Feature post-processing: group-wise normalization, quantile binning,
rolling window statistics — the standard feature-store transforms applied
downstream of extract_features_df before ML ingest.

All pure Catalyst (window specs + built-in aggregates): no Python, no
extra scans — each transform is one window or one groupBy+broadcast-join
over the features table.

Scale notes (10^12 rows):
- zscore/minmax by group: ONE aggregation shuffle on the (few) group keys,
  stats broadcast back onto the table — never a per-row window over the
  whole corpus (a global window spec would single-task each group);
- quantile_bins: exact ntile needs a total sort per group — provided for
  oracle parity; the scale path is approx_bins (percentile_approx cutoffs
  computed in one agg, broadcast, then a pure projection via array
  binary-search semantics);
- rolling_stats: per-entity event-time windows (rowsBetween), the same
  shape as pit.moving_avg — shuffle on the entity key only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F


def _join_group_stats(df: DataFrame, stats: DataFrame,
                      by: str | None) -> DataFrame:
    """Broadcast-join group stats back onto the table. NULL-SAFE on the
    group key: groupBy keeps a null-key group, and a plain equi-join would
    silently DROP every null-key row (null = null never matches) — rows
    with a missing group key must keep their own group's stats."""
    if not by:
        return df.crossJoin(F.broadcast(stats))
    stats = stats.withColumnRenamed(by, "_stats_key")
    return (df.join(F.broadcast(stats),
                    on=F.col(by).eqNullSafe(F.col("_stats_key")))
            .drop("_stats_key"))


def zscore(df: DataFrame, cols: list[str], by: str | None = None,
           suffix: str = "_z") -> DataFrame:
    """Per-group z-score: (x - mean) / stddev_pop, 0.0 where the group is
    constant (stddev 0 — the convention that keeps downstream ML finite);
    null inputs stay null. Group stats come from ONE groupBy (map-side
    partial) and broadcast back (null group keys form their own group);
    with ``by=None`` normalizes globally."""
    keys = [by] if by else []
    aggs = []
    for c in cols:
        aggs += [F.avg(c).alias(f"_m_{c}"), F.stddev_pop(c).alias(f"_s_{c}")]
    stats = df.groupBy(*keys).agg(*aggs)
    joined = _join_group_stats(df, stats, by)
    out_cols = [joined[c] for c in df.columns]
    for c in cols:
        # null input -> null output (a missing measurement must not become
        # an at-mean 0.0 — the same contract as approx_bins); the 0.0
        # fallback applies only to NON-null values in constant groups
        z = F.when(F.col(c).isNull(), F.lit(None).cast("double")) \
             .when(F.col(f"_s_{c}") > 0,
                   (F.col(c) - F.col(f"_m_{c}")) / F.col(f"_s_{c}")) \
             .otherwise(F.lit(0.0))
        out_cols.append(z.alias(f"{c}{suffix}"))
    return joined.select(*out_cols)


def minmax(df: DataFrame, cols: list[str], by: str | None = None,
           suffix: str = "_mm") -> DataFrame:
    """Per-group min-max scaling to [0, 1]; 0.0 where the group is
    constant; null inputs stay null. Same null-safe one-agg + broadcast
    shape as zscore."""
    keys = [by] if by else []
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"_lo_{c}"), F.max(c).alias(f"_hi_{c}")]
    stats = df.groupBy(*keys).agg(*aggs)
    joined = _join_group_stats(df, stats, by)
    out_cols = [joined[c] for c in df.columns]
    for c in cols:
        rng = F.col(f"_hi_{c}") - F.col(f"_lo_{c}")
        mm = F.when(F.col(c).isNull(), F.lit(None).cast("double")) \
              .when(rng > 0, (F.col(c) - F.col(f"_lo_{c}")) / rng) \
              .otherwise(F.lit(0.0))
        out_cols.append(mm.alias(f"{c}{suffix}"))
    return joined.select(*out_cols)


def quantile_bins(df: DataFrame, col: str, n_bins: int,
                  by: str | None = None,
                  out_col: str | None = None,
                  tiebreak: list[str] | None = None) -> DataFrame:
    """EXACT equal-count binning via ntile — oracle-parity form (ntile is
    a total sort per group; at 10^12 rows use approx_bins). Bin ids are
    0-based. Pass ``tiebreak`` columns to pin the order of equal values
    (required for cross-engine determinism: NTILE assigns by position, so
    unpinned ties land in engine-dependent bins)."""
    out_col = out_col or f"{col}_bin"
    order = [F.col(col).asc()] + [F.col(c).asc() for c in (tiebreak or [])]
    w = (Window.partitionBy(by) if by else Window.partitionBy()) \
        .orderBy(*order)
    return df.withColumn(out_col, F.ntile(n_bins).over(w) - 1)


def approx_bins(df: DataFrame, col: str, n_bins: int,
                by: str | None = None, out_col: str | None = None,
                relative_error: float = 0.001) -> DataFrame:
    """Scale path for quantile binning: percentile_approx cutoffs
    (Greenwald-Khanna sketch, one agg shuffle) broadcast back, bin id =
    count of interior cutoffs STRICTLY BELOW the value (a pure array
    projection). Strict ``>`` matters: GK cutoffs are actual data values,
    so ``>=`` would push every cutoff-equal row one bin high — on a
    tie-heavy column the majority value would land in the TOP bin with
    the low bins empty, the opposite of equal-count intent. Bins are
    approximately equal-count; ids 0-based, monotone in the value; null
    values propagate null (not bin 0)."""
    out_col = out_col or f"{col}_bin"
    keys = [by] if by else []
    qs = [i / n_bins for i in range(1, n_bins)]
    cuts = df.groupBy(*keys).agg(
        F.percentile_approx(col, qs, int(1 / relative_error)).alias("_cuts"))
    joined = _join_group_stats(df, cuts, by)
    bin_id = F.when(
        F.col(col).isNull(), F.lit(None).cast("int")
    ).otherwise(F.aggregate(
        "_cuts", F.lit(0),
        lambda acc, cut: acc + F.when(F.col(col) > cut, 1).otherwise(0)))
    return joined.select(*[joined[c] for c in df.columns],
                         bin_id.alias(out_col))


def rolling_stats(df: DataFrame, key: str, ts: str, value: str,
                  window_rows: int = 3,
                  tiebreak: list[str] | None = None) -> DataFrame:
    """Per-entity trailing-window statistics over event time: mean, std,
    min, max of the last ``window_rows`` rows (current inclusive) — the
    classic point-in-time-safe rolling features (only PAST rows enter the
    frame, so no temporal leakage by construction). Pass ``tiebreak``
    columns when an entity can carry duplicate timestamps — an unpinned
    rowsBetween frame over tied rows is ordered engine/run-dependently."""
    w = (Window.partitionBy(key)
         .orderBy(F.col(ts).asc(),
                  *[F.col(c).asc() for c in (tiebreak or [])])
         .rowsBetween(-(window_rows - 1), 0))
    return df.select(
        "*",
        F.avg(value).over(w).alias(f"{value}_roll_mean"),
        F.coalesce(F.stddev_pop(value).over(w), F.lit(0.0))
         .alias(f"{value}_roll_std"),
        F.min(value).over(w).alias(f"{value}_roll_min"),
        F.max(value).over(w).alias(f"{value}_roll_max"))


def pack_sequences(df: DataFrame, budget: int,
                   len_col: str = "n_tok", id_col: str = "doc_id",
                   n_groups: int = 64) -> DataFrame:
    """Deterministic sequence packing: assign each doc to a fixed
    token-budget pack (the pretraining batch-prep step that concatenates
    documents into context-window-sized examples, cutting padding waste).

    Greedy OFFSET packing: within a packing group, docs are laid out
    end-to-end in (len desc, id) order; a doc starting at running offset
    ``o`` lands in pack ``floor(o / budget)``. Deterministic pure integer
    arithmetic — re-runs, other engines, and the SQL oracle produce the
    identical layout. A pack's content can overflow ``budget`` by at
    most (longest member - 1) tokens where a doc straddles a boundary;
    length-descending order keeps stragglers short, and callers that
    need hard caps split/truncate straddlers downstream (a policy, not
    a layout, decision). Docs longer than ``budget`` span several packs
    and are returned with their start pack.

    Scale shape: a GLOBAL greedy pack is a sequential fold — instead the
    corpus is salted into ``n_groups`` independent packing groups by the
    engine's avalanche hash (md5 -> poly fold at full 2^31-1 resolution,
    DuckDB-reproducible — NOT sampling._bucket, whose mod-10000 bucket
    space would cap the real group count at 10000 and skew sizes for
    non-divisor n_groups), and each group packs under one window sort.
    Groups are embarrassingly parallel and pack ids are (group, pack)
    pairs; at 10^12 docs raise ``n_groups`` (any value < ~2^31) so each
    group's window partition stays executor-sized. One Exchange on the
    group key.

    Returns (id_col, len, group, pack, offset): ``offset`` is the doc's
    start inside its group's layout (offset % budget = position inside
    the pack, when it does not straddle)."""
    from .dedup import poly_hash_expr

    grp = F.expr(poly_hash_expr(f"md5({id_col})")) % n_groups
    win = (Window.partitionBy("group")
           .orderBy(F.desc(len_col), F.asc(id_col)))
    return (df
            .select(F.col(id_col), F.col(len_col).cast("bigint"),
                    grp.cast("int").alias("group"))
            .withColumn("offset",
                        F.coalesce(F.sum(len_col).over(
                            win.rowsBetween(Window.unboundedPreceding, -1)),
                            F.lit(0).cast("bigint")))
            .withColumn("pack",
                        F.floor(F.col("offset") / F.lit(int(budget)))
                        .cast("bigint")))


def pack_stats(packed: DataFrame, budget: int,
               len_col: str = "n_tok") -> DataFrame:
    """Per-pack utilization over pack_sequences output: (group, pack,
    n_docs, n_tokens, fill_frac). ``fill_frac`` > 1 marks boundary
    straddlers (see pack_sequences overflow bound). One partially-
    aggregated groupBy on the (group, pack) key."""
    return (packed.groupBy("group", "pack")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(len_col).alias("n_tokens"))
            .withColumn("fill_frac",
                        F.round(F.col("n_tokens") /
                                F.lit(float(budget)), 6)))


def pack_examples(df: DataFrame, budget: int,
                  tokens_col: str = "tokens", id_col: str = "doc_id",
                  n_groups: int = 64) -> DataFrame:
    """Materialize pack_sequences: one row per pack with the member
    docs' token ids concatenated in layout order — the training-example
    writer step downstream of packing. Returns (group, pack, doc_ids,
    input_ids, n_docs, n_tokens); a doc belongs wholly to the pack its
    offset starts in (boundary straddlers stay intact — chunking or
    truncating to a hard ``budget`` is the trainer's policy, applied to
    ``input_ids`` downstream).

    All JVM: pack assignment joins back to the token table on
    ``id_col`` (the join reuses nothing heavier than the packing
    Exchange), then ONE groupBy(group, pack) whose aggregate is
    collect_list(struct(offset, ...)) -> array_sort -> flatten, so
    within-pack order is the deterministic layout order, not arrival
    order. Pack payloads are bounded by ``budget`` + the longest
    STRADDLING doc (a doc longer than ``budget`` belongs wholly to its
    start pack, so the true bound is budget + max doc length, not
    budget alone — pre-chunk over-budget docs upstream when hard caps
    matter); with sane corpora that state stays executor-tiny."""
    lens = df.select(F.col(id_col),
                     F.size(tokens_col).alias("_n_tok"))
    packed = pack_sequences(lens, budget, len_col="_n_tok",
                            id_col=id_col, n_groups=n_groups)
    joined = packed.join(df.select(id_col, tokens_col), on=id_col)
    members = F.array_sort(F.collect_list(
        F.struct(F.col("offset"), F.col(id_col).alias("_id"),
                 F.col(tokens_col).alias("_toks"))))
    return (joined.groupBy("group", "pack")
            .agg(members.alias("_m"))
            .select(
                "group", "pack",
                F.expr("transform(_m, x -> x._id)").alias("doc_ids"),
                F.flatten(F.expr("transform(_m, x -> x._toks)"))
                .alias("input_ids"))
            .withColumn("n_docs", F.size("doc_ids"))
            .withColumn("n_tokens", F.size("input_ids")))
