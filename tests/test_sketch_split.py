"""CountMin sketch (photohive_spark.sketch) and the PIT temporal-split /
leakage-audit operators (pit.temporal_split, pit.leakage_audit)."""

from collections import Counter
from datetime import datetime

import numpy as np
import pytest

import pyspark.sql.functions as F

from photohive_spark import pit, sketch


# ---------------------------------------------------------------------------
# CountMin
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def tok_df(spark):
    rng = np.random.default_rng(11)
    rows = []
    for i in range(200):
        n = int(rng.integers(0, 40))         # includes empty docs
        rows.append((str(i), [int(t) for t in
                              rng.zipf(1.5, n).clip(max=50256)]))
    return spark.createDataFrame(rows, "doc_id string, tokens array<int>")


def _true_counts(tok_df):
    c = Counter()
    for r in tok_df.collect():
        c.update(r.tokens)
    return c


def test_countmin_shape_and_mass(tok_df):
    cms = sketch.countmin(tok_df, depth=4, width=64).collect()
    true = _true_counts(tok_df)
    n_total = sum(true.values())
    assert len(cms) <= 4 * 64
    per_depth = Counter()
    for r in cms:
        assert 0 <= r.bucket < 64 and 0 <= r.d < 4
        per_depth[r.d] += r.cnt
    # every depth row sees the whole stream exactly once
    assert all(per_depth[d] == n_total for d in range(4)), per_depth


def test_cms_estimate_one_sided_and_bounded(tok_df):
    """CMS guarantee: never undercounts; overcount <= (e/width)*N with
    prob >= 1 - e^-depth — at depth 4 a single probe set of 12 tokens
    blowing the bound would be a ~2% event, so assert the bound plus
    one-sidedness (the deterministic half of the guarantee)."""
    true = _true_counts(tok_df)
    n_total = sum(true.values())
    cms = sketch.countmin(tok_df, depth=4, width=64)
    probe = [1, 2, 3, 5, 17, 100, 999, 4242, 50256, 7, 11, 13]
    est = {r.token: r.est
           for r in sketch.cms_estimate(cms, probe, depth=4, width=64
                                        ).collect()}
    assert set(est) == {int(t) for t in probe}
    bound = np.e / 64 * n_total
    for t in probe:
        assert est[t] >= true.get(t, 0), (t, est[t], true.get(t, 0))
        assert est[t] <= true.get(t, 0) + bound, (t, est[t], true.get(t, 0))


def test_cms_merge_equals_whole(spark, tok_df):
    """Mergeability: sketch(A) + sketch(B) == sketch(A union B), cell by
    cell — the property that makes per-day / per-stream sketches free to
    combine."""
    a = tok_df.where(F.col("doc_id").cast("int") < 100)
    b = tok_df.where(F.col("doc_id").cast("int") >= 100)
    merged = {(r.d, r.bucket): r.cnt
              for r in sketch.cms_merge(sketch.countmin(a, width=64),
                                        sketch.countmin(b, width=64)
                                        ).collect()}
    whole = {(r.d, r.bucket): r.cnt
             for r in sketch.countmin(tok_df, width=64).collect()}
    assert merged == whole


def test_countmin_rejects_nothing_but_empty_merge():
    with pytest.raises(ValueError):
        sketch.cms_merge()


def test_cms_negative_tokens_one_sided(spark):
    """xxhash64-style ids are signed — half of all hashed ids are
    negative. pmod bucketing must keep them in [0, width) and the probe
    side must find them (Spark '%' would put them in buckets the probe
    never reads, silently undercounting to 0)."""
    toks = [-(2**63) + 1, -9_876_543_210, -50256, -7, -1,
            0, 7, 2**62, 2**63 - 1]
    df = spark.createDataFrame([("d0", toks * 3)],
                               "doc_id string, tokens array<bigint>")
    cms = sketch.countmin(df, depth=4, width=64)
    for r in cms.collect():
        assert 0 <= r.bucket < 64, r
    est = {r.token: r.est
           for r in sketch.cms_estimate(cms, toks, depth=4, width=64
                                        ).collect()}
    for t in toks:
        assert est[int(t)] >= 3, (t, est[int(t)])


# ---------------------------------------------------------------------------
# temporal_split / leakage_audit
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ev_df(spark):
    rows = [(i, datetime(2024, 1, 1 + i), float(i)) for i in range(10)]
    return spark.createDataFrame(rows, "id int, ts timestamp_ntz, v double")


def test_temporal_split_labels_and_embargo(ev_df):
    out = {r.id: r.split
           for r in pit.temporal_split(ev_df, "ts", "2024-01-08 00:00:00",
                                       embargo_s=2 * 86400).collect()}
    # train: ts < 01-06; embargo [01-06, 01-08) dropped; val: ts >= 01-08
    assert out == {0: "train", 1: "train", 2: "train", 3: "train",
                   4: "train", 7: "val", 8: "val", 9: "val"}


def test_temporal_split_no_embargo_keeps_all(ev_df):
    out = pit.temporal_split(ev_df, "ts", "2024-01-08 00:00:00")
    assert out.count() == 10
    assert out.where(F.col("split") == "val").count() == 3


def test_temporal_split_no_shuffle(ev_df):
    plan = pit.temporal_split(ev_df, "ts", "2024-01-08 00:00:00") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_leakage_audit_clean_and_leaky(spark):
    probes = spark.createDataFrame(
        [(1, "a", datetime(2024, 1, 5)), (2, "a", datetime(2024, 1, 9)),
         (3, "b", datetime(2024, 1, 2))],
        "event_id int, k string, probe_ts timestamp_ntz")
    snaps = spark.createDataFrame(
        [("a", datetime(2024, 1, 4), 1.0), ("a", datetime(2024, 1, 8), 2.0),
         ("b", datetime(2024, 1, 7), 3.0)],
        "k string, snapshot_ts timestamp_ntz, val double")
    asof = pit.asof_join(probes, snaps, "k", "probe_ts", "snapshot_ts",
                         ["val"])
    clean = pit.leakage_audit(asof, "probe_ts", "matched_ts").collect()[0]
    # probe 3 ('b' at 01-02) has no prior snapshot -> unmatched, not a leak
    assert (clean.n_rows, clean.n_matched, clean.n_leaks,
            clean.max_lead_us) == (3, 2, 0, 0)

    naive = probes.join(
        snaps.groupBy("k").agg(F.max("snapshot_ts").alias("matched_ts")),
        on="k", how="left")
    leaky = pit.leakage_audit(naive, "probe_ts", "matched_ts").collect()[0]
    # probe 1 sees 01-08 (3 days ahead), probe 3 sees 01-07 (5 days ahead)
    assert (leaky.n_rows, leaky.n_matched, leaky.n_leaks) == (3, 3, 2)
    assert leaky.max_lead_us == 5 * 86400 * 1_000_000


def test_temporal_split_label_all_accounts_every_row(spark):
    """label_all=True: the audit form labels EVERY row — train / val /
    embargo / null_ts — and drops nothing, so counts reconcile exactly
    with what the filtering form keeps."""
    rows = [(i, datetime(2024, 1, 1 + i)) for i in range(10)]
    rows.append((99, None))                    # null event time
    df = spark.createDataFrame(rows, "id int, ts timestamp_ntz")
    labeled = pit.temporal_split(df, "ts", "2024-01-08 00:00:00",
                                 embargo_s=2 * 86400, label_all=True)
    out = {r.id: r.split for r in labeled.collect()}
    assert out == {0: "train", 1: "train", 2: "train", 3: "train",
                   4: "train", 5: "embargo", 6: "embargo",
                   7: "val", 8: "val", 9: "val", 99: "null_ts"}
    # filtering form == label_all form restricted to train/val
    kept = {r.id: r.split
            for r in pit.temporal_split(df, "ts", "2024-01-08 00:00:00",
                                        embargo_s=2 * 86400).collect()}
    assert kept == {k: v for k, v in out.items() if v in ("train", "val")}


def test_leakage_audit_empty_input_reports_zero(spark):
    """A zero-leak gate (assert n_leaks == 0) must pass on an EMPTY
    join result — sum over no rows is NULL in SQL; the audit coalesces
    it to 0."""
    df = spark.createDataFrame(
        [], "probe_ts timestamp_ntz, matched_ts timestamp_ntz")
    row = pit.leakage_audit(df, "probe_ts", "matched_ts").collect()[0]
    assert (row.n_rows, row.n_matched, row.n_leaks, row.max_lead_us) \
        == (0, 0, 0, 0)


def test_leakage_audit_group_cols(spark):
    df = spark.createDataFrame(
        [("x", datetime(2024, 1, 2), datetime(2024, 1, 1)),
         ("x", datetime(2024, 1, 2), datetime(2024, 1, 3)),
         ("y", datetime(2024, 1, 2), None)],
        "g string, probe_ts timestamp_ntz, matched_ts timestamp_ntz")
    out = {r.g: r for r in
           pit.leakage_audit(df, "probe_ts", "matched_ts",
                             group_cols=["g"]).collect()}
    assert (out["x"].n_leaks, out["x"].max_lead_us) == (1, 86400 * 1_000_000)
    assert (out["y"].n_matched, out["y"].n_leaks) == (0, 0)


# ---------------------------------------------------------------------------
# HLL distinct sketches
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def id_df(spark):
    rng = np.random.default_rng(3)
    rows = [(f"src{i % 3}", int(v)) for i, v in
            enumerate(rng.integers(0, 5000, 20000))]
    return spark.createDataFrame(rows, "source string, uid bigint")


def test_hll_estimate_within_error(id_df):
    est = sketch.hll_estimate(
        sketch.hll_distinct(id_df, "uid")).collect()[0].n_distinct
    true = id_df.select("uid").distinct().count()
    assert abs(est - true) / true < 0.05, (est, true)


def test_hll_grouped_and_merge_lossless(id_df):
    """Union of per-source sketches must equal the global sketch EXACTLY
    (HLL union is lossless — register-wise max), so sharded/daily
    sketching loses nothing vs one pass over everything."""
    per_src = sketch.hll_distinct(id_df, "uid", group_cols=["source"])
    assert per_src.count() == 3
    merged = sketch.hll_estimate(
        sketch.hll_merge(per_src.drop("source"))).collect()[0].n_distinct
    whole = sketch.hll_estimate(
        sketch.hll_distinct(id_df, "uid")).collect()[0].n_distinct
    assert merged == whole

    # two-table merge path (per-day sketches)
    a = sketch.hll_distinct(
        id_df.where(F.col("uid") % 2 == 0), "uid")
    b = sketch.hll_distinct(
        id_df.where(F.col("uid") % 2 == 1), "uid")
    two = sketch.hll_estimate(
        sketch.hll_merge(a, b)).collect()[0].n_distinct
    assert two == whole


def test_hll_partial_aggregation_in_plan(id_df):
    """Scale contract: the sketch agg must partial-aggregate map-side
    (each task emits one sketch object, the shuffle never moves keys)."""
    plan = sketch.hll_distinct(id_df, "uid") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "partial_hll_sketch_agg" in plan, plan


def test_temporal_split_label_all_unparseable_ts(spark):
    """A STRING ts column with a malformed value: the cast yields null,
    so the row has no usable event time and must be labeled 'null_ts' —
    not 'embargo' (classifying by the raw column's nullness would
    misreport it, inflating embargo_dropped even at embargo_s=0)."""
    df = spark.createDataFrame(
        [(1, "2024-01-02 00:00:00"), (2, "2024-01-09 00:00:00"),
         (3, "not a timestamp"), (4, None)],
        "id int, ts string")
    out = {r.id: r.split
           for r in pit.temporal_split(df, "ts", "2024-01-08 00:00:00",
                                       label_all=True).collect()}
    assert out == {1: "train", 2: "val", 3: "null_ts", 4: "null_ts"}
    # filtering form agrees: both unusable rows dropped
    kept = {r.id for r in
            pit.temporal_split(df, "ts", "2024-01-08 00:00:00").collect()}
    assert kept == {1, 2}
