"""Feature post-processing transforms vs local pandas/numpy oracles."""

import numpy as np
import pandas as pd
import pytest
import pyspark.sql.functions as F

from photohive_spark import features


@pytest.fixture(scope="module")
def tbl(spark):
    rng = np.random.default_rng(5)
    rows = [(int(i), ["a", "b", "c"][i % 3], float(v), float(i % 7))
            for i, v in enumerate(rng.normal(10, 3, 200))]
    rows.append((200, "d", 5.0, 1.0))     # singleton group (stddev 0)
    rows.append((201, "d", 5.0, 1.0))     # constant group
    return spark.createDataFrame(
        rows, "id long, grp string, x double, y double")


def test_zscore_matches_pandas(tbl):
    got = {r.id: (r.x_z, r.y_z)
           for r in features.zscore(tbl, ["x", "y"], by="grp").collect()}
    pdf = tbl.toPandas()
    for g, sub in pdf.groupby("grp"):
        for c in ("x", "y"):
            m, s = sub[c].mean(), sub[c].std(ddof=0)
            for _, row in sub.iterrows():
                want = (row[c] - m) / s if s > 0 else 0.0
                assert got[row.id][0 if c == "x" else 1] == \
                    pytest.approx(want, abs=1e-12), (g, c, row.id)


def test_minmax_matches_pandas(tbl):
    got = {r.id: r.x_mm for r in features.minmax(tbl, ["x"], by="grp").collect()}
    pdf = tbl.toPandas()
    for _, sub in pdf.groupby("grp"):
        lo, hi = sub.x.min(), sub.x.max()
        for _, row in sub.iterrows():
            want = (row.x - lo) / (hi - lo) if hi > lo else 0.0
            assert got[row.id] == pytest.approx(want, abs=1e-12)
    assert all(0.0 <= v <= 1.0 for v in got.values())


def test_quantile_bins_exact(tbl):
    got = features.quantile_bins(tbl, "x", 4, by="grp")
    pdf = got.toPandas()
    for g, sub in pdf.groupby("grp"):
        counts = sub.x_bin.value_counts()
        assert set(counts.index) <= {0, 1, 2, 3}
        if len(sub) >= 4:
            assert counts.max() - counts.min() <= 1   # NTILE balance
        # monotone: higher bin never holds a smaller max value
        maxes = sub.groupby("x_bin").x.max()
        assert maxes.is_monotonic_increasing


def test_approx_bins_monotone_and_balanced(tbl):
    got = features.approx_bins(tbl, "x", 4, by="grp").toPandas()
    for g, sub in got.groupby("grp"):
        assert sub.x_bin.between(0, 3).all()
        maxes = sub.groupby("x_bin").x.max()
        assert maxes.is_monotonic_increasing
        if len(sub) >= 40:   # big groups: roughly equal-count
            counts = sub.x_bin.value_counts()
            assert counts.max() <= 2 * counts.min()


def test_approx_bins_broadcasts_cutoffs(tbl):
    plan = features.approx_bins(tbl, "x", 4, by="grp") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan


def test_rolling_stats_matches_pandas(spark):
    rng = np.random.default_rng(9)
    rows = [(f"u{i % 3}", int(i), float(v))
            for i, v in enumerate(rng.normal(0, 1, 60))]
    df = spark.createDataFrame(rows, "key string, ts long, v double")
    got = {(r.key, r.ts): (r.v_roll_mean, r.v_roll_std, r.v_roll_min,
                           r.v_roll_max)
           for r in features.rolling_stats(df, "key", "ts", "v",
                                           window_rows=3).collect()}
    pdf = pd.DataFrame(rows, columns=["key", "ts", "v"])
    for key, sub in pdf.sort_values("ts").groupby("key"):
        roll = sub.v.rolling(3, min_periods=1)
        for (ts, m, s, lo, hi) in zip(sub.ts, roll.mean(),
                                      roll.std(ddof=0), roll.min(),
                                      roll.max()):
            gm, gs, glo, ghi = got[(key, ts)]
            assert gm == pytest.approx(m, abs=1e-12)
            assert gs == pytest.approx(0.0 if np.isnan(s) else s, abs=1e-9)
            assert (glo, ghi) == (pytest.approx(lo), pytest.approx(hi))


def test_null_group_keys_not_dropped(spark):
    """Null group keys form their own group (null-safe stats join) —
    a plain equi-join would silently drop these rows."""
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 3.0), (3, None, 5.0), (4, None, 7.0)],
        "id long, grp string, x double")
    z = features.zscore(df, ["x"], by="grp")
    assert z.count() == 4
    got = {r.id: r.x_z for r in z.collect()}
    assert got[3] == pytest.approx(-1.0) and got[4] == pytest.approx(1.0)
    mm = features.minmax(df, ["x"], by="grp")
    assert mm.count() == 4
    ab = features.approx_bins(df, "x", 2, by="grp")
    assert ab.count() == 4


def test_approx_bins_null_value_propagates(spark):
    df = spark.createDataFrame(
        [(1, 1.0), (2, 2.0), (3, None), (4, 4.0)], "id long, x double")
    got = {r.id: r.x_bin for r in features.approx_bins(df, "x", 2).collect()}
    assert got[3] is None          # missing data is not 'lowest bin'
    assert all(v is not None for k, v in got.items() if k != 3)


def test_approx_bins_tie_heavy_keeps_low_bins(spark):
    """Majority value equal to the cutoffs stays LOW (strict > semantics);
    >= would dump it into the top bin and empty the low ones."""
    rows = [(i, 1.0) for i in range(60)] + \
           [(100 + i, float(2 + i)) for i in range(40)]
    df = spark.createDataFrame(rows, "id long, x double")
    got = features.approx_bins(df, "x", 4).toPandas()
    majority_bins = set(got[got.x == 1.0].x_bin)
    assert majority_bins == {0}
    assert got.groupby("x_bin").x.max().is_monotonic_increasing


def test_rolling_stats_tiebreak_deterministic(spark):
    """Duplicate (key, ts) rows: the tiebreak column pins frame order, so
    two runs (different partition layouts) agree."""
    rows = [("u", 1, 1, 10.0), ("u", 1, 2, 20.0), ("u", 2, 3, 30.0)]
    df = spark.createDataFrame(rows, "key string, ts long, seq long, v double")
    run1 = {r.seq: r.v_roll_mean for r in features.rolling_stats(
        df, "key", "ts", "v", window_rows=2, tiebreak=["seq"]).collect()}
    run2 = {r.seq: r.v_roll_mean for r in features.rolling_stats(
        df.repartition(7), "key", "ts", "v", window_rows=2,
        tiebreak=["seq"]).collect()}
    assert run1 == run2
    assert run1[2] == pytest.approx(15.0) and run1[3] == pytest.approx(25.0)


# ---------------------------------------------------------------------------
# sequence packing
# ---------------------------------------------------------------------------

def test_pack_sequences_matches_local_greedy(spark):
    """Exact layout parity with a local recomputation of the greedy
    offset pack, per group: (len desc, id) order, running offset,
    pack = floor(offset / budget)."""
    rng = np.random.default_rng(5)
    rows = [(f"doc{i}", int(rng.integers(1, 900))) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id string, n_tok int")
    budget = 1000
    got = features.pack_sequences(df, budget, n_groups=8).collect()

    lens = dict(rows)
    by_group = {}
    for r in got:
        by_group.setdefault(r.group, []).append(r)
    assert set(lens) == {r.doc_id for r in got}
    for g, members in by_group.items():
        order = sorted(members, key=lambda r: (-lens[r.doc_id], r.doc_id))
        off = 0
        for r in order:
            assert r.n_tok == lens[r.doc_id]
            assert r.offset == off, (g, r)
            assert r.pack == off // budget, (g, r)
            off += lens[r.doc_id]


def test_pack_sequences_deterministic_and_conserving(spark):
    rows = [(f"d{i}", 100 + i) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id string, n_tok int")
    a = sorted(map(tuple, features.pack_sequences(df, 512).collect()))
    b = sorted(map(tuple, features.pack_sequences(df, 512).collect()))
    assert a == b                                # rerun-identical
    total = sum(n for _, n in rows)
    st = features.pack_stats(features.pack_sequences(df, 512), 512)
    agg = st.agg(F.sum("n_tokens"), F.sum("n_docs")).collect()[0]
    assert (agg[0], agg[1]) == (total, 50)       # nothing lost or forged


def test_pack_stats_fill_and_overflow_bound(spark):
    """Offset packing's utilization contract: within a group the layout
    is gap-free, so the CUMULATIVE tokens through every non-final pack
    reach that pack's end boundary (no wasted pack), and no single pack
    holds more than budget + (longest member - 1) tokens."""
    rng = np.random.default_rng(9)
    rows = [(f"p{i}", int(rng.integers(50, 400))) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id string, n_tok int")
    budget = 1024
    packed = features.pack_sequences(df, budget, n_groups=4)
    st = {}
    for r in features.pack_stats(packed, budget).collect():
        st.setdefault(r.group, {})[r.pack] = r.n_tokens
    for g, packs in st.items():
        last = max(packs)
        # every pack id up to the last exists (gap-free layout)
        assert set(packs) == set(range(last + 1)), (g, sorted(packs))
        cum = 0
        for p in range(last + 1):
            assert packs[p] < budget + 400, (g, p, packs[p])
            cum += packs[p]
            if p < last:
                assert cum >= (p + 1) * budget, (g, p, cum)


def test_pack_examples_materializes_layout(spark):
    """pack_examples == pack_sequences joined to tokens: every token
    conserved exactly once, members concatenated in layout order
    (offset asc == len desc, id asc within a pack), all-JVM plan."""
    rng = np.random.default_rng(13)
    rows = [(f"e{i}",
             [int(t) for t in rng.integers(0, 50257, rng.integers(5, 60))])
            for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    budget = 256
    ex = features.pack_examples(df, budget, n_groups=4)
    got = ex.collect()
    toks = dict(rows)

    # conservation: every doc appears exactly once, tokens identical
    seen = [d for r in got for d in r.doc_ids]
    assert sorted(seen) == sorted(toks)
    for r in got:
        assert r.n_docs == len(r.doc_ids)
        assert r.n_tokens == len(r.input_ids) == \
            sum(len(toks[d]) for d in r.doc_ids)
        # concatenation in layout order
        flat = [t for d in r.doc_ids for t in toks[d]]
        assert r.input_ids == flat
        lens = [len(toks[d]) for d in r.doc_ids]
        order = sorted(zip(r.doc_ids, lens), key=lambda x: (-x[1], x[0]))
        assert [d for d, _ in order] == list(r.doc_ids), r.doc_ids

    # agreement with the layout operator
    packed = features.pack_sequences(
        df.select("doc_id", F.size("tokens").alias("n_tok")),
        budget, n_groups=4)
    want = {}
    for r in packed.collect():
        want.setdefault((r.group, r.pack), set()).add(r.doc_id)
    assert {(r.group, r.pack): set(r.doc_ids) for r in got} == want

    plan = ex._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "EvalPython" not in plan
