"""Dimensionality reduction (rp_project / pca_*) and BM25 retrieval.

The RP expression form is the oracle-checked one (driver gate key
``rp_project``); here the GEMM production form is pinned exactly against
it, PCA is pinned against numpy full-matrix PCA, and BM25 against a
hand-computed tiny corpus.
"""

import math

import numpy as np
import pytest

from photohive_spark import similarity, text


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_rp_expr_matches_gemm(spark, emb):
    """The JVM-fold form and the Arrow GEMM form are the same projection
    (same formula matrix) — exact at the gate's 6-dp rounding."""
    M = similarity.rp_matrix_formula(8, 64, seed=5)
    ex = {r["vec_id"]: [r[f"p{j}"] for j in range(8)]
          for r in similarity.rp_project_expr(emb, 8).collect()}
    gm = {r["vec_id"]: [round(x, 6) for x in r["proj"]]
          for r in similarity.rp_project(emb, M).collect()}
    assert ex.keys() == gm.keys()
    for k in ex:
        assert ex[k] == pytest.approx(gm[k], abs=1.1e-6), k


def test_rp_gaussian_preserves_distances(spark, emb):
    """JL sanity: a seeded Gaussian projection to 16 dims keeps pairwise
    L2 distances of the first 40 vectors within a loose (JL-typical at
    k=16) multiplicative envelope — distortion is bounded, not tight."""
    M = similarity.rp_matrix_gaussian(16, 64, seed=7)
    rows = (similarity.rp_project(emb.where("vec_id < 40"), M)
            .orderBy("vec_id").collect())
    V = np.array([r["proj"] for r in rows])
    raw = np.array([list(r["embedding"]) for r in
                    emb.where("vec_id < 40").orderBy("vec_id").collect()],
                   dtype=np.float64)
    dp = np.linalg.norm(V[:, None, :] - V[None, :, :], axis=2)
    dr = np.linalg.norm(raw[:, None, :] - raw[None, :, :], axis=2)
    iu = np.triu_indices(40, 1)
    ratio = dp[iu] / np.maximum(dr[iu], 1e-12)
    assert 0.3 < ratio.min() and ratio.max() < 2.2
    assert abs(float(np.median(ratio)) - 1.0) < 0.25


def test_pca_matches_numpy(spark, emb):
    """pca_train's single-pass partial-Gram covariance == numpy's
    full-matrix covariance; components span the same axes (allclose up
    to the deterministic sign convention); explained variance is the
    descending eigenvalue head."""
    model = similarity.pca_train(emb, n_components=8)
    X = np.array([list(r["embedding"]) for r in
                  emb.orderBy("vec_id").collect()], dtype=np.float64)
    mu = X.mean(axis=0)
    assert model["mean"] == pytest.approx(mu, abs=1e-9)
    cov = np.cov(X.T, bias=True)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:8]
    assert model["explained_var"] == pytest.approx(evals[order], rel=1e-8)
    for k in range(8):
        ref = evecs[:, order[k]]
        got = model["components"][k]
        # same axis, engine-fixed sign
        assert abs(abs(float(ref @ got)) - 1.0) < 1e-8
        piv = int(np.argmax(np.abs(got)))
        assert got[piv] > 0


def test_pca_project_parity_and_variance(spark, emb):
    """Projection == centered GEMM against the trained components, and
    the per-component sample variance equals explained_var (descending):
    the projection actually concentrates variance."""
    model = similarity.pca_train(emb, n_components=4)
    rows = (similarity.pca_project(emb, model)
            .orderBy("vec_id").collect())
    P = np.array([r["proj"] for r in rows])
    X = np.array([list(r["embedding"]) for r in
                  emb.orderBy("vec_id").collect()], dtype=np.float64)
    want = (X - model["mean"]) @ model["components"].T
    assert P == pytest.approx(want, abs=1e-9)
    var = P.var(axis=0)
    assert var == pytest.approx(model["explained_var"], rel=1e-6)
    assert all(var[i] >= var[i + 1] - 1e-12 for i in range(3))


def _mini_docs(spark):
    return spark.createDataFrame(
        [("a", "x x x y"), ("b", "x z"), ("c", "z z z z z z"),
         ("d", "w w")],
        ["doc_id", "text"])


def test_bm25_hand_computed(spark):
    """Exact micro-point check vs a by-hand BM25 (k1=1.2, b=0.75) on a
    4-doc corpus: N=4, avgdl=3.5; query {x, y}: df(x)=2, df(y)=1."""
    out = {r["doc_id"]: (r["n_terms"], r["score_micro"])
           for r in text.bm25_topk(_mini_docs(spark), ["x", "y"],
                                   k=10).collect()}

    def contrib(tf, df, dl, n=4, avgdl=3.5, k1=1.2, b=0.75):
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        return round(idf * (tf * (k1 + 1.0))
                     / (tf + k1 * (1 - b + b * (dl / avgdl))) * 1e6)

    assert out["a"] == (2, contrib(3, 2, 4) + contrib(1, 1, 4))
    assert out["b"] == (1, contrib(1, 2, 2))
    assert set(out) == {"a", "b"}          # c, d: no query terms


def test_bm25_idf_favors_rare_terms(spark):
    """A doc with only the rare term outranks one with only the common
    term at equal tf and length."""
    docs = spark.createDataFrame(
        [("r", "rare pad"), ("c", "common pad")]
        + [(f"f{i}", "common junk") for i in range(8)],
        ["doc_id", "text"])
    got = {r["doc_id"]: r["score_micro"]
           for r in text.bm25_topk(docs, ["rare", "common"],
                                   k=20).collect()}
    assert got["r"] > got["c"]


def test_bm25_length_normalization(spark):
    """Same tf, same df: the SHORTER doc scores higher (b > 0)."""
    docs = spark.createDataFrame(
        [("short", "q a"), ("long", "q " + "a " * 20)],
        ["doc_id", "text"])
    got = {r["doc_id"]: r["score_micro"]
           for r in text.bm25_topk(docs, ["q"], k=5).collect()}
    assert got["short"] > got["long"]


def test_rp_project_is_single_map_stage(spark, emb):
    """Scale shape: the GEMM projection plan has no Exchange (pure map)."""
    M = similarity.rp_matrix_formula(8, 64)
    plan = similarity.rp_project(emb, M)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def _py_bm25(corpus: dict, terms, k1=1.2, b=0.75):
    """Independent pure-Python BM25 (micro-points), straight from the
    published formula — no shared code with text.bm25_topk."""
    toks = {d: t.split() for d, t in corpus.items()}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    df = {q: sum(1 for t in toks.values() if q in t) for q in terms}
    out = {}
    for d, t in toks.items():
        total, hit = 0, 0
        for q in terms:
            tf = t.count(q)
            if tf == 0:
                continue
            hit += 1
            idf = math.log(1.0 + (n - df[q] + 0.5) / (df[q] + 0.5))
            total += round(idf * (tf * (k1 + 1.0))
                           / (tf + k1 * (1 - b + b * (len(t) / avgdl)))
                           * 1e6)
        if hit:
            out[d] = (hit, total)
    return out


def test_bm25_seeded_random_sweep(spark):
    """Seeded sweep: 6 random corpora (varying vocab, doc count, doc
    length) — Spark BM25 micro-points equal an independent pure-Python
    implementation exactly, for every scored doc."""
    rng = np.random.default_rng(99)
    for trial in range(6):
        vocab = [f"w{v}" for v in range(int(rng.integers(3, 12)))]
        n_docs = int(rng.integers(2, 25))
        corpus = {
            f"d{i:02d}": " ".join(rng.choice(vocab,
                                             size=int(rng.integers(1, 40))))
            for i in range(n_docs)}
        terms = list(rng.choice(vocab, size=min(3, len(vocab)),
                                replace=False))
        want = _py_bm25(corpus, terms)
        got = {r["doc_id"]: (r["n_terms"], r["score_micro"])
               for r in text.bm25_topk(
                   spark.createDataFrame(list(corpus.items()),
                                         ["doc_id", "text"]),
                   terms, k=10_000).collect()}
        assert got == want, f"trial {trial}"


def test_bm25_batch_equals_single(spark, sf_dir):
    """Batch form restricted to each query reproduces the single-query
    form exactly (scores AND order), on the real documents table."""
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .selectExpr("cast(doc_id as string) doc_id", "text"))
    qs = [("qa", ["dup", "spark"]), ("qb", ["merge", "window", "hash"]),
          ("qc", ["nosuchterm"])]
    batch = text.bm25_topk_batch(
        docs, spark.createDataFrame(qs, ["query_id", "terms"]), k=7)
    got = {}
    for r in batch.collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["n_terms"], r["score_micro"]))
    for qid, terms in qs:
        want = [(i + 1, r["doc_id"], r["n_terms"], r["score_micro"])
                for i, r in enumerate(
                    text.bm25_topk(docs, terms, k=7).collect())]
        assert sorted(got.get(qid, [])) == want, qid


def test_pca_partials_one_row_per_partition(spark):
    """r7 scale fix: the driver-side collect is bounded by PARTITION
    count, not Arrow-batch count — a tiny maxRecordsPerBatch forces many
    batches per partition, yet at most one partial row per partition
    reaches the driver, and the trained model stays exact vs numpy."""
    import numpy as np
    from photohive_spark import similarity as S

    rng = np.random.default_rng(0)
    rows = [(i, rng.standard_normal(8).tolist()) for i in range(4000)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>") \
        .repartition(4)
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "100")
    try:
        n_parts = emb.rdd.getNumPartitions()
        partials = S.pca_partials_df(emb).collect()
        assert 1 <= len(partials) <= n_parts        # NOT ~40 batches
        assert sum(r["n"] for r in partials) == 4000
        model = S.pca_train(emb, n_components=4)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    V = np.array([r[1] for r in rows], dtype=np.float64)
    mu = V.mean(axis=0)
    cov = (V - mu).T @ (V - mu) / len(V)
    evals = np.sort(np.linalg.eigvalsh(cov))[::-1][:4]
    assert np.allclose(model["explained_var"], evals, rtol=1e-8, atol=1e-10)
    assert np.allclose(model["mean"], mu, rtol=1e-9, atol=1e-12)
