"""r7 parity pins: the vectorized numpy hash kernels (fast_hash.py,
mapInArrow) produce the SAME integers as the original interpreted
higher-order-function forms, for the corpus AND adversarial edge cases.
These are the invariants that keep every DuckDB oracle hash-identical
after the optimization round."""

import datetime as dt

import pyspark.sql.functions as F

from photohive_spark import dedup


EDGE_DOCS = [
    ("e0", "the quick brown fox jumps over it", "s"),
    ("e1", "", "s"),
    ("e2", "   ", "s"),
    ("e3", "one", "s"),
    ("e4", "two words", "s"),
    ("e5", "unicode café über straße done", "s"),
    ("e6", "dup dup dup dup dup", "s"),
    ("e7", " leading and trailing ", "s"),
    ("e8", None, "s"),
    ("e9", "a b", "s"),
]


def _edge_df(spark):
    return spark.createDataFrame(
        EDGE_DOCS, "doc_id string, text string, source string")


def test_simhash_arrow_matches_expr(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text", "source")
    fast = dedup.simhash(docs).orderBy("doc_id").collect()
    slow = dedup.simhash(docs, hash_fn="expr_poly").orderBy("doc_id").collect()
    assert fast == slow and len(fast) > 0


def test_simhash_arrow_edge_cases(spark):
    docs = _edge_df(spark)
    fast = dedup.simhash(docs).orderBy("doc_id").collect()
    slow = dedup.simhash(docs, hash_fn="expr_poly").orderBy("doc_id").collect()
    assert fast == slow
    # empty/null docs are dropped in both forms
    ids = {r.doc_id for r in fast}
    assert "e1" not in ids and "e2" not in ids and "e8" not in ids


def test_minhash_sig_arrow_matches_expr(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text", "source")
    fast = dedup.minhash_signatures(docs, k=3).orderBy("doc_id").collect()
    slow = dedup.minhash_signatures_expr(docs, k=3).orderBy("doc_id").collect()
    assert len(fast) == len(slow) > 0
    for a, b in zip(fast, slow):
        assert a.doc_id == b.doc_id and list(a.sig) == list(b.sig)


def test_minhash_sig_arrow_edge_cases(spark):
    docs = _edge_df(spark)
    for k in (1, 2, 3, 5):
        fast = dedup.minhash_signatures(docs, k=k).orderBy("doc_id").collect()
        slow = dedup.minhash_signatures_expr(docs, k=k) \
            .orderBy("doc_id").collect()
        assert len(fast) == len(slow) == len(EDGE_DOCS)
        for a, b in zip(fast, slow):
            assert a.doc_id == b.doc_id and list(a.sig) == list(b.sig), k


def test_minhash_sig_plan_has_no_shuffle(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text", "source")
    plan = dedup.minhash_signatures(docs, k=3) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "MapInArrow" in plan
    assert "Exchange" not in plan


def test_word_shingles_arrow_matches_window_form(spark, sf_dir):
    """The vectorized distinct-shingle builder == the window+distinct
    form, as a row SET, on the corpus and on edge docs."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text", "source")
    for frame in (docs, _edge_df(spark)):
        for k in (1, 3):
            fast = dedup.word_shingles(frame, k=k)
            # legacy: non-distinct window form + global distinct
            slow = dedup.word_shingles(frame, k=k, distinct=False).distinct()
            assert fast.exceptAll(slow).count() == 0, k
            assert slow.exceptAll(fast).count() == 0, k


def test_word_shingle_arrays_matches_row_form(spark, sf_dir):
    """Per-doc shingle ARRAYS == the row-form shingle sets, doc by doc."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text", "source") \
        .limit(200)
    for frame in (docs, _edge_df(spark)):
        arr = {r.doc_id: (sorted(r.shingles), r.n_sh)
               for r in dedup.word_shingle_arrays(frame, k=3).collect()}
        rows = {}
        for r in dedup.word_shingles(frame, k=3).collect():
            rows.setdefault(r.doc_id, []).append(r.shingle)
        assert set(arr) == set(rows)
        for d in rows:
            assert arr[d][0] == sorted(rows[d]), d
            assert arr[d][1] == len(rows[d]), d
