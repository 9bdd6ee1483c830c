"""End-to-end spark-submit --py-files run of the backfill job (the
north_rule deployment path), including resume-after-partial-run."""

import json
import os
import shutil
import subprocess
import zipfile

import pytest

SPARK_SUBMIT = "/opt/spark/bin/spark-submit"

pytestmark = pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT),
                                reason="spark-submit not available")


def _zip_pkg(tmp_path) -> str:
    z = str(tmp_path / "photohive_spark.zip")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with zipfile.ZipFile(z, "w") as zf:
        pkg = os.path.join(root, "photohive_spark")
        for fn in os.listdir(pkg):
            if fn.endswith(".py"):
                zf.write(os.path.join(pkg, fn), f"photohive_spark/{fn}")
    return z


def test_spark_submit_pyfiles_run_and_resume(tmp_path, spark, sf_dir):
    from photohive_spark.tokenize import tokens_table
    tokens_path = str(tmp_path / "tokens.parquet")
    tokens_table(spark, sf_dir).limit(80).write.parquet(tokens_path)

    zf = _zip_pkg(tmp_path)
    out = str(tmp_path / "features")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cmd = [SPARK_SUBMIT, "--master", "local[4]",
           "--conf", "spark.ui.enabled=false",
           "--conf", "spark.sql.shuffle.partitions=4",
           "--py-files", zf,
           os.path.join(root, "jobs", "run_pipeline.py"),
           "--tokens", tokens_path, "--output", out, "--n-buckets", "4"]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    stats = json.loads([l for l in r.stdout.splitlines()
                        if l.startswith("{")][-1])
    assert stats["buckets_run"] == 4 and stats["rows_this_run"] == 80

    # resume: drop one bucket's manifest -> only that bucket re-runs
    os.remove(os.path.join(out, "_lineage", "bucket_2.json"))
    r2 = subprocess.run(cmd, capture_output=True, text=True, timeout=600)
    assert r2.returncode == 0, r2.stderr[-2000:]
    stats2 = json.loads([l for l in r2.stdout.splitlines()
                         if l.startswith("{")][-1])
    assert stats2["buckets_run"] == 1
    assert stats2["buckets_done"] == 4

    from photohive_spark import lineage
    assert lineage.read_result(spark, out).count() == 80


def test_spark_submit_build_ann_index(tmp_path, spark, sf_dir):
    """build_ann_index job: writes a partitioned IVF index + query-side
    centroid metadata; a reader reconstructs the exact ivf_topk result
    from the on-disk index alone."""
    import numpy as np
    from photohive_spark import similarity

    zf = _zip_pkg(tmp_path)
    out = str(tmp_path / "ivf_index")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cmd = [SPARK_SUBMIT, "--master", "local[4]",
           "--conf", "spark.ui.enabled=false",
           "--conf", "spark.sql.shuffle.partitions=4",
           "--py-files", zf,
           os.path.join(root, "jobs", "build_ann_index.py"),
           "--embeddings", f"{sf_dir}/embeddings.parquet",
           "--output", out, "--kind", "ivf", "--n-cells", "8"]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-3000:]
    stat = json.loads(r.stdout.strip().splitlines()[-1])
    assert stat["kind"] == "ivf" and stat["rows"] > 0

    with open(os.path.join(out, "_ann_meta.json")) as fh:
        meta = json.load(fh)
    cents = np.array(meta["centroids"])
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = [float(x) for x in
         emb.orderBy("vec_id").limit(1).collect()[0].embedding]
    got = similarity.ivf_topk_indexed(spark, out, cents, q, k=5, n_probe=3)
    want = similarity.ivf_topk(emb, q, k=5, n_probe=3, centroids=cents,
                               assign_fn="pandas")
    assert [(r2.vec_id, r2.cosine) for r2 in got.collect()] == \
           [(r2.vec_id, r2.cosine) for r2 in want.collect()]


def test_spark_submit_run_dedup_and_resume(tmp_path, spark, sf_dir):
    """End-to-end dedup job: drops exact/near dups keeping min-id reps,
    keeps singletons, and the bucketed output write is resumable."""
    import pyspark.sql.functions as F
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select(F.col("doc_id").cast("string").alias("doc_id"), "text")
            .limit(40))
    # plant exact duplicates of the first 10 docs
    dups = (docs.limit(10)
            .select(F.concat(F.lit("dup_"), "doc_id").alias("doc_id"), "text"))
    corpus_path = str(tmp_path / "corpus.parquet")
    docs.unionByName(dups).write.parquet(corpus_path)

    zf = _zip_pkg(tmp_path)
    out = str(tmp_path / "clean")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cmd = [SPARK_SUBMIT, "--master", "local[4]",
           "--conf", "spark.ui.enabled=false",
           "--conf", "spark.sql.shuffle.partitions=4",
           "--py-files", zf,
           os.path.join(root, "jobs", "run_dedup.py"),
           "--docs", corpus_path, "--output", out,
           "--threshold", "0.9", "--hash", "fast", "--n-buckets", "4",
           "--pairs-dir", str(tmp_path / "pairs")]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-3000:]
    stat = json.loads(r.stdout.strip().splitlines()[-1])
    assert stat["n_docs"] == 50
    assert stat["docs_dropped"] >= 10          # every planted dup drops
    assert stat["docs_kept"] == 50 - stat["docs_dropped"]

    from photohive_spark import lineage
    kept = {r2.doc_id for r2 in
            lineage.read_result(spark, out).select("doc_id").collect()}
    assert len(kept) == stat["docs_kept"]
    # min-id representative: 'NN' < 'dup_NN' lexicographically
    assert not any(d.startswith("dup_") for d in kept)

    # resume: second run writes zero buckets
    r2_ = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    assert r2_.returncode == 0, r2_.stderr[-3000:]
    stat2 = json.loads(r2_.stdout.strip().splitlines()[-1])
    assert stat2["buckets_run"] == 0 and stat2["buckets_done"] == 4
    # the expensive LSH+verify stage was skipped too (pairs checkpoint)
    assert stat2["pairs_reused"] is True
    assert stat2["near_dup_pairs"] == stat["near_dup_pairs"]


def test_spark_submit_run_image_reports_and_resume(tmp_path, spark):
    """The image-report backfill job: real PNG payloads -> full 2-D
    reports, resumable bucketed write."""
    import numpy as np

    from photohive_spark import multimodal, png

    rows = []
    for i in range(12):
        rng = np.random.default_rng(i)
        img = rng.integers(0, 256, (12, 16, 3), dtype=np.uint8)
        rows.append((f"m{i:02d}", "image", bytearray(png.encode_png(img)),
                     16, 12, None, None))
    media_path = str(tmp_path / "media.parquet")
    spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA) \
         .write.parquet(media_path)

    zf = _zip_pkg(tmp_path)
    out = str(tmp_path / "reports")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cmd = [SPARK_SUBMIT, "--master", "local[4]",
           "--conf", "spark.ui.enabled=false",
           "--conf", "spark.sql.shuffle.partitions=4",
           "--py-files", zf,
           os.path.join(root, "jobs", "run_image_reports.py"),
           "--media", media_path, "--output", out, "--n-buckets", "3"]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    stats = json.loads([l for l in r.stdout.splitlines()
                        if l.startswith("{")][-1])
    assert stats["buckets_run"] == 3 and stats["rows_this_run"] == 12

    r2 = subprocess.run(cmd, capture_output=True, text=True, timeout=600)
    assert r2.returncode == 0, r2.stderr[-2000:]
    stats2 = json.loads([l for l in r2.stdout.splitlines()
                         if l.startswith("{")][-1])
    assert stats2["buckets_run"] == 0 and stats2["buckets_done"] == 3

    from photohive_spark import lineage
    got = lineage.read_result(spark, out)
    assert got.count() == 12
    assert "hist_entropy" in got.columns and "palette" in got.columns

    # --mode is pinned: resuming with a different decode mode must fail
    # loudly instead of mixing fake and real features in one table
    r3 = subprocess.run(cmd + ["--mode", "fake"], capture_output=True,
                        text=True, timeout=600)
    assert r3.returncode != 0
    assert "mode" in (r3.stderr + r3.stdout)


def test_spark_submit_run_image_dedup(tmp_path, spark):
    """Image-dedup job end-to-end: real decode -> pHash -> hamming
    banding -> components -> resumable cleaned write; corrupt payloads
    drop (on_error=skip); re-run reuses the hash checkpoint."""
    import numpy as np

    from photohive_spark import jpeg, multimodal, png

    rng = np.random.default_rng(41)
    rows = []
    for i in range(6):                     # 6 distinct structured images
        y, x = np.mgrid[0:40, 0:50]
        img = np.stack([((x * (i + 2) + y) % 256).astype(np.uint8),
                        ((y * (i + 3)) % 256).astype(np.uint8),
                        np.full_like(x, 30 * i, dtype=np.uint8)], axis=2)
        img[5:20, 10:30] = 250 - 30 * i
        rows.append((f"m{i}_png", "image",
                     bytearray(png.encode_png(img)), 50, 40, None, None))
        rows.append((f"m{i}_jpg", "image",
                     bytearray(jpeg.encode_jpeg(img, quality=85)),
                     50, 40, None, None))
    rows.append(("corrupt", "image", b"not an image", None, None,
                 None, None))
    media_path = str(tmp_path / "media.parquet")
    spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA) \
        .write.parquet(media_path)

    zf = _zip_pkg(tmp_path)
    out = str(tmp_path / "clean")
    hashes = str(tmp_path / "phashes")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cmd = [SPARK_SUBMIT, "--master", "local[4]",
           "--conf", "spark.ui.enabled=false",
           "--conf", "spark.sql.shuffle.partitions=4",
           "--py-files", zf,
           os.path.join(root, "jobs", "run_image_dedup.py"),
           "--media", media_path, "--output", out,
           "--hashes-dir", hashes, "--max-hamming", "7",
           "--n-buckets", "4"]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    stats = json.loads([l for l in r.stdout.splitlines()
                        if l.startswith("{")][-1])
    assert stats["n_media"] == 13
    assert stats["undecodable_dropped"] == 1
    # each (png, jpeg-re-encode) pair collapses to one representative
    assert stats["visual_near_dup_pairs"] >= 6
    assert stats["media_dropped"] >= 6
    assert stats["media_kept"] <= 7

    # resume: hash checkpoint is REUSED (no re-decode)
    shutil.rmtree(out)
    r2 = subprocess.run(cmd, capture_output=True, text=True, timeout=600)
    assert r2.returncode == 0, r2.stderr[-2000:]
    stats2 = json.loads([l for l in r2.stdout.splitlines()
                         if l.startswith("{")][-1])
    assert stats2["hashes_reused"] is True
    assert stats2["media_kept"] == stats["media_kept"]


def test_spark_submit_run_curation(tmp_path, spark, sf_dir):
    """End-to-end curation job: quality gate, exact + near dedup,
    benchmark decontamination, deterministic train/val split — with
    per-stage drop accounting and resumable writes."""
    import pyspark.sql.functions as F
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select(F.col("doc_id").cast("string").alias("doc_id"), "text")
            .limit(40))
    dups = (docs.limit(10)
            .select(F.concat(F.lit("dup_"), "doc_id").alias("doc_id"),
                    "text"))
    junk = spark.createDataFrame(
        [("junk_0", "!!! ??? %%% !!!"), ("junk_1", "@@ ## $$ %% ^^ &&")],
        ["doc_id", "text"])
    # template-heavy pair: ~40 shared boilerplate words + short unique
    # tails -> NOT a 0.9-Jaccard near-dup pair (J ~ 0.7), but both are
    # > 70% covered by duplicated 5-gram spans -> the --max-dup-frac
    # stage (and only it) must drop them
    boiler = " ".join(f"tmpl{chr(97 + i % 26)}{chr(97 + i // 26)}"
                      for i in range(40))
    bp = spark.createDataFrame(
        [("bp_0", boiler + " unique closing words here alpha"),
         ("bp_1", boiler + " different ending sentence there omega")],
        ["doc_id", "text"])
    corpus_path = str(tmp_path / "corpus.parquet")
    (docs.unionByName(dups).unionByName(junk).unionByName(bp)
     .write.parquet(corpus_path))

    # benchmark = exact copies of three surviving originals -> their
    # pooled 3-gram overlap is 1.0 and decontamination must drop them
    bench_path = str(tmp_path / "bench.parquet")
    (docs.orderBy("doc_id").limit(3)
         .select(F.concat(F.lit("b_"), "doc_id").alias("doc_id"), "text")
         .write.parquet(bench_path))

    zf = _zip_pkg(tmp_path)
    out = str(tmp_path / "curated")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cmd = [SPARK_SUBMIT, "--master", "local[4]",
           "--conf", "spark.ui.enabled=false",
           "--conf", "spark.sql.shuffle.partitions=4",
           "--py-files", zf,
           os.path.join(root, "jobs", "run_curation.py"),
           "--docs", corpus_path, "--output", out,
           "--min-quality", "0.2", "--threshold", "0.9",
           "--hash", "fast", "--n-buckets", "4",
           "--benchmark", bench_path, "--contam-threshold", "0.5",
           "--val-rate", "0.1",
           "--max-dup-frac", "0.7", "--span-k", "5",
           "--pairs-dir", str(tmp_path / "pairs")]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-3000:]
    stat = json.loads(r.stdout.strip().splitlines()[-1])
    assert stat["n_docs"] == 54
    assert stat["quality_dropped"] == 2           # both junk docs
    assert stat["exact_dup_dropped"] >= 10        # every planted dup
    assert stat["contamination_dropped"] >= 1     # benchmark copies
    assert stat["boilerplate_dropped"] >= 2       # both template docs
    assert stat["docs_kept"] == stat["n_train"] + stat["n_val"]

    from photohive_spark import lineage
    train = {x.doc_id for x in
             lineage.read_result(spark, f"{out}/train")
             .select("doc_id").collect()}
    val = {x.doc_id for x in
           lineage.read_result(spark, f"{out}/val")
           .select("doc_id").collect()}
    assert len(train) == stat["n_train"] and len(val) == stat["n_val"]
    assert not (train & val)                      # leak-free split
    assert not any(d.startswith(("dup_", "junk_", "bp_"))
                   for d in train | val)

    # resume: zero buckets rewritten, pair stage reused
    r2 = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    assert r2.returncode == 0, r2.stderr[-3000:]
    stat2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert stat2["train_buckets_run"] == 0
    assert stat2["val_buckets_run"] == 0
    assert stat2["pairs_reused"] is True
    assert stat2["docs_kept"] == stat["docs_kept"]


def test_spark_submit_run_curation_time_split(tmp_path, spark, sf_dir):
    """--split-by time: the PIT-correct event-time split with an embargo
    gap, end to end through spark-submit — train strictly before the
    embargo window, val strictly at/after the split point, gap rows in
    neither output."""
    import pyspark.sql.functions as F
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select(F.col("doc_id").cast("string").alias("doc_id"), "text")
            .limit(30)
            # deterministic daily timestamps: doc i -> 2024-01-(1+i%30)
            .withColumn("event_ts", F.to_timestamp(F.concat(
                F.lit("2024-01-"),
                F.lpad((F.col("doc_id").cast("int") % 30 + 1)
                       .cast("string"), 2, "0")))))
    # one row with a NULL event time: satisfies neither split predicate;
    # must be accounted as null_ts_dropped, not folded into the embargo
    docs = docs.union(docs.sparkSession.createDataFrame(
        [("nullts_doc", "a unique null-timestamp document body", None)],
        docs.schema))
    corpus_path = str(tmp_path / "corpus_ts.parquet")
    docs.write.parquet(corpus_path)

    zf = _zip_pkg(tmp_path)
    out = str(tmp_path / "curated_ts")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cmd = [SPARK_SUBMIT, "--master", "local[4]",
           "--conf", "spark.ui.enabled=false",
           "--conf", "spark.sql.shuffle.partitions=4",
           "--py-files", zf,
           os.path.join(root, "jobs", "run_curation.py"),
           "--docs", corpus_path, "--output", out,
           "--min-quality", "0.0", "--hash", "fast", "--n-buckets", "2",
           "--split-by", "time", "--ts-col", "event_ts",
           "--split-ts", "2024-01-21 00:00:00",
           "--embargo-s", str(2 * 86400)]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-3000:]
    stat = json.loads(r.stdout.strip().splitlines()[-1])
    assert stat["split_by"] == "time"
    assert stat["docs_kept"] == stat["n_train"] + stat["n_val"] \
        + stat["embargo_dropped"] + stat["null_ts_dropped"]
    assert stat["embargo_dropped"] >= 1
    assert stat["null_ts_dropped"] == 1

    from photohive_spark import lineage
    from datetime import datetime
    train_ts = [x.event_ts for x in
                lineage.read_result(spark, f"{out}/train")
                .select("event_ts").collect()]
    val_ts = [x.event_ts for x in
              lineage.read_result(spark, f"{out}/val")
              .select("event_ts").collect()]
    assert train_ts and val_ts
    assert max(train_ts) < datetime(2024, 1, 19)      # before the embargo
    assert min(val_ts) >= datetime(2024, 1, 21)       # at/after the split


def test_spark_submit_build_ivfpq_index(tmp_path, spark, sf_dir):
    """build_ann_index --kind ivfpq: one job writes the composite index
    (cell-partitioned m-byte codes) + centroids AND codebooks in the
    query-side metadata; a reader reconstructs ivfpq_topk from the
    on-disk index alone with re-rank recall vs exact >= 0.6 at
    n_probe=4/8 cells."""
    import numpy as np
    from photohive_spark import similarity

    zf = _zip_pkg(tmp_path)
    out = str(tmp_path / "ivfpq_index")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cmd = [SPARK_SUBMIT, "--master", "local[4]",
           "--conf", "spark.ui.enabled=false",
           "--conf", "spark.sql.shuffle.partitions=4",
           "--py-files", zf,
           os.path.join(root, "jobs", "build_ann_index.py"),
           "--embeddings", f"{sf_dir}/embeddings.parquet",
           "--output", out, "--kind", "ivfpq", "--n-cells", "8",
           "--pq-m", "8", "--pq-codes", "64"]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-3000:]
    stat = json.loads(r.stdout.strip().splitlines()[-1])
    assert stat["kind"] == "ivfpq" and stat["rows"] > 0

    with open(os.path.join(out, "_ann_meta.json")) as fh:
        meta = json.load(fh)
    cents = np.array(meta["centroids"])
    cbs = np.array(meta["codebooks"])
    assert cbs.shape == (8, 64, 8)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = [float(x) for x in
         emb.orderBy("vec_id").limit(2).collect()[1].embedding]
    got = similarity.ivfpq_topk(spark, out, cents, cbs, q, k=10,
                                n_probe=4, rerank_with=emb)
    exact = similarity.brute_force_topk(emb, q, k=10)
    hit = {r2.vec_id for r2 in got.collect()} \
        & {r2.vec_id for r2 in exact.collect()}
    assert len(hit) >= 6
