#!/usr/bin/env python
"""spark-submit entry point for corpus deduplication — the end-to-end
production composition:

  docs -> MinHash-LSH candidate pairs (banded, never all-pairs)
       -> exact-Jaccard verify
       -> connected components (near-dup clusters)
       -> keep each cluster's min-id representative + all singletons
       -> RESUMABLE bucketed write of the cleaned corpus (lineage
          manifests; re-running skips completed buckets)

Usage:

  zip -r photohive_spark.zip photohive_spark
  spark-submit --py-files photohive_spark.zip jobs/run_dedup.py \\
      --docs /path/to/documents_parquet --output /path/to/clean \\
      [--threshold 0.9] [--hash fast] [--k 3] [--max-bucket-size 1024] \\
      [--cc-method star] [--n-buckets 64]

``--hash fast`` (default) is the codegen xxhash64 path for 10^12-doc
corpora; ``poly`` is the DuckDB-oracle-parity hash. Verified pairs are
exact either way (the string-Jaccard verify stage is shared). Prints one
JSON line with run totals.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True,
                    help="parquet dir with (doc_id, text, ...) columns")
    ap.add_argument("--output", required=True)
    ap.add_argument("--threshold", type=float, default=0.9)
    ap.add_argument("--hash", choices=["fast", "poly"], default="fast")
    ap.add_argument("--k", type=int, default=3)
    ap.add_argument("--max-bucket-size", type=int, default=1024)
    ap.add_argument("--cc-method", choices=["star", "propagate"],
                    default="star")
    ap.add_argument("--n-buckets", type=int, default=64)
    ap.add_argument("--pairs-dir", default=None,
                    help="optional parquet dir for the verified near-dup "
                         "pairs: written on first run, REUSED on resume — "
                         "so a restart skips the expensive LSH+verify "
                         "stage, not just the output write")
    args = ap.parse_args()

    import pyspark.sql.functions as F
    from pyspark.sql import SparkSession

    from photohive_spark import dedup, lineage

    spark = SparkSession.builder.appName("photohive-dedup").getOrCreate()
    t0 = time.time()
    docs = spark.read.parquet(args.docs) \
        .withColumn("doc_id", F.col("doc_id").cast("string"))
    n_docs = docs.count()

    # pairs checkpoint: Hadoop-FS detection (os.path.exists never sees
    # hdfs://s3a:// paths) + a parameter fingerprint — resuming with
    # different threshold/k/hash/cap against stale pairs would silently
    # mislabel the output, so mismatches fail loudly. The fingerprint also
    # pins the CORPUS (docs path + row count): resuming with a different
    # --docs against an existing pairs checkpoint would otherwise apply
    # another corpus's near-dup pairs and silently mis-deduplicate.
    params = {"threshold": args.threshold, "k": args.k, "hash": args.hash,
              "max_bucket_size": args.max_bucket_size,
              "docs": args.docs, "n_docs": n_docs}
    pairs_reused = False
    if args.pairs_dir and lineage.hadoop_exists(
            spark, f"{args.pairs_dir}/_SUCCESS"):
        meta_path = f"{args.pairs_dir}/_pairs_meta.json"
        recorded = (json.loads(lineage.hadoop_read_text(spark, meta_path))
                    if lineage.hadoop_exists(spark, meta_path) else None)
        if recorded != params:
            raise SystemExit(
                f"--pairs-dir {args.pairs_dir} was built with {recorded}, "
                f"current run wants {params}; delete the dir or match "
                f"the parameters")
        pairs = spark.read.parquet(args.pairs_dir)
        pairs_reused = True
    else:
        pairs = dedup.minhash_lsh_pairs(
            docs, threshold=args.threshold, k=args.k,
            max_bucket_size=args.max_bucket_size,
            hash_fn=args.hash)
        if args.pairs_dir:
            pairs.write.mode("overwrite").parquet(args.pairs_dir)
            lineage.hadoop_write_text(
                spark, f"{args.pairs_dir}/_pairs_meta.json",
                json.dumps(params))
            pairs = spark.read.parquet(args.pairs_dir)
        else:
            pairs = pairs.localCheckpoint()
    n_pairs = pairs.count()

    # only docs that appear in a pair need cluster labels; everything else
    # is a singleton and survives by definition (keeps the CC input small)
    dup_nodes = (pairs.select(F.col("id_a").alias("doc_id"))
                 .union(pairs.select(F.col("id_b").alias("doc_id")))
                 .distinct())
    labels = dedup.connected_components(pairs, dup_nodes,
                                        method=args.cc_method)
    drop = labels.where(F.col("doc_id") != F.col("component")) \
                 .select("doc_id")
    n_drop = drop.count()
    clean = docs.join(drop, on="doc_id", how="left_anti")

    entries = lineage.run_resumable(spark, clean, args.output,
                                    key_col="doc_id",
                                    n_buckets=args.n_buckets)
    done = lineage.completed_buckets(args.output)
    print(json.dumps({
        "n_docs": n_docs, "near_dup_pairs": n_pairs,
        "pairs_reused": pairs_reused,
        "docs_dropped": n_drop, "docs_kept": n_docs - n_drop,
        "buckets_run": len(entries), "buckets_done": len(done),
        "wall_s": round(time.time() - t0, 2),
        "docs_per_s": round(n_docs / max(1e-9, time.time() - t0), 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
