#!/usr/bin/env python
"""spark-submit entry point for the image-report backfill — the
reference's primary use case (image -> full 2-D report,
``get_full_report_data``, src/interface.c:28-93) at corpus scale.

Usage (multi-executor cluster — the sandbox runs the same command with
--master local[N]):

  zip -r photohive_spark.zip photohive_spark
  spark-submit --py-files photohive_spark.zip jobs/run_image_reports.py \\
      --media /path/to/media_parquet --output /path/to/reports \\
      [--mode real|fake] [--n-buckets 1024]

``--media`` must be MEDIA_SCHEMA-shaped parquet (media_id, kind, payload
binary, meta_*). ``--mode real`` decodes PNG payloads via the pure-stdlib
codec (png.py); ``fake`` exercises the full plumbing with the
deterministic pseudo-decode. Resume is implicit via lineage's per-bucket
manifests (re-run skips completed buckets). Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--media", required=True,
                    help="parquet dir with MEDIA_SCHEMA columns")
    ap.add_argument("--output", required=True)
    ap.add_argument("--mode", choices=["real", "fake"], default="real")
    ap.add_argument("--n-buckets", type=int, default=16)
    args = ap.parse_args()

    import pyspark.sql.functions as F
    from pyspark.sql import SparkSession

    from photohive_spark import lineage, multimodal

    spark = SparkSession.builder.appName("photohive-images").getOrCreate()
    t0 = time.time()
    media = spark.read.parquet(args.media) \
        .withColumn("media_id", F.col("media_id").cast("string")) \
        .where(F.col("kind") == "image")
    reports = multimodal.image_report(media, mode=args.mode)
    entries = lineage.run_resumable(spark, reports, args.output,
                                    key_col="media_id",
                                    n_buckets=args.n_buckets)
    done = lineage.completed_buckets(args.output)
    rows = sum(e["rows"] for e in entries)
    print(json.dumps({
        "buckets_run": len(entries), "buckets_total": args.n_buckets,
        "buckets_done": len(done), "rows_this_run": rows,
        "wall_s": round(time.time() - t0, 2),
        "images_per_s": round(rows / max(1e-9, time.time() - t0), 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
