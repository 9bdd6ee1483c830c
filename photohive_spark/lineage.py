"""Per-partition lineage + resumable checkpointed runs.

North_rule: jobs must be "resumable from checkpoint with per-partition
lineage + metrics". Iceberg gives this via snapshots; this module provides
the parquet-native equivalent (works anywhere, swaps to Iceberg by changing
the writer):

- work is split into ``n_buckets`` deterministic buckets of the key
  (``pmod(xxhash64(key), n)``) — the unit of commit/retry;
- each completed bucket writes its output under ``out/bucket=<k>/`` AND a
  manifest line ``_lineage/bucket_<k>.json`` recording rows, wall seconds,
  and per-Spark-partition row counts (the timing-macro analog of the
  reference, ``src/utilities.h:10-18``);
- resume = re-run only buckets without a manifest entry; output of a
  crashed half-written bucket is overwritten (dynamic partition overwrite),
  so the final table is exactly-once per bucket.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F


def bucket_of(key_col: str, n_buckets: int):
    return F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets))


def completed_buckets(out_dir: str) -> set[int]:
    mdir = os.path.join(out_dir, "_lineage")
    if not os.path.isdir(mdir):
        return set()
    done = set()
    for f in os.listdir(mdir):
        if f.startswith("bucket_") and f.endswith(".json"):
            done.add(int(f[len("bucket_"):-len(".json")]))
    return done


def run_resumable(spark: SparkSession, df: DataFrame, out_dir: str,
                  key_col: str = "doc_id", n_buckets: int = 8,
                  fail_after: int | None = None) -> list[dict]:
    """Write ``df`` to ``out_dir`` partitioned by bucket, resumably.

    ``fail_after`` aborts after that many buckets (test hook simulating a
    mid-backfill crash). Returns the manifest entries written this run.

    At 100 TB, n_buckets is O(1000) and each bucket job is one Spark action
    over a pruned fraction of the input; the driver loop is coarse enough
    that scheduling overhead is negligible, and a lost cluster costs at
    most one bucket of work.
    """
    os.makedirs(os.path.join(out_dir, "_lineage"), exist_ok=True)
    # pin n_buckets for the lifetime of this output dir: bucket membership
    # pmod(xxhash64, n) changes with n, so resuming under a different n
    # would silently drop and duplicate rows
    meta_path = os.path.join(out_dir, "_lineage", "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as fh:
            recorded = json.load(fh)["n_buckets"]
        if recorded != n_buckets:
            raise ValueError(
                f"{out_dir} was started with n_buckets={recorded}; resuming "
                f"with n_buckets={n_buckets} would corrupt bucket membership")
    else:
        tmp = meta_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"n_buckets": n_buckets}, fh)
        os.replace(tmp, meta_path)
    done = completed_buckets(out_dir)
    written = []
    staged = df.withColumn("_bucket", bucket_of(key_col, n_buckets))
    for b in range(n_buckets):
        if b in done:
            continue
        t0 = time.time()
        part = staged.filter(F.col("_bucket") == b).drop("_bucket")
        bucket_path = os.path.join(out_dir, f"bucket={b}")
        part.write.mode("overwrite").parquet(bucket_path)
        # per-partition metrics from what was just committed
        out = spark.read.parquet(bucket_path)
        per_part = (out.groupBy(F.spark_partition_id().alias("pid"))
                    .count().collect())
        rows = sum(r["count"] for r in per_part)
        entry = {
            "bucket": b,
            "rows": rows,
            "wall_s": round(time.time() - t0, 3),
            "partitions": {str(r["pid"]): r["count"] for r in per_part},
            "committed_at_unix": int(time.time()),
        }
        tmp = os.path.join(out_dir, "_lineage", f".bucket_{b}.json.tmp")
        final = os.path.join(out_dir, "_lineage", f"bucket_{b}.json")
        with open(tmp, "w") as fh:
            json.dump(entry, fh)
        os.replace(tmp, final)  # atomic commit of the bucket
        written.append(entry)
        if fail_after is not None and len(written) >= fail_after:
            raise RuntimeError(f"simulated crash after {fail_after} buckets")
    return written


def read_result(spark: SparkSession, out_dir: str) -> DataFrame:
    """Read back only committed buckets."""
    done = sorted(completed_buckets(out_dir))
    paths = [os.path.join(out_dir, f"bucket={b}") for b in done]
    return spark.read.parquet(*paths)


def lineage_table(spark: SparkSession, out_dir: str) -> DataFrame:
    """The lineage manifest as a DataFrame (bucket, rows, wall_s, ...)."""
    mdir = os.path.join(out_dir, "_lineage")
    entries = []
    for b in sorted(completed_buckets(out_dir)):
        with open(os.path.join(mdir, f"bucket_{b}.json")) as fh:
            e = json.load(fh)
        entries.append((e["bucket"], e["rows"], e["wall_s"],
                        e["committed_at_unix"]))
    return spark.createDataFrame(
        entries, "bucket int, rows long, wall_s double, committed_at_unix long")
