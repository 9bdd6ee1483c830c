#!/usr/bin/env python
"""Round-7 optimization measurement harness (bench.py is FROZEN — this
file holds the extra isolation benches the optimization guide §1 asks
for: per-query noop-sink timings, kernel-stage accumulator splits, and
.explain("formatted") capture for plans/r07/).

Usage:
  python bench_extra.py headline            # per-query noop, min-of-2
  python bench_extra.py profile-extract     # kernel vs boundary split
  python bench_extra.py tokens              # tokens_table in isolation
  python bench_extra.py plans [before|after]  # dump explain() per query
  python bench_extra.py one <query> [n]     # single query, n timed passes
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = ["extract_features", "asof_join", "sessionize", "minhash_lsh",
            "similarity_topk", "hist", "rms_stats", "feature_asof",
            "dedup_exact", "quality", "simhash", "tpch_pricing"]


def _get_spark():
    from photohive_spark.session import get_spark
    return get_spark(app="photohive-bench-extra", master=f"local[{CPUS}]",
                     extra={"spark.sql.shuffle.partitions": str(max(32, CPUS)),
                            "spark.driver.memory": "24g"})


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _timed(df, passes=2):
    _noop(df)                                   # warm
    wall = float("inf")
    for _ in range(passes):
        t0 = time.time()
        _noop(df)
        wall = min(wall, time.time() - t0)
    return wall


def _query_df(spark, name):
    import __spark_entry__ as E
    from bench import _flagship_df
    if name == "extract_features":
        return _flagship_df(spark, SF_DIR)
    return E.queries()[name](spark, SF_DIR)


def run_headline_iso():
    spark = _get_spark()
    spark.range(1).count()
    from bench import _prepare_tokens
    spark.read.parquet(_prepare_tokens(spark, SF_DIR)).count()
    out = {}
    for name in HEADLINE:
        spark.sparkContext.setJobDescription(f"iso:{name}")
        df = _query_df(spark, name)
        out[name] = round(_timed(df), 3)
        print(f"{name}: {out[name]}", file=sys.stderr)
    spark.stop()
    print(json.dumps({"sf_dir": SF_DIR, "queries": out,
                      "total": round(sum(out.values()), 3)}))


def run_profile_extract():
    """Kernel seconds (accumulator) vs wall: how much of extract_features
    is numpy compute vs Arrow boundary + scan + scheduling."""
    from bench import _prepare_tokens
    from photohive_spark.engine import (extract_features_df,
                                        kernel_stage_accumulators)
    spark = _get_spark()
    spark.range(1).count()
    toks = spark.read.parquet(_prepare_tokens(spark, SF_DIR))
    n = toks.count()
    time_acc = spark.sparkContext.accumulator(0.0)
    stage_accs = kernel_stage_accumulators(spark)
    df = extract_features_df(toks, time_acc=time_acc, stage_accs=stage_accs)
    _noop(df)                                    # warm
    time_acc.value  # noqa  (reset not possible; record deltas)
    base_total = time_acc.value
    base_stage = {k: a.value for k, a in stage_accs.items()}
    t0 = time.time()
    _noop(df)
    wall = time.time() - t0
    kern = time_acc.value - base_total
    stages = {k: round(a.value - base_stage[k], 2)
              for k, a in stage_accs.items()}
    print(json.dumps({
        "rows": n, "wall_s": round(wall, 3),
        "wall_core_s": round(wall * CPUS, 1),
        "kernel_core_s": round(kern, 1),
        "kernel_frac_of_cores": round(kern / (wall * CPUS), 3),
        "stage_core_s": stages}))


def run_tokens():
    from photohive_spark.tokenize import tokens_table
    spark = _get_spark()
    spark.range(1).count()
    toks = tokens_table(spark, SF_DIR)
    w = _timed(toks)
    n = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    print(json.dumps({"tokens_table_wall_s": round(w, 3), "docs": n,
                      "docs_per_s": round(n / w, 1)}))
    spark.stop()


def run_plans(tag="before"):
    os.makedirs("plans/r07", exist_ok=True)
    spark = _get_spark()
    spark.range(1).count()
    for name in HEADLINE:
        df = _query_df(spark, name)
        p = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(f"plans/r07/{name}_{tag}.txt", "w") as f:
            f.write(p)
        print(f"wrote plans/r07/{name}_{tag}.txt", file=sys.stderr)
    spark.stop()


def run_one(name, passes=3):
    spark = _get_spark()
    spark.range(1).count()
    from bench import _prepare_tokens
    spark.read.parquet(_prepare_tokens(spark, SF_DIR)).count()
    df = _query_df(spark, name)
    walls = []
    _noop(df)
    for _ in range(passes):
        t0 = time.time()
        _noop(df)
        walls.append(round(time.time() - t0, 3))
    print(json.dumps({"query": name, "walls": walls, "min": min(walls)}))
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "headline"
    if mode == "headline":
        run_headline_iso()
    elif mode == "profile-extract":
        run_profile_extract()
    elif mode == "tokens":
        run_tokens()
    elif mode == "plans":
        run_plans(sys.argv[2] if len(sys.argv) > 2 else "before")
    elif mode == "one":
        run_one(sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 3)
    else:
        raise SystemExit(f"unknown mode {mode}")
