"""Deterministic tokenizer: documents(text) -> tokens table.

Produces the BASELINE input_hint schema
``(doc_id string, tokens array<int32>, n_tok int32, source string,
event_ts timestamp)`` from the driver's ``documents.parquet``.

The token function is a polynomial rolling hash over character codes —
``acc0=7; acc=(acc*31 + ascii(c)) % VOCAB_SIZE`` — chosen because it is
expressible with *built-in higher-order functions* in BOTH Spark SQL and
DuckDB (the correctness oracle), and in numpy for kernel-side goldens.
Everything stays JVM-side / whole-stage-codegen'd: no Python UDF touches
the tokenize path, so at 100 TB this is a pure scan+project stage with
column pruning and predicate pushdown intact.

Reference analog: the ingest normalization boundary
(``utils.py:30-46`` pil->numpy/255; ``src/image_processing.c:122-173``
read_image) — raw modality -> fixed numeric arrays.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from .config import VOCAB_SIZE

TOKEN_SEED = 7
TOKEN_MULT = 31

# Spark SQL expression for tokens (identical semantics to DUCKDB_TOKENS_SQL
# and word_token() below — parity is pinned by tests/test_tokenize.py).
SPARK_TOKENS_EXPR = f"""
transform(
  filter(split(text, ' '), w -> length(w) > 0),
  w -> cast(aggregate(transform(sequence(1, length(w)), i -> ascii(substr(w, i, 1))),
                      {TOKEN_SEED}, (a, b) -> (a * {TOKEN_MULT} + b) % {VOCAB_SIZE}) as int)
)
"""

# DuckDB equivalent (used by oracle_sql strings).
DUCKDB_TOKENS_SQL = f"""
list_transform(
  list_filter(string_split(text, ' '), w -> len(w) > 0),
  w -> cast(list_reduce(
         list_prepend({TOKEN_SEED},
                      list_transform(range(1, len(w)+1), i -> ascii(substr(w, i, 1)))),
         (a, b) -> (a * {TOKEN_MULT} + b) % {VOCAB_SIZE}) as int)
)
"""


def word_token(word: str) -> int:
    """Pure-Python reference implementation of the token hash."""
    acc = TOKEN_SEED
    for ch in word:
        acc = (acc * TOKEN_MULT + ord(ch)) % VOCAB_SIZE
    return acc


def tokenize_text(text: str) -> np.ndarray:
    """Local (oracle) tokenization of one document."""
    return np.array([word_token(w) for w in text.split(" ") if w],
                    dtype=np.int32)


def tokens_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet -> input_hint-shaped tokens DataFrame.

    ``event_ts`` is deterministic (epoch 2026-01-01 + doc_id*37s) so
    point-in-time tests are reproducible.

    The token hash itself runs as a vectorized numpy kernel inside ONE
    ``mapInArrow`` stage (photohive_spark.fast_hash) — bit-identical
    integers to SPARK_TOKENS_EXPR (parity pinned by tests/test_tokenize),
    ~100x faster than the interpreted higher-order-function form (Spark
    HOF lambdas are CodegenFallback; optimization guide §4.2). The scan
    reads only (doc_id, text, source); everything around the hash
    (event_ts, n_tok, casts) stays Catalyst."""
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return tokens_from_documents(df)


def tokens_from_documents(df: DataFrame) -> DataFrame:
    """Tokenize any (doc_id, text, source) documents DataFrame into the
    input_hint shape (see tokens_table)."""
    import pyarrow as pa

    from .skew import rebalance_small_scan

    src = rebalance_small_scan(df.select("doc_id", "text", "source"))
    fields = [(f.name, f.dataType.simpleString()) for f in src.schema
              if f.name != "text"]
    out_schema = ", ".join([f"{n} {t}" for n, t in fields]
                           + ["tokens array<int>"])

    def tok(batches):
        from .fast_hash import tokenize_arrow_batch
        for batch in batches:
            cols, names = [], []
            for i, name in enumerate(batch.schema.names):
                if name != "text":
                    cols.append(batch.column(i))
                    names.append(name)
            cols.append(tokenize_arrow_batch(batch.column("text")))
            names.append("tokens")
            yield pa.RecordBatch.from_arrays(cols, names)

    mapped = src.mapInArrow(tok, out_schema)
    return (
        mapped.select(
            F.col("doc_id").cast("string").alias("doc_id"),
            F.col("tokens"),
            F.col("source"),
            (F.to_timestamp(F.lit("2026-01-01 00:00:00"))
             + F.make_interval(secs=F.col("doc_id") * 37)).alias("event_ts"),
        )
        .withColumn("n_tok", F.size("tokens").cast("int"))
        .select("doc_id", "tokens", "n_tok", "source", "event_ts")
    )


def tokens_table_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The original all-Catalyst form of tokens_table (SPARK_TOKENS_EXPR
    per character, interpreted HOFs) — kept as the cross-implementation
    parity oracle for the fast mapInArrow path."""
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        df.select(
            F.col("doc_id").cast("string").alias("doc_id"),
            F.expr(SPARK_TOKENS_EXPR).alias("tokens"),
            F.col("source"),
            (F.to_timestamp(F.lit("2026-01-01 00:00:00"))
             + F.make_interval(secs=F.col("doc_id") * 37)).alias("event_ts"),
        )
        .withColumn("n_tok", F.size("tokens").cast("int"))
        .select("doc_id", "tokens", "n_tok", "source", "event_ts")
    )


def validate_tokens(df: DataFrame, min_tok: int, max_tok: int,
                    check_range: bool = False) -> DataFrame:
    """Row-validity predicate — analog of ``pre_compute_error_checks``
    (reference ``src/utilities.c:64-87``: min size, MAX_NUM_PIXELS cap,
    and read_image's out-of-range value rejection,
    ``src/image_processing.c:122-173``). A plain Catalyst filter.

    ``check_range`` additionally asserts every token is in [0, VOCAB_SIZE)
    — a JVM-side forall, for untrusted upstream tables."""
    out = df.filter((F.col("n_tok") >= min_tok) & (F.col("n_tok") <= max_tok)
                    & F.col("tokens").isNotNull())
    if check_range:
        out = out.filter(F.forall(
            "tokens", lambda t: (t >= 0) & (t < VOCAB_SIZE)))
    return out
