"""Structured Streaming layer: streaming feature extraction, watermarked
windowed aggregates, and stateful gap sessionization.

The reference is strictly batch-one-image (SURVEY §2.7); this module is the
engine's incremental-ingest path: new token sequences land as files (or a
Kafka topic in production), features are extracted with the SAME
Arrow-batched kernels as the batch path (stateless mapInPandas is
streaming-safe), and late data is bounded by event-time watermarks.

Scale notes: the feature stream is stateless => unbounded parallelism, no
state store; the windowed aggregate keeps O(windows x sources) state; the
sessionizer keeps one small state row per active key and emits sessions on
gap timeout — all standard Structured Streaming state-store behavior,
checkpointed for exactly-once restart.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F
import pyspark.sql.types as T

from .config import DEFAULT_CONFIG, EngineConfig
from .engine import FEATURE_SCHEMA, _make_kernel

TOKENS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("tokens", T.ArrayType(T.IntegerType())),
    T.StructField("n_tok", T.IntegerType()),
    T.StructField("source", T.StringType()),
    T.StructField("event_ts", T.TimestampType()),
])


def read_tokens_stream(spark: SparkSession, path: str,
                       max_files_per_trigger: int = 8) -> DataFrame:
    """File-source stream of input_hint-shaped parquet (the sandbox stand-in
    for a Kafka/Iceberg CDC source)."""
    return (spark.readStream.schema(TOKENS_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(path))


def stream_features(tokens_stream: DataFrame,
                    cfg: EngineConfig = DEFAULT_CONFIG) -> DataFrame:
    """Stateless streaming feature extraction — identical kernels/schema to
    the batch path, so batch and stream outputs are row-for-row equal."""
    cols = ["doc_id", "tokens", "n_tok", "source", "event_ts"]
    return tokens_stream.select(*cols).mapInPandas(_make_kernel(cfg),
                                                   FEATURE_SCHEMA)


def windowed_source_stats(tokens_stream: DataFrame,
                          window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Watermarked event-time windowed aggregate per source: row counts and
    mean n_tok. Late rows beyond the watermark are dropped (bounded state).
    """
    return (tokens_stream
            .withWatermark("event_ts", watermark)
            .groupBy(F.window("event_ts", window).alias("w"), "source")
            .agg(F.count("*").alias("n_docs"),
                 F.avg("n_tok").alias("avg_n_tok"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "source", "n_docs", "avg_n_tok"))


SESSION_OUT_SCHEMA = ("user_id bigint, session_start timestamp, "
                      "session_end timestamp, n_events bigint")
SESSION_STATE_SCHEMA = "start long, last long, n long"


def sessionize_stream(events_stream: DataFrame, gap_seconds: int = 1800,
                      watermark: str = "1 hour") -> DataFrame:
    """Stateful gap sessionization via applyInPandasWithState: one state row
    per active user; a session is emitted when the gap since its last event
    exceeds ``gap_seconds`` (decided on state timeout after the watermark
    passes). Same gap rule as the batch pit.sessionize."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_seconds * 1_000_000

    def fn(key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame([{
                "user_id": user_id,
                "session_start": pd.Timestamp(start, unit="us"),
                "session_end": pd.Timestamp(last, unit="us"),
                "n_events": n}])
            return
        ts_us: list[int] = []
        for pdf in pdfs:
            ts_us.extend(int(t.value // 1000) for t in pd.to_datetime(pdf["ts"]))
        ts_us.sort()
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = ts_us[0], ts_us[0], 0
        out = []
        # late events below the open session's start: first merge the
        # within-gap ones BACKWARD to fixpoint (each merge extends start
        # further down, which can pull in older events — e.g. start=1000,
        # gap=100, batch=[850, 950]: 950 merges, extending start to 950,
        # then 850 merges against the extended start; classifying against
        # the pre-batch start would mis-emit 850 as its own session).
        # What remains after the fixpoint can never merge; sessionize those
        # stragglers among THEMSELVES with the same gap rule and emit
        # (exact batch semantics within what's in hand — merging with
        # already-emitted history is the watermark tradeoff).
        below = [t for t in ts_us if n > 0 and t < start]
        ts_live = ts_us[len(below):]
        idx = len(below)
        while idx > 0 and below[idx - 1] >= start - gap_us:
            idx -= 1
            start = below[idx]
            n += 1
        stragglers = below[:idx]
        while stragglers:
            s0 = e0 = stragglers[0]
            cnt = 1
            for t in stragglers[1:]:
                if t - e0 > gap_us:
                    break
                e0 = t
                cnt += 1
            out.append({"user_id": user_id,
                        "session_start": pd.Timestamp(s0, unit="us"),
                        "session_end": pd.Timestamp(e0, unit="us"),
                        "n_events": cnt})
            stragglers = stragglers[cnt:]
        for t in ts_live:
            if t - last > gap_us and n > 0:
                out.append({"user_id": user_id,
                            "session_start": pd.Timestamp(start, unit="us"),
                            "session_end": pd.Timestamp(last, unit="us"),
                            "n_events": n})
                start, n = t, 0
            last = max(last, t)
            n += 1
        state.update((start, last, n))
        # the natural timeout is last+gap, but a group whose open session
        # trails the (other-group-driven) watermark — e.g. a batch of
        # merged stragglers that leaves ``last`` unchanged — would set a
        # timestamp Spark rejects as earlier than the watermark. Clamp to
        # watermark+1: the session is already expired, so the earliest
        # permissible firing (next microbatch) is the correct semantics.
        wm_ms = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(
            max(last // 1000 + gap_seconds * 1000, wm_ms + 1))
        if out:
            yield pd.DataFrame(out)

    return (events_stream
            .withWatermark("ts", watermark)
            .groupBy("user_id")
            .applyInPandasWithState(fn, SESSION_OUT_SCHEMA,
                                    SESSION_STATE_SCHEMA, "append",
                                    GroupStateTimeout.EventTimeTimeout))


def dedup_stream(docs_stream: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id",
                 watermark_col: str | None = None,
                 watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup: emit each content digest's FIRST arrival,
    drop every later duplicate — the incremental-ingest analog of
    dedup.exact_dedup (which keeps min id per digest in batch; a stream
    cannot know the eventual min, so first-arrival is the streaming
    contract, stable under replay because Structured Streaming's
    dropDuplicates state is checkpointed exactly-once).

    With ``watermark_col`` set, dropDuplicatesWithinWatermark bounds the
    digest state (late duplicates beyond the watermark may re-emit — the
    standard state-size/recall tradeoff at 10^12 docs, where unbounded
    digest state would hold one row per distinct doc forever); without it,
    state is exact and unbounded.
    """
    hashed = docs_stream.withColumn("digest", F.md5(F.col(text_col)))
    if watermark_col is not None:
        return (hashed.withWatermark(watermark_col, watermark)
                .dropDuplicatesWithinWatermark(["digest"]))
    return hashed.dropDuplicates(["digest"])


def asof_join_stream_static(probe_stream: DataFrame, snapshots: DataFrame,
                            key: str, probe_ts: str, snapshot_ts: str,
                            value_cols: list[str],
                            watermark: str = "1 hour") -> DataFrame:
    """Streaming point-in-time serving: each incoming probe row is joined to
    the latest snapshot (from a STATIC snapshot table) with
    snapshot_ts <= probe_ts — the online analog of pit.asof_join.

    Shape: stream-static left join on key + temporal predicate (the static
    side broadcasts if small), then a watermarked groupBy over the probe's
    identity taking max_by(payload, snapshot_ts). Zero temporal leakage by
    the same predicate as the batch path; state is bounded by the watermark.

    NOTE: byte-identical duplicate probe rows collapse to one output row
    (the groupBy key is the full probe row — a stable unique id can't be
    minted inside a restartable stream). Give probes a unique id column
    upstream if duplicates must be preserved.
    """
    cmp = F.col(f"s.{snapshot_ts}") <= F.col(f"p.{probe_ts}")
    probe_cols = [f.name for f in probe_stream.schema.fields]
    payload = F.struct(F.col(f"s.{snapshot_ts}").alias("matched_ts"),
                       *[F.col(f"s.{c}") for c in value_cols])
    joined = (probe_stream.withWatermark(probe_ts, watermark).alias("p")
              .join(snapshots.alias("s"),
                    on=[F.col(f"p.{key}") == F.col(f"s.{key}"), cmp],
                    how="left")
              .select(*[F.col(f"p.{c}").alias(c) for c in probe_cols],
                      payload.alias("_payload"),
                      F.col(f"s.{snapshot_ts}").alias("_sts")))
    agg = (joined.groupBy(*probe_cols)
           .agg(F.max_by("_payload", "_sts").alias("_best")))
    return agg.select(
        *probe_cols,
        F.col("_best.matched_ts").alias("matched_ts"),
        *[F.col(f"_best.{c}").alias(c) for c in value_cols])


def image_dedup_stream(media_stream: DataFrame,
                       on_error: str = "skip",
                       watermark_col: str | None = None,
                       watermark: str = "1 hour") -> DataFrame:
    """Streaming VISUAL dedup at ingest: REAL decode -> 64-bit pHash
    (stateless mapInPandas) -> first-arrival dropDuplicates on the
    hash. Exact perceptual duplicates (same image re-scraped, or
    re-encoded closely enough to share a pHash) are dropped as they
    arrive — the image counterpart of dedup_stream. Near-dup CLUSTERING
    (hamming > 0) stays a batch job (jobs/run_image_dedup.py): a stream
    cannot retroactively merge clusters. on_error defaults to 'skip'
    (scraped streams contain corrupt payloads).

    With ``watermark_col`` set (an event-time column on the media
    stream, carried through the hash stage via image_phash passthrough),
    dropDuplicatesWithinWatermark bounds the state store — without it,
    dropDuplicates holds one state row per distinct pHash FOREVER, which
    on a long-running ingest stream grows monotonically (same
    state-size/recall tradeoff as dedup_stream).

    FALSE-POSITIVE CAVEAT: dedup is on exact 64-bit pHash equality, and
    pHash collapses visually flat / low-frequency images (solid fills,
    simple gradients, logos on plain backgrounds) onto a few hash
    values — DISTINCT images that collide are silently and permanently
    dropped. Where that matters, keep ingest dedup exact (digest-based
    dedup_stream) and leave perceptual dedup to the batch job, which
    verifies hamming and keeps a representative per CLUSTER instead of
    per hash value."""
    from .multimodal import image_phash

    hashed = image_phash(
        media_stream, mode="real", on_error=on_error,
        passthrough=(watermark_col,) if watermark_col else ())
    if watermark_col is not None:
        return (hashed.withWatermark(watermark_col, watermark)
                .dropDuplicatesWithinWatermark(["phash"]))
    return hashed.dropDuplicates(["phash"])


def read_media_stream(spark: SparkSession, path: str,
                      max_files_per_trigger: int = 8) -> DataFrame:
    """File-source stream of opaque-binary media rows (MEDIA_SCHEMA
    parquet) — the incremental-ingest face of the image pipeline: newly
    scraped/encoded images land as files and flow through the SAME
    decode + report kernels as the batch path."""
    from .multimodal import MEDIA_SCHEMA

    return (spark.readStream.schema(MEDIA_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(path))


def image_report_stream(media_stream: DataFrame,
                        cfg: EngineConfig = DEFAULT_CONFIG,
                        mode: str = "real") -> DataFrame:
    """Streaming image_report: the batch operator is a stateless
    Arrow-batched mapInPandas (no shuffle, no state), so it lifts to
    Structured Streaming unchanged — batch and stream outputs are
    row-for-row equal (pinned by tests/test_streaming.py). Unbounded
    parallelism, no state store; real decode (PNG incl. Adam7/16-bit,
    baseline + progressive JPEG) happens inside the stream's tasks."""
    from .multimodal import image_report

    return image_report(media_stream, cfg=cfg, mode=mode)


def media_features_stream(media_stream: DataFrame,
                          cfg: EngineConfig = DEFAULT_CONFIG,
                          mode: str = "fake") -> DataFrame:
    """Streaming media_features (1-D sample-stream DSP features) — same
    stateless lift as image_report_stream. The default ``mode`` matches
    the BATCH operator ('fake') so lifting a pipeline never silently
    changes decode semantics; pass mode='real' for real ingest."""
    from .multimodal import media_features

    return media_features(media_stream, cfg=cfg, mode=mode)


def countmin_stream(tokens_stream: DataFrame, tokens_col: str = "tokens",
                    depth: int | None = None,
                    width: int | None = None) -> DataFrame:
    """Streaming CountMin: live token-frequency tracking on an unbounded
    stream with PROVABLY bounded state — the streaming aggregation keeps
    at most ``depth x width`` counter rows no matter how much data flows
    (contrast dedup_stream, whose state needs a watermark to stay
    bounded; the sketch bounds itself by construction). Query with
    outputMode('update'/'complete'); counters are CUMULATIVE and exactly
    equal the batch sketch over all rows seen so far. Merge caveat:
    because snapshots are cumulative, summing two snapshots of the SAME
    stream via sketch.cms_merge double-counts — cms_merge is for
    sketches over DISJOINT row sets (different streams / days); within
    one stream, always take the latest snapshot."""
    from . import sketch

    kwargs = {}
    if depth is not None:
        kwargs["depth"] = depth
    if width is not None:
        kwargs["width"] = width
    return sketch.countmin(tokens_stream, tokens_col, **kwargs)


def run_to_memory(stream_df: DataFrame, name: str, mode: str = "append"):
    """Drive a stream with availableNow into a memory sink (test harness)."""
    q = (stream_df.writeStream.format("memory").queryName(name)
         .outputMode(mode).trigger(availableNow=True).start())
    q.awaitTermination(120)
    return q
