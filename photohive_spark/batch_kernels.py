"""Length-grouped batched feature extraction — the Arrow-batch fast path.

``extract_features`` (kernels.py) computes one document at a time; inside a
mapInPandas batch that means hundreds of small numpy calls per row. This
module groups the batch's rows BY TOKEN LENGTH and runs each group as one
stacked (m, n) computation: one rfft for m docs, one bincount for m
histograms, etc. Pre-tokenized training corpora cluster hard at fixed
context lengths (truncation/padding), so groups are large exactly when it
matters.

Semantics: identical to kernels.extract_features (parity-tested at
rtol 1e-9 in tests/test_batch_kernels.py, exact for integer outputs).
The only intentional numeric difference is bandpass energy, computed here
by the circular-convolution theorem (rfft product) instead of direct
convolution — same math, FP differences ~1e-13 relative.

Per-doc small steps (palette ranking, peak walking) stay loops — they
operate on 112-cell / 72-angle aggregates, not token arrays.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from . import kernels as K
from .config import DEFAULT_CONFIG, VOCAB_SIZE, EngineConfig


@lru_cache(maxsize=4096)
def _band_onehot(nf: int, nb: int) -> np.ndarray:
    """(nf, nb) 0/1 matrix mapping frequency index -> band (matmul form of
    the banded mean's bincount)."""
    r_bin = K._freq_band_ids(nf, nb)
    out = np.zeros((nf, nb))
    out[np.arange(nf), r_bin] = 1.0
    return out


@lru_cache(maxsize=64)
def _bandpass_rfft(n: int, cfg: EngineConfig = DEFAULT_CONFIG) -> np.ndarray:
    """rfft of each Gabor kernel zero-padded to length n, for the circular
    convolution theorem; layout matches convolve_circular's (i-j)%n index."""
    bank = K.gabor_bank(cfg)
    taps = bank.shape[1]
    pad = np.zeros((bank.shape[0], n))
    for j in range(taps):           # fold taps modulo n: exact circular wrap
        pad[:, j % n] += bank[:, j]
    return np.fft.rfft(pad, axis=1)


def _lognorm_rows(p: np.ndarray) -> np.ndarray:
    """Row-wise pgm_normalize_fft (kernels.lognorm_power vectorized over the
    leading axis): per-row max -> G_s; x<1 -> 0."""
    flat = p.reshape(p.shape[0], -1)
    mx = flat.max(axis=1)
    safe_mx = np.maximum(mx, 1.0 + 1e-300)
    g_s = 1.0 / (2.0 * np.log(np.sqrt(safe_mx) + 1.0))
    with np.errstate(divide="ignore"):
        out = np.where(flat < 1.0, 0.0,
                       np.log(np.maximum(flat, 1e-300)) * g_s[:, None])
    out[mx <= 1.0] = 0.0
    return out.reshape(p.shape)


def _group_features(T: np.ndarray, cfg: EngineConfig) -> dict:
    """All features for one equal-length group. T: (m, n) int32, n >= 1."""
    m, n = T.shape
    Tl = T.astype(np.int64)
    x = Tl / float(VOCAB_SIZE)

    rms_mean = x.mean(axis=1)
    rms_std = np.sqrt(np.var(x, axis=1))

    h = 360.0 * (Tl % K.HUE_MOD) / float(K.HUE_MOD)
    s = (Tl % K.SAT_MOD) / float(K.SAT_MOD)
    v = Tl / float(VOCAB_SIZE)
    mean_norm = s.mean(axis=1)

    cells = cfg.hist_cells
    g = K.hist_bin_ids(h.ravel(), s.ravel(), v.ravel(), cfg).reshape(m, n)
    offs = (np.arange(m) * cells)[:, None]
    counts = np.bincount((g + offs).ravel(),
                         minlength=m * cells).reshape(m, cells).astype(np.int64)
    with np.errstate(divide="ignore", invalid="ignore"):
        p = counts / counts.sum(axis=1, keepdims=True)
        ent = -np.where(p > 0, p * np.log(np.where(p > 0, p, 1.0)), 0.0).sum(axis=1)

    # spectral family
    nb = cfg.radius_parts
    bands = np.zeros((m, nb))
    ac = np.zeros((m, cfg.autocorr_lags))
    if n >= 2:
        x0 = x - rms_mean[:, None]
        Fx = np.fft.rfft(x0, axis=1)
        P = np.abs(Fx) ** 2
        Pn = _lognorm_rows(P)
        nf = P.shape[1]
        nbb = min(nb, nf)
        B = _band_onehot(nf, nbb)
        quant = B.sum(axis=0)
        sums = Pn @ B
        nz = quant > 0
        bands[:, :nbb][:, nz] = sums[:, nz] / quant[nz]

        r = np.fft.irfft(P, n=n, axis=1)
        k = min(cfg.autocorr_lags, n)
        r0 = r[:, 0]
        ok = r0 > 0
        ac[ok, :k] = r[ok, :k] / r0[ok, None]

    # bandpass energy via circular convolution theorem
    bp = np.zeros((m, cfg.bandpass_filters))
    if n >= 1:
        H = _bandpass_rfft(n, cfg)               # (nfilt, nf)
        Xf = np.fft.rfft(x, axis=1)              # (m, nf)
        taps = cfg.bandpass_taps
        for fi in range(cfg.bandpass_filters):
            y = np.fft.irfft(Xf * H[fi][None, :], n=n, axis=1) / taps
            bp[:, fi] = (y * y).mean(axis=1)

    # sharpness_avg: zero-padded [-1,2,-1] correlation, vectorized shifts
    filt = 2.0 * x
    filt[:, :-1] -= x[:, 1:]
    filt[:, 1:] -= x[:, :-1]
    mask = filt > cfg.sharpness_threshold
    cnt = mask.sum(axis=1)
    ssum = np.where(mask, filt, 0.0).sum(axis=1)
    sh_avg = np.where(cnt > 0, ssum / np.maximum(cnt, 1), 0.0)

    # per-doc small aggregates: blur profile framing + peaks + palette
    peaks_list, pal_list = [], []
    na, nr = cfg.angle_parts, cfg.radius_parts
    if n >= 2:
        w = min(n, cfg.frame_width)
        hh = n // w
        planes = x[:, : hh * w].reshape(m, hh, w) - rms_mean[:, None, None]
        P2 = np.abs(np.fft.rfft2(planes, axes=(1, 2))) ** 2
        P2n = _lognorm_rows(P2)
        fh, fw = P2n.shape[1], P2n.shape[2]
        flat_lut = K._polar_bin_ids(fh, fw, na, nr)
        quant2 = np.bincount(flat_lut, minlength=na * nr)
        ids = (flat_lut[None, :] + (np.arange(m) * na * nr)[:, None]).ravel()
        sums2 = np.bincount(ids, weights=P2n.reshape(m, -1).ravel(),
                            minlength=m * na * nr).reshape(m, na * nr)
        nz2 = quant2 > 0
        prof = np.zeros((m, na * nr))
        prof[:, nz2] = sums2[:, nz2] / quant2[nz2]
        prof = prof.reshape(m, na, nr)
    else:
        prof = np.zeros((m, na, nr))
    for i in range(m):
        peaks_list.append(K.spectral_peaks(prof[i], cfg))
        pal_list.append(K.palette(h[i], s[i], v[i], cfg,
                                  g=g[i], counts=counts[i]))

    return {
        "rms_mean": rms_mean, "rms_std": rms_std, "mean_norm_value": mean_norm,
        "hist_counts": counts, "hist_entropy": ent, "palette": pal_list,
        "spectrum_bands": bands, "spectral_peaks": peaks_list,
        "autocorr": ac, "bandpass_energy": bp, "sharpness_avg": sh_avg,
    }


def batch_extract(token_arrays: list, cfg: EngineConfig = DEFAULT_CONFIG
                  ) -> list[dict]:
    """Features for a whole Arrow batch, grouped by token length.

    Returns one dict per input row (same shape as engine.features_row)."""
    out: list[dict | None] = [None] * len(token_arrays)
    groups: dict[int, list[int]] = {}
    for i, t in enumerate(token_arrays):
        n = 0 if t is None else len(t)
        groups.setdefault(n, []).append(i)

    empty = None
    for n, idxs in groups.items():
        if n == 0:
            if empty is None:
                from .engine import features_row
                empty = features_row(np.array([], dtype=np.int32), cfg)
            for i in idxs:
                out[i] = dict(empty)
            continue
        T = np.stack([np.asarray(token_arrays[i], dtype=np.int32)
                      for i in idxs])
        gf = _group_features(T, cfg)
        for row_pos, i in enumerate(idxs):
            out[i] = {
                "rms_mean": float(gf["rms_mean"][row_pos]),
                "rms_std": float(gf["rms_std"][row_pos]),
                "mean_norm_value": float(gf["mean_norm_value"][row_pos]),
                "hist_counts": gf["hist_counts"][row_pos].tolist(),
                "hist_entropy": float(gf["hist_entropy"][row_pos]),
                "palette": [{"h": ph, "s": ps, "v": pv, "pct": pp}
                            for (ph, ps, pv, pp) in gf["palette"][row_pos][:100]],
                "spectrum_bands": gf["spectrum_bands"][row_pos].tolist(),
                "spectral_peaks": [{"angle": int(a), "magnitude": float(mg)}
                                   for (a, mg) in gf["spectral_peaks"][row_pos][:10]],
                "autocorr": gf["autocorr"][row_pos].tolist(),
                "bandpass_energy": gf["bandpass_energy"][row_pos].tolist(),
                "sharpness_avg": float(gf["sharpness_avg"][row_pos]),
            }
    return out
