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


def _banded_means(Pn: np.ndarray, nb: int) -> np.ndarray:
    """Row-wise banded means of a (m, nf) spectrum via one offset bincount —
    no cached (nf, nb) matrix (a 1M-token doc would make that ~160 MB), and
    O(m*nf) instead of the one-hot matmul's O(m*nf*nb)."""
    m, nf = Pn.shape
    r_bin = K._freq_band_ids(nf, nb)
    ids = (r_bin[None, :] + (np.arange(m) * nb)[:, None]).ravel()
    sums = np.bincount(ids, weights=Pn.ravel(), minlength=m * nb).reshape(m, nb)
    quant = np.bincount(r_bin, minlength=nb)
    out = np.zeros((m, nb))
    nz = quant > 0
    out[:, nz] = sums[:, nz] / quant[nz]
    return out


def _bandpass_energy_batch(x: np.ndarray, cfg: EngineConfig) -> np.ndarray:
    """Batched circular-convolution energies, direct form: for a 15-tap
    bank the direct product (O(taps*n), one matmul for ALL filters) beats
    FFT convolution (3 transforms per filter per row). Implements exactly
    convolve_circular's wrap-pad + 'valid' convolve: windows of the
    circularly extended signal dotted with the flipped kernels."""
    from numpy.lib.stride_tricks import sliding_window_view

    m, n = x.shape
    bank = K.gabor_bank(cfg)
    nfilt, taps = bank.shape
    if n < taps:                       # tiny rows: fold taps modulo n, then
        folded = np.zeros((nfilt, n))  # same windowed product with k=n
        for j in range(taps):
            folded[:, j % n] += bank[:, j]
        coefs, k = folded, n
    else:
        coefs, k = bank, taps
    pad = np.concatenate([x[:, -(k - 1):], x], axis=1) if k > 1 else x
    # GEMM path only while the materialized (m, n, k) window tensor stays
    # small (<=256 MB): a 10k-row Arrow batch of 4096-token docs would
    # otherwise allocate ~5 GB per worker
    if n <= 4096 and m * n * k * 8 <= 256_000_000:
        win = np.ascontiguousarray(sliding_window_view(pad, k, axis=1))
        y = win.reshape(m * n, k) @ (coefs[:, ::-1].T / taps)  # (m*n, nfilt)
        y = y.reshape(m, n, nfilt)
        return (y * y).mean(axis=1)
    # long rows: per-row C convolve — Python overhead is negligible and it
    # avoids materializing the (m, n, taps) window tensor
    out = np.empty((m, nfilt))
    for r in range(m):
        for fi in range(nfilt):
            yr = np.convolve(pad[r], coefs[fi], mode="valid") / taps
            out[r, fi] = (yr * yr).mean()
    return out


@lru_cache(maxsize=32)
def _bandpass_acf_weights(cfg: EngineConfig, k_eff: int):
    """Per-filter lag weights W[f, d] = sum_u c_u c_{u-d} (d = 0..k-1) of
    the (possibly length-folded) Gabor bank, plus per-filter coefficient
    sums — the quadratic-form constants for _bandpass_energy_acf."""
    bank = K.gabor_bank(cfg)
    nfilt, taps = bank.shape
    if k_eff < taps:                   # tiny rows: taps folded modulo n
        coefs = np.zeros((nfilt, k_eff))
        for j in range(taps):
            coefs[:, j % k_eff] += bank[:, j]
    else:
        coefs = bank
    W = np.stack([np.correlate(c, c, mode="full")[len(c) - 1:]
                  for c in coefs])
    return W, coefs.sum(axis=1), coefs.shape[1], taps


def _bandpass_energy_acf(x: np.ndarray, cfg: EngineConfig,
                         mu: np.ndarray, r: np.ndarray) -> np.ndarray:
    """Gabor bandpass energies from the centered circular autocorrelation
    ``r`` (= irfft(|rfft(x - mu)|^2)) — algebraically identical to
    _bandpass_energy_batch's direct circular convolution:

        E_f = mean_t (sum_u c_u x[(t-u) mod n] / taps)^2
            = (1/(n*taps^2)) sum_{u,v} c_u c_v R_raw((u-v) mod n)

    with R_raw(d) = r[d mod n] + n*mu^2 (raw vs centered circular acf
    differ by exactly n*mu^2 at every lag). The FFT work is already paid
    by the autocorrelation feature; this combine is O(m * nfilt * taps)."""
    m, n = x.shape
    taps0 = K.gabor_bank(cfg).shape[1]
    W, sw, k, taps = _bandpass_acf_weights(cfg, min(n, taps0))
    E = W[:, 0][None, :] * r[:, 0][:, None]
    if k > 1:
        idx_pos = np.arange(1, k) % n
        idx_neg = (-np.arange(1, k)) % n
        E = E + (W[:, 1:][None, :, :]
                 * (r[:, idx_pos][:, None, :]
                    + r[:, idx_neg][:, None, :])).sum(axis=2)
    E = E + (sw ** 2)[None, :] * (n * mu ** 2)[:, None]
    return E / (n * taps ** 2)


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


@lru_cache(maxsize=8)
def _saliency_weights(cfg: EngineConfig = DEFAULT_CONFIG) -> np.ndarray:
    nh, ns, nv = K.cell_nominals(cfg)
    return (cfg.quantity_weight
            + cfg.saturation_value_weight * ns * nv) * 1000.0


def _palette_assign(counts: np.ndarray, cfg: EngineConfig):
    """Parent selection + nearest-parent rank assignment from per-row
    cell counts alone (row-local, so it batches over ANY row set).

    Returns (n_par (m,), order (m, cells), rank_lookup (m, cells)) with
    rank_lookup valid at OCCUPIED cells only (the only cells tokens can
    reference). Parent selection orders by (saliency desc, cell asc) via
    stable argsort; the argmin over masked distance rows is computed
    only for occupied (row, cell) pairs — the dense (m, cells, pmax)
    tensor would be ~3x pure waste — and np.argmin's FIRST-minimum is
    exactly the per-doc tie rule (first occurrence in saliency order).
    Rows with zero counts get n_par = 0 (no tokens, no palette)."""
    m, cells = counts.shape
    D = K._distance_matrix(cfg)                          # (cells, cells)
    sal = counts * _saliency_weights(cfg)[None, :]
    order = np.argsort(-sal, axis=1, kind="stable")       # sal desc, cell asc
    totals = counts.sum(axis=1)
    goals = np.maximum(1, (totals * cfg.coverage_thresh).astype(np.int64))
    c_sorted = np.take_along_axis(counts, order, axis=1)
    cum_prev = np.cumsum(c_sorted, axis=1) - c_sorted
    keep = cum_prev < goals[:, None]                      # (m, cells) in order-space
    n_par = np.where(totals > 0, keep.sum(axis=1), 0)

    pmax0 = int(n_par.max()) if m else 0
    occ_r, occ_c = np.nonzero(counts)                     # row-major
    nearest_occ = np.empty(occ_r.size, dtype=np.int64)
    ranks = np.arange(pmax0)
    slab = max(1, int(4_000_000 // max(1, pmax0)))
    for lo in range(0, occ_r.size, slab):
        hi_ = min(occ_r.size, lo + slab)
        rs, cs = occ_r[lo:hi_], occ_c[lo:hi_]
        Dvals = D[cs[:, None], order[rs, :pmax0]]         # (slab, pmax)
        Dvals[ranks[None, :] >= n_par[rs, None]] = np.inf
        nearest_occ[lo:hi_] = np.argmin(Dvals, axis=1)
    rank_lookup = np.zeros((m, cells), dtype=np.int64)
    rank_lookup[occ_r, occ_c] = nearest_occ
    return n_par, order, rank_lookup


def _hist_entropy_global(g: np.ndarray, row_of: np.ndarray, n_rows: int,
                         cfg: EngineConfig):
    """Per-row 112-cell histogram + entropy over a FLAT (ragged) token
    stream — integer-exact counts; the entropy expression and its
    per-row reduction tree are identical to the per-group form."""
    cells = cfg.hist_cells
    counts = np.bincount(row_of * cells + g, minlength=n_rows * cells)         .reshape(n_rows, cells).astype(np.int64)
    with np.errstate(divide="ignore", invalid="ignore"):
        p = counts / counts.sum(axis=1, keepdims=True)
        ent = -np.where(p > 0, p * np.log(np.where(p > 0, p, 1.0)),
                        0.0).sum(axis=1)
    return counts, ent


def _palette_global(h: np.ndarray, s: np.ndarray, v: np.ndarray,
                    g: np.ndarray, row_of: np.ndarray, nd_row: np.ndarray,
                    counts: np.ndarray, cfg: EngineConfig):
    """_palette_core over a FLAT (ragged) token stream for ALL rows of a
    batch at once. Value-identical to the per-group rectangular form:
    every op is row-local (assignment) or a per-(row, rank) bincount
    whose within-bucket accumulation order equals the rectangular
    row-major order; pct multiplies by the same per-row 1.0/nd double."""
    N = counts.shape[0]
    nh, _, _ = K.cell_nominals(cfg)
    n_par, order, rank_lookup = _palette_assign(counts, cfg)
    pmax = int(n_par.max()) if N else 0
    if pmax == 0:
        z = np.zeros((N, 0))
        return n_par, z, z, z, z
    rank_flat = rank_lookup[row_of, g]
    flat_ids = row_of * pmax + rank_flat
    minlen = N * pmax
    cnts = np.bincount(flat_ids, minlength=minlen).reshape(N, pmax)
    offsets = 180.0 - nh[order[:, :pmax]]                 # (N, pmax)
    tmp = h + offsets[row_of, rank_flat]
    tmp = np.where(tmp > 360.0, tmp - 360.0, tmp)
    tmp = np.where(tmp < 0.0, tmp + 360.0, tmp)
    sum_h = np.bincount(flat_ids, weights=tmp,
                        minlength=minlen).reshape(N, pmax)
    sum_s = np.bincount(flat_ids, weights=s,
                        minlength=minlen).reshape(N, pmax)
    sum_v = np.bincount(flat_ids, weights=v,
                        minlength=minlen).reshape(N, pmax)
    with np.errstate(divide="ignore"):
        inv_n = np.where(nd_row > 0, 1.0 / np.maximum(nd_row, 1), 0.0)
    valid = cnts > 0
    safe = np.maximum(cnts, 1)
    h_avg = sum_h / safe - offsets
    h_avg = np.where(h_avg < 0, h_avg + 360.0, h_avg)
    h_avg = np.where(h_avg > 360.0, h_avg - 360.0, h_avg)
    h_avg = np.where(valid, h_avg, 0.0)
    s_avg = np.where(valid, sum_s / safe, 0.0)
    v_avg = np.where(valid, sum_v / safe, 0.0)
    pct = np.where(valid, cnts * inv_n[:, None], 0.0)
    return n_par, h_avg, s_avg, v_avg, pct


def _palette_core(h: np.ndarray, s: np.ndarray, v: np.ndarray,
                  g: np.ndarray, counts: np.ndarray,
                  cfg: EngineConfig):
    """Vectorized K.palette across an equal-length group — FLAT outputs.

    Returns (n_par int64 (m,), h_avg, s_avg, v_avg, pct) where the value
    matrices are (m, pmax) with entries valid for rank < n_par[row].

    Replicates the per-doc semantics exactly, including the tie rules:
    parent selection orders by (saliency desc, cell asc) via stable argsort;
    nearest-parent assignment breaks exact distance ties by saliency rank
    (= first occurrence in the per-doc argmin over parents order).
    Parity-tested row-for-row in tests/test_batch_kernels.py."""
    m, n = g.shape
    nh, _, _ = K.cell_nominals(cfg)
    n_par, order, rank_lookup = _palette_assign(counts, cfg)
    rank_of_tok = np.take_along_axis(rank_lookup, g, axis=1)        # (m, n)

    # --- grouped circular-mean averages via offset bincounts ---
    pmax = int(n_par.max()) if m else 0
    flat_ids = (np.arange(m)[:, None] * pmax + rank_of_tok).ravel()
    minlen = m * pmax
    cnts = np.bincount(flat_ids, minlength=minlen).reshape(m, pmax)

    # offsets per (row, rank): 180 - nominal hue of that rank's parent cell
    # order[:, :pmax] are the parent cells in rank order (keep is a prefix)
    offsets = 180.0 - nh[order[:, :pmax]]                 # (m, pmax)
    tmp = h + np.take_along_axis(offsets, rank_of_tok, axis=1)
    tmp = np.where(tmp > 360.0, tmp - 360.0, tmp)
    tmp = np.where(tmp < 0.0, tmp + 360.0, tmp)
    sum_h = np.bincount(flat_ids, weights=tmp.ravel(),
                        minlength=minlen).reshape(m, pmax)
    sum_s = np.bincount(flat_ids, weights=s.ravel(),
                        minlength=minlen).reshape(m, pmax)
    sum_v = np.bincount(flat_ids, weights=v.ravel(),
                        minlength=minlen).reshape(m, pmax)

    # vectorized averages (empty ranks -> all-zero entries, as per-doc)
    inv_n = 1.0 / n
    valid = cnts > 0
    safe = np.maximum(cnts, 1)
    h_avg = sum_h / safe - offsets
    h_avg = np.where(h_avg < 0, h_avg + 360.0, h_avg)
    h_avg = np.where(h_avg > 360.0, h_avg - 360.0, h_avg)
    h_avg = np.where(valid, h_avg, 0.0)
    s_avg = np.where(valid, sum_s / safe, 0.0)
    v_avg = np.where(valid, sum_v / safe, 0.0)
    pct = np.where(valid, cnts * inv_n, 0.0)
    return n_par, h_avg, s_avg, v_avg, pct


def _palette_batch(h: np.ndarray, s: np.ndarray, v: np.ndarray,
                   g: np.ndarray, counts: np.ndarray,
                   cfg: EngineConfig) -> list:
    """Per-row list view of _palette_core (the legacy/test API)."""
    n_par, h_avg, s_avg, v_avg, pct = _palette_core(h, s, v, g, counts, cfg)
    out = []
    for r in range(g.shape[0]):
        k = int(n_par[r])
        out.append(list(zip(h_avg[r, :k].tolist(), s_avg[r, :k].tolist(),
                            v_avg[r, :k].tolist(), pct[r, :k].tolist())))
    return out


def _peaks_core(prof: np.ndarray, cfg: EngineConfig):
    """Vectorized K.spectral_peaks across an equal-shape group — FLAT
    output (rows_idx, angle, magnitude), row-major, cap 10 per row.

    prof: (m, na, nr). Per-doc profiling showed the row loop over
    K.spectral_peaks dominating kernel time (~41 of 137 core-seconds at
    1M rows) — each call is Python loop + several tiny numpy allocs.

    Faithful to the per-doc path:
    - the wrap-aware end checks of vectorize_blur_profile collapse to
      uniform circular neighbor comparisons (i=0 compares against na-1 and
      1; i=na-1 against na-2 and 0 — exactly np.roll semantics);
    - stage-1 magnitudes (incl. the undivided-i==0 quirk) are computed by
      the reference but DISCARDED by stage 2 (`for angle, _mag in maxima`),
      so only the peak ANGLE set must match — magnitudes here come solely
      from stage 2;
    - smoothing is the trailing circular box-5 (convolve_circular with
      ones(5)): sum of rolls 0..4 over the angle axis / 5;
    - stage-2 blur_avg == tot[row, perp_angle] (same contiguous slice-sum);
      first-below-threshold radius via boolean argmax (exact index match);
      float32 division order replicated elementwise.
    Row-for-row parity with K.spectral_peaks is pinned by the existing
    batch-vs-perdoc tests and the frozen golden snapshot."""
    m, na, nr = prof.shape
    rc = nr // cfg.cutoff_ratio_denom
    tot = prof[:, :, :rc].sum(axis=2)                       # (m, na)
    avg = tot.sum(axis=1) / na                              # (m,)
    # accumulate OLDEST-first (roll 4 down to 0) — the exact FP order of
    # convolve_circular's np.convolve inner loop; tie-heavy profiles
    # (constant regions) make peak selection sensitive to last-ulp
    # rounding, so the order must match for row-for-row parity
    smooth = sum(np.roll(tot, j, axis=1) for j in (4, 3, 2, 1, 0)) / 5.0
    mask = ((smooth > np.roll(smooth, 1, axis=1))
            & (smooth > np.roll(smooth, -1, axis=1))
            & (smooth > (avg * cfg.fft_streak_thresh)[:, None]))
    deg = np.array([int(180.0 * (np.float32(a) / np.float32(na)) - 90.0)
                    for a in range(na)])
    half = na // 2
    rows_idx, ang_idx = np.nonzero(mask)
    # cap 10 per row BEFORE gathering (position within each row's run)
    bounds = np.searchsorted(rows_idx, np.arange(m + 1))
    pos = np.arange(rows_idx.size) - bounds[rows_idx]
    keep = pos < 10
    rows_idx, ang_idx = rows_idx[keep], ang_idx[keep]
    # stage 2 only for the (few) peak pairs — scanning the whole (m, na, nr)
    # profile for first-below radii cost more than everything else combined
    pa = (ang_idx + half) % na
    sig = prof[rows_idx, pa]                                # (npairs, nr)
    bel = sig < cfg.magnitude_thresh
    fb = np.where(bel.any(axis=1), bel.argmax(axis=1), nr)
    zero_out = tot[rows_idx, pa] > avg[rows_idx]
    mags = (fb.astype(np.float32) / np.float32(nr)).astype(np.float64)
    degs = deg[pa]
    ang_flat = np.where(zero_out, 0, degs).astype(np.int64)
    mag_flat = np.where(zero_out, 0.0, mags)
    return rows_idx, ang_flat, mag_flat


def _peaks_batch(prof: np.ndarray, cfg: EngineConfig) -> list[list]:
    """Per-row list view of _peaks_core (the legacy/test API)."""
    rows_idx, ang_flat, mag_flat = _peaks_core(prof, cfg)
    out: list[list] = [[] for _ in range(prof.shape[0])]
    for i in range(rows_idx.size):
        out[rows_idx[i]].append((int(ang_flat[i]), float(mag_flat[i])))
    return out


def _peaks_core_1d(prof_r: np.ndarray, angle: int, cfg: EngineConfig):
    """_peaks_core for the single-occupied-angle case (hh == 1): the
    dense profile is prof[:, a, :] == prof_r when a == angle, else
    zeros. Every summation replicates the dense pairwise tree exactly
    (adding exact +0.0 is an FP identity), so the output is
    bit-identical to _peaks_core on the equivalent dense profile —
    pinned by tests — without ever allocating the (m, na, nr) zeros."""
    m, nr = prof_r.shape
    na = cfg.angle_parts
    rc = nr // cfg.cutoff_ratio_denom
    tot = np.zeros((m, na))
    tot[:, angle] = prof_r[:, :rc].sum(axis=1)
    avg = tot.sum(axis=1) / na
    smooth = sum(np.roll(tot, j, axis=1) for j in (4, 3, 2, 1, 0)) / 5.0
    mask = ((smooth > np.roll(smooth, 1, axis=1))
            & (smooth > np.roll(smooth, -1, axis=1))
            & (smooth > (avg * cfg.fft_streak_thresh)[:, None]))
    deg = _deg_table(na)
    half = na // 2
    rows_idx, ang_idx = np.nonzero(mask)
    bounds = np.searchsorted(rows_idx, np.arange(m + 1))
    pos = np.arange(rows_idx.size) - bounds[rows_idx]
    keep = pos < 10
    rows_idx, ang_idx = rows_idx[keep], ang_idx[keep]
    pa = (ang_idx + half) % na
    sig = np.where((pa == angle)[:, None], prof_r[rows_idx], 0.0)
    bel = sig < cfg.magnitude_thresh
    fb = np.where(bel.any(axis=1), bel.argmax(axis=1), nr)
    zero_out = tot[rows_idx, pa] > avg[rows_idx]
    mags = (fb.astype(np.float32) / np.float32(nr)).astype(np.float64)
    degs = deg[pa]
    ang_flat = np.where(zero_out, 0, degs).astype(np.int64)
    mag_flat = np.where(zero_out, 0.0, mags)
    return rows_idx, ang_flat, mag_flat


def _dense_profile(P2n: np.ndarray, flat_lut: np.ndarray,
                   m: int, na: int, nr: int) -> np.ndarray:
    """Dense (m, na, nr) polar-binned profile (the hh > 1 path)."""
    quant2 = np.bincount(flat_lut, minlength=na * nr)
    ids = (flat_lut[None, :] + (np.arange(m) * na * nr)[:, None]).ravel()
    sums2 = np.bincount(ids, weights=P2n.reshape(m, -1).ravel(),
                        minlength=m * na * nr).reshape(m, na * nr)
    nz2 = quant2 > 0
    prof = np.zeros((m, na * nr))
    prof[:, nz2] = sums2[:, nz2] / quant2[nz2]
    return prof.reshape(m, na, nr)


@lru_cache(maxsize=8)
def _deg_table(na: int) -> np.ndarray:
    return np.array([int(180.0 * (np.float32(a) / np.float32(na)) - 90.0)
                     for a in range(na)])


def _group_features(T: np.ndarray, cfg: EngineConfig,
                    timings: dict[str, float] | None = None,
                    flat: bool = False,
                    spectral_only: bool = False) -> dict:
    """All features for one equal-length group. T: (m, n) int32, n >= 1.

    ``timings`` (optional) accumulates wall seconds per kernel FAMILY —
    the per-stage analog of the reference's timing macros
    (``src/utilities.h:10-18`` / README.md:63-75's 11 timed stages):
    stats_s (rms+spectrum+sharpness), hist_s, autocorr_s, bandpass_s,
    blur_fft_s (2-D framing+profile), palette_s, peaks_s."""
    from time import perf_counter as _pc

    def _mark(name: str, t0: float) -> float:
        t1 = _pc()
        if timings is not None:
            timings[name] = timings.get(name, 0.0) + (t1 - t0)
        return t1

    m, n = T.shape
    Tl = T.astype(np.int64)
    x = Tl / float(VOCAB_SIZE)

    _t = _pc()
    st = signal_stats_batch(x, cfg)
    _t = _mark("stats_s", _t)
    rms_mean, rms_std = st["rms_mean"], st["rms_std"]

    # downsample applies to the hsv/histogram/palette path ONLY — the
    # reference runs stats/FFT on the ORIGINAL image (src/interface.c:39-50);
    # stride slicing keeps the group rectangular so batching is preserved
    Td = Tl[:, ::cfg.downsample_rate] if cfg.downsample_rate > 1 else Tl
    nd = Td.shape[1]
    if spectral_only:
        # r7 Arrow path: the hsv/hist/palette family runs ONCE per batch
        # on the flat token stream (_hsv_hist_global) — only mean_norm
        # stays here because its np.mean pairwise-summation tree needs
        # the rectangular group (a ragged reduceat would change the FP
        # tree of an oracle-rounded output)
        s = (Td % K.SAT_MOD) / float(K.SAT_MOD)
        mean_norm = s.mean(axis=1)
        h = s = v = g = counts = ent = None
        _t = _mark("hist_s", _t)
    else:
        h = 360.0 * (Td % K.HUE_MOD) / float(K.HUE_MOD)
        s = (Td % K.SAT_MOD) / float(K.SAT_MOD)
        v = x if cfg.downsample_rate <= 1 else Td / float(VOCAB_SIZE)
        mean_norm = s.mean(axis=1)

        cells = cfg.hist_cells
        g = K.hist_bin_ids(h.ravel(), s.ravel(), v.ravel(), cfg).reshape(m, nd)
        offs = (np.arange(m) * cells)[:, None]
        counts = np.bincount((g + offs).ravel(),
                             minlength=m * cells).reshape(m, cells).astype(np.int64)
        with np.errstate(divide="ignore", invalid="ignore"):
            p = counts / counts.sum(axis=1, keepdims=True)
            ent = -np.where(p > 0, p * np.log(np.where(p > 0, p, 1.0)),
                            0.0).sum(axis=1)
        _t = _mark("hist_s", _t)

    # spectral family: bands from the shared stats; autocorr reuses the
    # power spectrum (Wiener–Khinchin) instead of a second rfft
    bands = st["spectrum_bands"]
    sh_avg = st["sharpness_avg"]
    ac = np.zeros((m, cfg.autocorr_lags))
    if st["power"] is not None:
        P = st["power"]
        r = np.fft.irfft(P, n=n, axis=1)
        k = min(cfg.autocorr_lags, n)
        r0 = r[:, 0]
        ok = r0 > 0
        ac[ok, :k] = r[ok, :k] / r0[ok, None]
    else:
        r = np.zeros((m, n))      # n == 1: centered circular acf is 0
    _t = _mark("autocorr_s", _t)

    # bandpass energy (r7): quadratic form over the circular
    # autocorrelation already in hand — E_f = (1/(n*taps^2)) *
    # sum_{u,v} c_u c_v R_raw((u-v) mod n) with R_raw(d) = r[d] + n*mu^2,
    # so the whole Gabor bank costs one tiny (k x nfilt) combine per row
    # instead of a windowed convolution. Equal to the direct form to
    # ~1e-14 relative (parity-tested; tolerance 1e-7).
    bp = _bandpass_energy_acf(x, cfg, rms_mean, r)
    _t = _mark("bandpass_s", _t)

    # blur profile framing + batched peaks + palette
    na, nr = cfg.angle_parts, cfg.radius_parts
    prof = None                       # dense (m, na, nr) — hh > 1 only
    prof_r = None                     # compact single-angle radius profile
    prof_angle = 0
    if n >= 2:
        w = min(n, cfg.frame_width)
        hh = n // w
        if hh == 1:
            # r7 single-row fast path. Two exact identities:
            # (1) rfft2 of the (m, 1, w) plane == the 1-D rfft of the
            #     SAME centered signal already computed for the stats
            #     (bit-identical, pinned by tests) — so no second FFT;
            # (2) the 1-row spectrum's polar LUT maps every bin to ONE
            #     angle, so the (m, na*nr) dense profile is a single
            #     (m, nr) radius profile + zeros. Building only the
            #     compact profile cuts ~23 KB/row of pure-zero memory
            #     traffic, the bandwidth bottleneck at 32 cores.
            P2n = _lognorm_rows(P[:, : w // 2 + 1])
            fw = P2n.shape[1]
            flat_lut = K._polar_bin_ids(1, fw, na, nr)
            angles = np.unique(flat_lut // nr)
            if angles.size == 1:
                prof_angle = int(angles[0])
                r_bin = flat_lut % nr
                quant_r = np.bincount(r_bin, minlength=nr)
                ids = (r_bin[None, :]
                       + (np.arange(m) * nr)[:, None]).ravel()
                sums_r = np.bincount(ids, weights=P2n.ravel(),
                                     minlength=m * nr).reshape(m, nr)
                nzr = quant_r > 0
                prof_r = np.zeros((m, nr))
                prof_r[:, nzr] = sums_r[:, nzr] / quant_r[nzr]
            else:                     # defensive: fall through to dense
                prof = _dense_profile(P2n.reshape(m, 1, fw), flat_lut,
                                      m, na, nr)
        else:
            planes = x[:, : hh * w].reshape(m, hh, w) \
                - rms_mean[:, None, None]
            P2 = np.abs(np.fft.rfft2(planes, axes=(1, 2))) ** 2
            P2n = _lognorm_rows(P2)
            fh, fw = P2n.shape[1], P2n.shape[2]
            flat_lut = K._polar_bin_ids(fh, fw, na, nr)
            prof = _dense_profile(P2n, flat_lut, m, na, nr)
    else:
        prof_r = np.zeros((m, nr))    # n == 1: all-zero profile
    _t = _mark("blur_fft_s", _t)
    out = {
        "rms_mean": rms_mean, "rms_std": rms_std, "mean_norm_value": mean_norm,
        "hist_counts": counts, "hist_entropy": ent,
        "spectrum_bands": bands,
        "autocorr": ac, "bandpass_energy": bp, "sharpness_avg": sh_avg,
    }
    def peaks_flat():
        if prof is not None:
            return _peaks_core(prof, cfg)
        return _peaks_core_1d(prof_r, prof_angle, cfg)

    if flat:
        # r7 Arrow path: keep palette/peaks as flat numpy structures —
        # the per-row list assembly below is exactly the cost the Arrow
        # output path removes
        if not spectral_only:
            out["palette_flat"] = _palette_core(h, s, v, g, counts, cfg)
        _t = _mark("palette_s", _t)
        out["peaks_flat"] = peaks_flat()
        _t = _mark("peaks_s", _t)
        return out
    out["palette"] = _palette_batch(h, s, v, g, counts, cfg)
    _t = _mark("palette_s", _t)
    rows_idx, ang_flat, mag_flat = peaks_flat()
    pk: list[list] = [[] for _ in range(m)]
    for i in range(rows_idx.size):
        pk[rows_idx[i]].append((int(ang_flat[i]), float(mag_flat[i])))
    out["spectral_peaks"] = pk
    _t = _mark("peaks_s", _t)
    return out


def length_groups(arrays: list) -> dict[int, list[int]]:
    """Group row indices by array length (None counts as 0) — the shared
    scatter key for every equal-length batched computation (token path in
    batch_extract, media path in multimodal.media_features)."""
    groups: dict[int, list[int]] = {}
    for i, a in enumerate(arrays):
        n = 0 if a is None else len(a)
        groups.setdefault(n, []).append(i)
    return groups


def signal_stats_batch(X: np.ndarray, cfg: EngineConfig = DEFAULT_CONFIG
                       ) -> dict:
    """rms / spectrum-band / sharpness stats for an equal-length (m, n)
    float batch — the SINGLE implementation shared by the token path
    (_group_features) and the media path (multimodal.media_features).
    Row-for-row parity with kernels.rms_stats / spectrum_bands /
    sharpness_avg. Also returns the raw ``power`` spectrum (None for
    n < 2) so callers can derive autocorrelation without a second rfft."""
    m, n = X.shape
    rms_mean = X.mean(axis=1)
    rms_std = np.sqrt(np.var(X, axis=1))
    nb = cfg.radius_parts
    bands = np.zeros((m, nb))
    P = None
    if n >= 2:
        P = np.abs(np.fft.rfft(X - rms_mean[:, None], axis=1)) ** 2
        Pn = _lognorm_rows(P)
        nbb = min(nb, P.shape[1])
        bands[:, :nbb] = _banded_means(Pn, nbb)
    # sharpness_avg: zero-padded [-1,2,-1] correlation, vectorized shifts
    filt = 2.0 * X
    filt[:, :-1] -= X[:, 1:]
    filt[:, 1:] -= X[:, :-1]
    mask = filt > cfg.sharpness_threshold
    cnt = mask.sum(axis=1)
    ssum = np.where(mask, filt, 0.0).sum(axis=1)
    sh_avg = np.where(cnt > 0, ssum / np.maximum(cnt, 1), 0.0)
    return {"rms_mean": rms_mean, "rms_std": rms_std,
            "spectrum_bands": bands, "sharpness_avg": sh_avg, "power": P}


_SCALAR_COLS = ("rms_mean", "rms_std", "mean_norm_value", "hist_entropy",
                "sharpness_avg")
_ARRAY_COLS = ("hist_counts", "spectrum_bands", "autocorr", "bandpass_energy")


def batch_extract_columns(token_arrays: list,
                          cfg: EngineConfig = DEFAULT_CONFIG,
                          rois_list: list | None = None,
                          timings: dict[str, float] | None = None) -> dict:
    """Features for a whole Arrow batch as COLUMNS, grouped by token length
    — the mapInPandas fast path. Scalar columns are filled with one
    vectorized numpy scatter per group (zero per-row Python); array columns
    get ndarray row VIEWS of the group results (no per-row .tolist() —
    pyarrow converts ndarray cells directly); only the struct columns
    (palette, spectral_peaks) remain per-row list builds. Profiling at 1M
    rows showed the previous per-row dict assembly + engine-side pivot
    costing ~50 of ~190 kernel core-seconds.

    ``rois_list`` (optional, parallel to ``token_arrays``) carries per-row
    [(start, end), ...] crop boundaries; ``timings`` (optional dict)
    accumulates per-kernel-family wall seconds (see _group_features).

    Returns {column name -> length-N list (object cols) or np.ndarray
    (scalar cols)} with the same values as engine.features_row per row."""
    N = len(token_arrays)
    scal = {c: np.zeros(N) for c in _SCALAR_COLS}
    obj: dict[str, list] = {c: [None] * N for c in
                            (*_ARRAY_COLS, "palette", "spectral_peaks")}
    sharp: list[list] = [[] for _ in range(N)]
    groups = length_groups(token_arrays)

    empty = None
    for n, idxs in groups.items():
        if n == 0:
            if empty is None:
                from .engine import features_row
                empty = features_row(np.array([], dtype=np.int32), cfg)
            for i in idxs:
                for c in _SCALAR_COLS:
                    scal[c][i] = empty[c]
                for c in _ARRAY_COLS:
                    obj[c][i] = list(empty[c])
                obj["palette"][i] = list(empty["palette"])
                obj["spectral_peaks"][i] = list(empty["spectral_peaks"])
            continue
        T = np.stack([np.asarray(token_arrays[i], dtype=np.int32)
                      for i in idxs])
        gf = _group_features(T, cfg, timings)
        ix = np.asarray(idxs)
        for c in _SCALAR_COLS:
            scal[c][ix] = gf[c]
        counts, bands = gf["hist_counts"], gf["spectrum_bands"]
        ac, bp = gf["autocorr"], gf["bandpass_energy"]
        pals, pks = gf["palette"], gf["spectral_peaks"]
        for row_pos, i in enumerate(idxs):
            obj["hist_counts"][i] = counts[row_pos]
            obj["spectrum_bands"][i] = bands[row_pos]
            obj["autocorr"][i] = ac[row_pos]
            obj["bandpass_energy"][i] = bp[row_pos]
            obj["palette"][i] = [{"h": ph, "s": ps, "v": pv, "pct": pp}
                                 for (ph, ps, pv, pp) in pals[row_pos][:100]]
            obj["spectral_peaks"][i] = [
                {"angle": int(a), "magnitude": float(mg)}
                for (a, mg) in pks[row_pos][:10]]
    if rois_list is not None:
        for i, rois in enumerate(rois_list):
            if not rois:
                continue
            t = token_arrays[i]
            x = (np.asarray(t, dtype=np.float64) / VOCAB_SIZE
                 if t is not None else np.array([], dtype=np.float64))
            sharp[i] = [float(v) for v in K.sharpness_rois(x, rois)]
    return {**scal, **obj, "sharpness": sharp}


def batch_extract(token_arrays: list, cfg: EngineConfig = DEFAULT_CONFIG,
                  rois_list: list | None = None,
                  timings: dict[str, float] | None = None) -> list[dict]:
    """Row-dict view of batch_extract_columns (the reference/test API —
    one dict per input row, same shape as engine.features_row, plain
    Python lists in array cells)."""
    cols = batch_extract_columns(token_arrays, cfg, rois_list, timings)
    out = []
    for i in range(len(token_arrays)):
        row = {c: float(cols[c][i]) for c in _SCALAR_COLS}
        for c in _ARRAY_COLS:
            cell = cols[c][i]
            row[c] = cell.tolist() if isinstance(cell, np.ndarray) else list(cell)
        row["hist_counts"] = [int(v) for v in row["hist_counts"]]
        row["palette"] = cols["palette"][i]
        row["spectral_peaks"] = cols["spectral_peaks"][i]
        row["sharpness"] = cols["sharpness"][i]
        out.append(row)
    return out

# ---------------------------------------------------------------------------
# r7: Arrow-native batch extraction — zero pandas, zero per-row Python on
# the output path. Input is the tokens ListArray straight from the
# mapInArrow record batch (flat values + offsets, no per-row ndarray
# materialization); outputs are pyarrow arrays built from flat numpy
# buffers (fixed-width features via one reshape, palette/peaks via a
# segmented scatter). Values are IDENTICAL to batch_extract_columns
# (same _group_features per length group) — parity-pinned in tests.
# ---------------------------------------------------------------------------

def _scatter_varlen(n_rows: int, row_ids: np.ndarray, seg_lens: np.ndarray,
                    flats: list):
    """Reorder group-major variable-length segments into row order.

    ``row_ids``: target row per segment (one segment per row, group-major
    concatenation order); ``seg_lens``: entries per segment; ``flats``:
    value arrays aligned with the segment concatenation. Returns
    (row_lens, [reordered flats])."""
    row_lens = np.zeros(n_rows, dtype=np.int64)
    row_lens[row_ids] = seg_lens
    out_off = np.concatenate([[0], np.cumsum(row_lens)])
    total = int(out_off[-1])
    val_row = np.repeat(row_ids, seg_lens)
    seg_off = np.concatenate([[0], np.cumsum(seg_lens)])[:-1]
    within = np.arange(total, dtype=np.int64) - np.repeat(seg_off, seg_lens)
    pos = out_off[val_row] + within
    outs = []
    for f in flats:
        o = np.empty(total, dtype=f.dtype)
        o[pos] = f
        outs.append(o)
    return row_lens, outs


def batch_extract_arrow(tokens_arr, cfg: EngineConfig = DEFAULT_CONFIG,
                        rois_list: list | None = None,
                        timings: dict[str, float] | None = None) -> dict:
    """Features for one Arrow batch as PYARROW ARRAYS, computed from the
    tokens ListArray directly. Row-for-row the same values as
    batch_extract_columns (parity-pinned); only the data path differs:

    - input: one flat int32 gather per length group (no per-row
      np.asarray + np.stack);
    - fixed-width outputs (hist_counts, spectrum_bands, autocorr,
      bandpass_energy): (N, W) scatter + one ListArray over the raveled
      buffer;
    - palette / spectral_peaks: flat struct children + offsets via
      _scatter_varlen — no per-row list-of-dict assembly at all.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    N = len(tokens_arr)
    lens = pc.fill_null(pc.list_value_length(tokens_arr), 0) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    vals = tokens_arr.flatten().to_numpy(zero_copy_only=False)
    starts = np.concatenate([[0], np.cumsum(lens)])[:-1]

    scal = {c: np.zeros(N) for c in _SCALAR_COLS}
    nb, nl = cfg.radius_parts, cfg.autocorr_lags
    nf = K.gabor_bank(cfg).shape[0]
    bands_mat = np.zeros((N, nb))
    ac_mat = np.zeros((N, nl))
    bp_mat = np.zeros((N, nf))
    pk_rows, pk_ang, pk_mag = [], [], []

    # --- hsv / histogram / palette family: ONE pass over the flat
    # (downsampled) token stream for the whole batch (r7) — every op is
    # row-local or a per-(row, key) bincount, so the values are
    # identical to the per-length-group form (parity-pinned) while the
    # ~90 per-group argsorts/bincounts collapse into one each ---
    from time import perf_counter as _pc
    _t0 = _pc()
    rate = cfg.downsample_rate
    row_of = np.repeat(np.arange(N, dtype=np.int64), lens)
    if rate > 1:
        within = np.arange(vals.size, dtype=np.int64)             - np.repeat(starts, lens)
        dmask = (within % rate) == 0
        fvals = vals[dmask]
        row_of = row_of[dmask]
        nd_row = np.bincount(row_of, minlength=N).astype(np.int64)
    else:
        fvals = vals
        nd_row = lens
    Tl = fvals.astype(np.int64)
    h_f = 360.0 * (Tl % K.HUE_MOD) / float(K.HUE_MOD)
    s_f = (Tl % K.SAT_MOD) / float(K.SAT_MOD)
    v_f = Tl / float(VOCAB_SIZE)
    g_f = (K.hist_bin_ids(h_f, s_f, v_f, cfg) if Tl.size
           else np.zeros(0, dtype=np.int64))
    hist_mat, ent_g = _hist_entropy_global(g_f, row_of, N, cfg)
    scal["hist_entropy"][:] = ent_g
    if timings is not None:
        timings["hist_s"] = timings.get("hist_s", 0.0) + (_pc() - _t0)
    _t0 = _pc()
    n_par, h_avg, s_avg, v_avg, pct = _palette_global(
        h_f, s_f, v_f, g_f, row_of, nd_row, hist_mat, cfg)
    n_cap = np.minimum(n_par, 100)              # features_row's [:100] cap
    vmask = np.arange(h_avg.shape[1])[None, :] < n_cap[:, None]
    pal_lens_g = n_cap
    pal_flat_g = [mat[vmask] for mat in (h_avg, s_avg, v_avg, pct)]
    if timings is not None:
        timings["palette_s"] = timings.get("palette_s", 0.0) + (_pc() - _t0)

    for n in np.unique(lens):
        idx = np.flatnonzero(lens == n)
        if n == 0:
            from .engine import features_row
            empty = features_row(np.array([], dtype=np.int32), cfg)
            for c in _SCALAR_COLS:
                scal[c][idx] = empty[c]
            hist_mat[idx] = np.asarray(empty["hist_counts"], dtype=np.int64)
            bands_mat[idx] = np.asarray(empty["spectrum_bands"])
            ac_mat[idx] = np.asarray(empty["autocorr"])
            bp_mat[idx] = np.asarray(empty["bandpass_energy"])
            continue
        T = vals[starts[idx][:, None] + np.arange(n)].astype(np.int32)
        gf = _group_features(T, cfg, timings, flat=True, spectral_only=True)
        for c in ("rms_mean", "rms_std", "mean_norm_value", "sharpness_avg"):
            scal[c][idx] = gf[c]
        bands_mat[idx] = gf["spectrum_bands"]
        ac_mat[idx] = gf["autocorr"]
        bp_mat[idx] = gf["bandpass_energy"]
        rows_idx, ang, mag = gf["peaks_flat"]
        pk_rows.append(idx[rows_idx])
        pk_ang.append(ang)
        pk_mag.append(mag)

    def fixed_list(mat, pa_type):
        offs = pa.array((np.arange(N + 1, dtype=np.int64)
                         * mat.shape[1]).astype(np.int32), type=pa.int32())
        return pa.ListArray.from_arrays(
            offs, pa.array(mat.ravel(), type=pa_type))

    out = {
        "rms_mean": pa.array(scal["rms_mean"]),
        "rms_std": pa.array(scal["rms_std"]),
        "mean_norm_value": pa.array(scal["mean_norm_value"]),
        "hist_counts": fixed_list(hist_mat, pa.int64()),
        "hist_entropy": pa.array(scal["hist_entropy"]),
        "spectrum_bands": fixed_list(bands_mat, pa.float64()),
        "autocorr": fixed_list(ac_mat, pa.float64()),
        "bandpass_energy": fixed_list(bp_mat, pa.float64()),
        "sharpness_avg": pa.array(scal["sharpness_avg"]),
    }

    # palette: the global pass emits flats already in row order
    hh, ss, vv, pp = pal_flat_g
    pal_struct = pa.StructArray.from_arrays(
        [pa.array(hh), pa.array(ss), pa.array(vv), pa.array(pp)],
        names=["h", "s", "v", "pct"])
    out["palette"] = pa.ListArray.from_arrays(
        pa.array(np.concatenate([[0], np.cumsum(pal_lens_g)])
                 .astype(np.int32), type=pa.int32()), pal_struct)

    # spectral peaks (capped at 10 inside _peaks_core). Stable sort by
    # target row restores row order; within-row order is preserved since
    # each row lives in exactly one group.
    if pk_rows:
        prow = np.concatenate(pk_rows)
        order = np.argsort(prow, kind="stable")
        pang = np.concatenate(pk_ang)[order]
        pmag = np.concatenate(pk_mag)[order]
        row_cnt = np.bincount(prow, minlength=N).astype(np.int64)
    else:
        row_cnt = np.zeros(N, dtype=np.int64)
        pang = np.zeros(0, dtype=np.int64)
        pmag = np.zeros(0)
    pk_struct = pa.StructArray.from_arrays(
        [pa.array(pang.astype(np.int32), type=pa.int32()), pa.array(pmag)],
        names=["angle", "magnitude"])
    out["spectral_peaks"] = pa.ListArray.from_arrays(
        pa.array(np.concatenate([[0], np.cumsum(row_cnt)])
                 .astype(np.int32), type=pa.int32()), pk_struct)

    # per-ROI sharpness (rare path; per-row python, as before)
    if rois_list is not None and any(rois_list):
        sharp = []
        for i, rois in enumerate(rois_list):
            if not rois:
                sharp.append([])
                continue
            x = vals[starts[i]:starts[i] + lens[i]].astype(np.float64) \
                / VOCAB_SIZE
            sharp.append([float(t) for t in K.sharpness_rois(x, rois)])
        out["sharpness"] = pa.array(sharp, type=pa.list_(pa.float64()))
    else:
        out["sharpness"] = pa.ListArray.from_arrays(
            pa.array(np.zeros(N + 1, dtype=np.int32), type=pa.int32()),
            pa.array(np.zeros(0)))
    return out
