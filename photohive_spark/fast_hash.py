"""Vectorized (numpy) implementations of the engine's polynomial string
hash — bit-identical to the Catalyst higher-order-function forms, at
native-code speed.

Why this exists (optimization guide §4.2): Spark higher-order functions
(``transform``/``aggregate`` lambdas) are CodegenFallback — every element
is INTERPRETED in the JVM. The per-character poly hash
(``tokenize.SPARK_TOKENS_EXPR`` / ``dedup.poly_hash_expr``) therefore costs
~100x more than the same arithmetic on a flat numpy byte buffer. These
kernels run inside ``mapInArrow`` over the Arrow string buffers directly
(zero-copy offsets + data), so the whole hot loop is C.

Exactness contract: the recurrence ``acc = (acc*MULT + codepoint) % mod``
is pure integer arithmetic — the numpy forms below produce the SAME
integers as the interpreted SQL expressions for any input (pinned by
tests), so every DuckDB oracle stays hash-identical. Non-ASCII words fall
back to a per-word Python loop over Unicode codepoints (Spark's ``ascii``
/ ``substr`` operate on characters, not bytes); ASCII words — the common
case — stay fully vectorized.
"""

from __future__ import annotations

import numpy as np

from .config import VOCAB_SIZE
from .tokenize import TOKEN_MULT, TOKEN_SEED

MERSENNE = (1 << 31) - 1


def poly_hash_flat(data: np.ndarray, starts: np.ndarray, lens: np.ndarray,
                   mod: int, seed: int = TOKEN_SEED, mult: int = TOKEN_MULT,
                   want_pow: bool = False):
    """Poly hash of ``n`` words packed in one uint8 buffer.

    data: uint8 buffer (UTF-8); starts/lens: per-word byte offsets/lengths.
    Returns int64 array ``acc`` with acc_i = fold over the word's
    CODEPOINTS of (a*mult + c) % mod starting from ``seed``; if
    ``want_pow``, also returns ``mult**len_i % mod`` (the shift factor
    needed to splice per-word hashes into shingle hashes).

    Vectorized Horner over char positions with a shrinking active set
    (words sorted by length descending), so total work is O(total bytes).
    Words containing non-ASCII bytes are recomputed per codepoint in
    Python (exact Spark ``ascii(substr(w,i,1))`` semantics).
    """
    n = lens.size
    acc = np.full(n, seed, dtype=np.int64)
    pw = np.ones(n, dtype=np.int64) if want_pow else None
    if n == 0:
        return (acc, pw) if want_pow else acc
    order = np.argsort(-lens, kind="stable")
    st_s = starts[order].astype(np.int64)
    ln_s = lens[order].astype(np.int64)
    acc_s = np.full(n, seed, dtype=np.int64)
    pw_s = np.ones(n, dtype=np.int64) if want_pow else None
    maxlen = int(ln_s[0])
    # number of words with len > p, for p = 0..maxlen-1 (descending sort
    # => active words form a prefix)
    hist = np.bincount(ln_s, minlength=maxlen + 1)
    ge = np.cumsum(hist[::-1])[::-1]          # ge[L] = #words with len >= L
    for p in range(maxlen):
        cnt = int(ge[p + 1])
        if cnt == 0:
            break
        c = data[st_s[:cnt] + p].astype(np.int64)
        acc_s[:cnt] = (acc_s[:cnt] * mult + c) % mod
        if want_pow:
            pw_s[:cnt] = (pw_s[:cnt] * mult) % mod
    acc[order] = acc_s
    if want_pow:
        pw[order] = pw_s

    # exactness for non-ASCII: recompute affected words per codepoint
    if data.size and lens.size:
        hi = np.flatnonzero(data >= 128)
        if hi.size:
            # map non-ascii byte positions to word indices
            ends = starts + lens
            cand = np.searchsorted(starts, hi, side="right") - 1
            bad = np.unique(cand[(cand >= 0) & (hi < ends[cand])])
            for i in bad:
                w = bytes(data[starts[i]:ends[i]]).decode("utf-8")
                a = seed
                for ch in w:
                    a = (a * mult + ord(ch)) % mod
                acc[i] = a
                if want_pow:
                    pw[i] = pow(mult, len(w), mod)
    return (acc, pw) if want_pow else acc


def _string_buffers(arr):
    """(data uint8, starts int64, lens int64, n) of a pyarrow String/
    LargeString array, honoring the array's slice offset."""
    import pyarrow as pa

    if pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type):
        odt = np.int64
    else:
        odt = np.int32
    bufs = arr.buffers()
    off = np.frombuffer(bufs[1], dtype=odt,
                        count=arr.offset + len(arr) + 1)[arr.offset:]
    data = np.frombuffer(bufs[2], dtype=np.uint8)
    starts = off[:-1].astype(np.int64)
    lens = np.diff(off).astype(np.int64)
    return data, starts, lens


def split_words(texts):
    """Split a pyarrow string array on single spaces and drop empty words
    — exactly ``filter(split(text, ' '), w -> length(w) > 0)``.

    Returns (word_data uint8, word_starts, word_lens, doc_counts int64,
    null_mask bool) where words are packed doc-major in document order and
    ``doc_counts[d]`` is the number of kept words of doc d (0 for null
    texts, flagged in null_mask).
    """
    import pyarrow.compute as pc

    null_mask = np.asarray(texts.is_null())
    sp = pc.split_pattern(texts, " ")
    flat = sp.flatten()
    doc_off = np.asarray(sp.offsets, dtype=np.int64)
    data, starts, lens = _string_buffers(flat.combine_chunks()
                                         if hasattr(flat, "combine_chunks")
                                         else flat)
    keep = lens > 0
    ck = np.concatenate([[0], np.cumsum(keep, dtype=np.int64)])
    doc_counts = ck[doc_off[1:]] - ck[doc_off[:-1]]
    return data, starts[keep], lens[keep], doc_counts, null_mask


def tokenize_arrow_batch(texts):
    """tokens column for one Arrow batch of texts: list<int32> ListArray,
    same values as tokenize.SPARK_TOKENS_EXPR (null text -> null entry)."""
    import pyarrow as pa

    data, starts, lens, counts, null_mask = split_words(texts)
    toks = poly_hash_flat(data, starts, lens, VOCAB_SIZE).astype(np.int32)
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    if null_mask.any():
        return pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()), pa.array(toks),
            mask=pa.array(null_mask))
    return pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()), pa.array(toks))
