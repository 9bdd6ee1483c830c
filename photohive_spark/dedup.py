"""Deduplication suite for training-data pipelines: exact, MinHash+LSH,
SimHash, n-gram Jaccard, embedding-cosine near-dup.

All implementations are pure DataFrame plans (JVM-side built-ins only — no
Python UDFs anywhere in this module), so Catalyst handles partial
aggregation, AQE handles skewed shingles, and every groupBy is a single
shuffle. Hash functions are the engine's poly-hash (tokenize.word_token
semantics) so the DuckDB oracle can reproduce every number exactly.

Scale notes (100 TB):
- exact dedup: md5 digest groupBy — one shuffle on the digest (uniform by
  construction, no skew);
- MinHash: signatures via P min() aggregates over exploded shingles (ONE
  shuffle, map-side partial min), LSH banding via explode(bands) + self-join
  on band key — candidate generation never compares all pairs;
- stop-word-like hot shingles would skew the shingle explode; mitigated by
  distinct-per-doc before the join and AQE skew split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F

from .config import VOCAB_SIZE
from .tokenize import TOKEN_MULT, TOKEN_SEED

# MinHash universal-hash constants: h_j(x) = (A[j]*x + B[j]) mod MERSENNE,
# deterministic (seeded) so Spark, DuckDB oracle, and tests agree.
MERSENNE = (1 << 31) - 1
NUM_PERM = 16
LSH_BANDS = 4          # 4 bands x 4 rows
_A = [(37 * (j + 1) ** 2 + 11) % MERSENNE for j in range(NUM_PERM)]
_B = [(101 * (j + 1) + 7919 * j * j) % MERSENNE for j in range(NUM_PERM)]

SIMHASH_BITS = 32


def poly_hash_expr(col_sql: str, mod: int = MERSENNE) -> str:
    """Spark SQL snippet hashing a string column with the engine poly hash
    (same recurrence as tokenize.word_token, wider modulus)."""
    return (f"aggregate(transform(sequence(1, length({col_sql})), "
            f"i -> ascii(substr({col_sql}, i, 1))), "
            f"cast({TOKEN_SEED} as bigint), (a, b) -> (a * {TOKEN_MULT} + b) % {mod})")


def duckdb_poly_hash(col_sql: str, mod: int = MERSENNE) -> str:
    """DuckDB equivalent of poly_hash_expr."""
    return (f"list_reduce(list_prepend(cast({TOKEN_SEED} as bigint), "
            f"list_transform(range(1, len({col_sql})+1), "
            f"i -> cast(ascii(substr({col_sql}, i, 1)) as bigint))), "
            f"(a, b) -> (a * {TOKEN_MULT} + b) % {mod})")


def exact_dedup(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Exact dedup by content digest: keep the min id per md5(text).
    Returns (doc_id, digest, dup_count)."""
    return (docs
            .select(F.col(id_col), F.md5(F.col(text_col)).alias("digest"))
            .groupBy("digest")
            .agg(F.min(id_col).alias(id_col),
                 F.count("*").alias("dup_count")))


def _word_gram_rows(docs: DataFrame, text_col: str, id_col: str,
                    k: int) -> DataFrame:
    """Shared k-gram scaffolding for both shingle builders: one row per
    kept gram start position with columns (id_col, _pos, _w, _keep).

    posexplode_OUTER so a zero-word doc still yields one row (null
    _pos/_w) — the HOF form and the DuckDB oracle emit one empty-string
    shingle for empty docs (sequence(1, greatest(1, ...))), and dropping
    them would silently exempt empty docs from dedup/decontamination and
    break Spark-vs-oracle parity. Short docs (< k words) keep only
    position 0 (the single all-words gram)."""
    arr = docs.select(
        F.col(id_col),
        F.expr(f"filter(split({text_col}, ' '), w -> length(w) > 0)")
        .alias("_ws"))
    # word count carried from the array itself — a count-over-partition
    # window here would add a second window stage to every consumer
    words = arr.select(
        F.col(id_col), F.size("_ws").alias("_nw"),
        F.posexplode_outer("_ws").alias("_pos", "_w"))
    nw = F.col("_nw")
    keep = (F.col("_pos").isNull()
            | (F.col("_pos") + (k - 1) < nw)
            | ((F.col("_pos") == 0) & (nw <= k - 1)))
    return words.withColumn("_keep", keep)


def word_shingles(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", k: int = 3,
                  distinct: bool = True) -> DataFrame:
    """Distinct word k-gram shingles per doc: (doc_id, shingle string).
    ``distinct=False`` skips the per-doc dedup exchange for consumers
    whose aggregate is multiset-invariant (MinHash min()); set-counting
    consumers (Jaccard verify, decontaminate, ngram) need the default.

    Codegen form: posexplode the words (one shallow HOF filter per doc),
    then assemble each k-gram with window lead()s + concat_ws (which
    skips the null leads of a short doc, reproducing the single
    all-words shingle; an empty doc's all-null row becomes the ""
    shingle), then distinct. Set-identical to the original all-HOF form
    (split -> transform(sequence) -> array_join -> array_distinct), which
    ran INTERPRETED per element (Spark HOFs are CodegenFallback) and
    dominated 500k-doc dedup profiles; the window pays one exchange on
    id_col instead."""
    if distinct:
        # r7: distinct shingles per doc in ONE vectorized mapInArrow
        # stage (fast_hash.shingles_arrow — pyarrow take/binary_join for
        # the strings, dictionary_encode for EXACT per-doc dedup). Same
        # row set as the window form (parity-pinned); removes the window
        # exchange+sort AND the distinct exchange. Assumes one row per
        # id (true of every caller): the old global .distinct() would
        # additionally merge byte-identical duplicate-id rows.
        import pyarrow as pa

        src = docs.select(id_col, text_col)
        id_type = src.schema[id_col].dataType.simpleString()

        def f(batches):
            from photohive_spark.fast_hash import shingles_arrow
            for b in batches:
                names = b.schema.names
                doc_idx, grams = shingles_arrow(
                    b.column(names.index(text_col)), k)
                ids = b.column(names.index(id_col)).take(pa.array(doc_idx))
                yield pa.RecordBatch.from_arrays(
                    [ids, grams], [id_col, "shingle"])

        return src.mapInArrow(f, f"{id_col} {id_type}, shingle string")
    rows = _word_gram_rows(docs, text_col, id_col, k)
    win = Window.partitionBy(id_col).orderBy("_pos")
    parts = [F.col("_w")] + [F.lead("_w", j).over(win) for j in range(1, k)]
    out = (rows.withColumn("shingle", F.concat_ws(" ", *parts))
           .where("_keep").select(id_col, "shingle"))
    return out.distinct() if distinct else out


def fast_shingle_hashes(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 3) -> DataFrame:
    """(doc_id, h) hashed word-k-gram shingles — the SCALE path.

    Two design rules learned by measurement at 500k docs:
    - the oracle-parity path (shingle STRINGS + per-character poly hash)
      costs ~510 s — per-char higher-order calls dominate everything;
    - even a word-level rewrite INSIDE higher-order functions
      (transform/aggregate lambdas) still cost ~265 s, because Spark HOFs
      are CodegenFallback — every lambda element is INTERPRETED.
    So this path stays in whole-stage codegen end to end: posexplode the
    words (one shallow HOF filter per doc), xxhash64 each word as a plain
    projection, and combine the k word hashes with window lead()s
    (mod 2^31-1, multiplier 31 — products stay < 2^36, no ANSI overflow).
    Measured: 265 s -> ~20 s for the signature stage.

    Output is NOT distinct-per-doc: MinHash's min() is identical over
    multiset and set, so deduplicating shingles first would only add a
    shuffle (exact Jaccard verification uses the string path separately).
    Short docs (< k words) produce one shingle combining all words and an
    empty doc one constant hash (so byte-identical empty docs still
    collide), mirroring word_shingles. The window costs ONE exchange on
    id_col, which the downstream minhash groupBy(id_col) then reuses."""
    rows = _word_gram_rows(docs, text_col, id_col, k).withColumn(
        "_h", F.pmod(F.xxhash64("_w"), F.lit(MERSENNE)))
    win = Window.partitionBy(id_col).orderBy("_pos")
    comb = F.col("_h")
    for j in range(1, k):
        hj = F.lead("_h", j).over(win)
        comb = F.when(hj.isNotNull(),
                      F.pmod(comb * 31 + hj, F.lit(MERSENNE))).otherwise(comb)
    return (rows.withColumn("h", F.coalesce(comb, F.lit(0)))
            .where("_keep").select(id_col, "h"))


def minhash_signatures(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", k: int = 3,
                       num_perm: int = NUM_PERM,
                       hash_fn: str = "poly") -> DataFrame:
    """(doc_id, sig array<bigint>[num_perm]) MinHash signatures.

    One shuffle: explode shingles -> groupBy(doc) with num_perm min()
    aggregates (map-side partial min makes this cheap).

    ``hash_fn``: "poly" (default) = per-character poly hash, exactly
    reproducible in DuckDB — the oracle-checked semantics; "fast" =
    fast_shingle_hashes (xxhash64 word hashes, ~30x cheaper — the path to
    run at 10^12 docs; same banding statistics, different hash values)."""
    if hash_fn == "fast":
        hashed = fast_shingle_hashes(docs, text_col, id_col, k)
    elif hash_fn == "poly":
        # r7: the oracle-exact poly path now computes the whole signature
        # per doc inside ONE vectorized mapInArrow stage (fast_hash.
        # minhash_sig_arrow): per-word char hashes are spliced into gram
        # hashes algebraically, so each character is read once (not once
        # per covering gram) in numpy instead of the interpreted HOF —
        # and the explode -> groupBy(id) shuffle disappears entirely
        # (zero Exchange for the signature stage). Integers are identical
        # (parity pinned by tests), so banding candidates — and therefore
        # emitted pairs — are unchanged.
        return _minhash_sig_arrow_df(docs, text_col, id_col, k, num_perm)
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    mins = [F.min((F.lit(_A[j]) * F.col("h") + F.lit(_B[j])) % F.lit(MERSENNE))
            .alias(f"m{j}") for j in range(num_perm)]
    agg = hashed.groupBy(id_col).agg(*mins)
    return agg.select(F.col(id_col),
                      F.array(*[f"m{j}" for j in range(num_perm)]).alias("sig"))


def minhash_signatures_expr(docs: DataFrame, text_col: str = "text",
                            id_col: str = "doc_id", k: int = 3,
                            num_perm: int = NUM_PERM) -> DataFrame:
    """The original interpreted-HOF poly form (shingle strings, per-char
    hash, explode + groupBy mins) — kept as the cross-implementation
    parity oracle for the vectorized mapInArrow path."""
    sh = word_shingles(docs, text_col, id_col, k, distinct=False)
    hashed = sh.withColumn("h", F.expr(poly_hash_expr("shingle")))
    mins = [F.min((F.lit(_A[j]) * F.col("h") + F.lit(_B[j])) % F.lit(MERSENNE))
            .alias(f"m{j}") for j in range(num_perm)]
    agg = hashed.groupBy(id_col).agg(*mins)
    return agg.select(F.col(id_col),
                      F.array(*[f"m{j}" for j in range(num_perm)]).alias("sig"))


def _minhash_sig_arrow_df(docs: DataFrame, text_col: str, id_col: str,
                          k: int, num_perm: int) -> DataFrame:
    """(id_col, sig array<bigint>) via the vectorized per-doc kernel."""
    import numpy as np
    import pyarrow as pa

    src = docs.select(id_col, text_col)
    id_type = src.schema[id_col].dataType.simpleString()
    a_consts, b_consts = _A[:num_perm], _B[:num_perm]

    def f(batches):
        from photohive_spark.fast_hash import minhash_sig_arrow
        for b in batches:
            names = b.schema.names
            texts = b.column(names.index(text_col))
            sig = minhash_sig_arrow(texts, k, a_consts, b_consts)
            n, p = sig.shape
            offs = pa.array((np.arange(n + 1, dtype=np.int64) * p)
                            .astype(np.int32), type=pa.int32())
            arr = pa.ListArray.from_arrays(offs, pa.array(sig.ravel()))
            yield pa.RecordBatch.from_arrays(
                [b.column(names.index(id_col)), arr], [id_col, "sig"])

    return src.mapInArrow(f, f"{id_col} {id_type}, sig array<bigint>")


def minhash_lsh_pairs(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", k: int = 3,
                      num_perm: int = NUM_PERM, bands: int = LSH_BANDS,
                      threshold: float = 0.5,
                      max_bucket_size: int | None = None,
                      materialize: str = "local_checkpoint",
                      hash_fn: str = "poly",
                      cache_handle: list | None = None) -> DataFrame:
    """Candidate near-dup pairs via LSH banding, verified with exact
    shingle Jaccard. Returns (id_a, id_b, jaccard) with id_a < id_b,
    jaccard >= threshold.

    Shape: sig -> explode bands -> self-join on (band_idx, band_sig) ->
    distinct pairs -> exact-verify join against shingle sets. The exact
    verify is itself a shuffle-on-shingle join, but only over candidate
    docs (semi-join pushdown), so at scale the full corpus never self-joins.

    ``max_bucket_size``: dup-heavy corpora put many docs in one band
    bucket, and the within-bucket self-join is quadratic. Buckets above
    the cap switch to STAR pairing — every member pairs with the bucket's
    min id only (O(n) pairs) — so a corpus with 10^6 identical docs emits
    ~10^6 candidates, not ~10^12. RECALL CAVEAT: star candidates are
    verified against the representative, so two members whose Jaccard to
    the rep falls below ``threshold`` lose their member<->member pair even
    if it would have passed (possible when a giant bucket mixes a
    hash-collision outlier with true dups). Size the cap well above the
    expected dup-cluster width; the cap is a blowup guard, not a
    semantics-preserving optimization. Default None = exact banding (the
    oracle-checked semantics).

    ``hash_fn="fast"`` switches candidate generation to xxhash64 word
    hashes (see fast_shingle_hashes — ~30x cheaper than the per-character
    oracle hash, the 10^12-doc path). The exact-Jaccard VERIFY stage is
    shared and string-exact either way, so emitted pairs stay exact; only
    banding recall statistics depend on the hash (equivalent for any
    uniform hash).
    """
    rows = num_perm // bands
    sig = minhash_signatures(docs, text_col, id_col, k, num_perm, hash_fn)
    band_arr = F.array(*[
        F.struct(F.lit(b).alias("band"),
                 F.concat_ws(",", *[F.col("sig")[b * rows + r].cast("string")
                                    for r in range(rows)]).alias("bsig"))
        for b in range(bands)])
    banded = sig.select(F.col(id_col), F.explode(band_arr).alias("bk")) \
                .select(id_col, "bk.band", "bk.bsig") \
                .repartition("band", "bsig")
    # ^ r7: one explicit exchange on the join key. The self-join below
    # then REUSES a single shuffle for both aliases (ReusedExchange), so
    # the signature subtree is computed once — before r7 the groupBy
    # inside the signature stage provided that barrier for free; the
    # mapInArrow signature path has no exchange of its own, and without
    # this the planner recomputed the whole signature stage per alias
    # and join planning ran statless (measured 3-6x slower and unstable).

    if max_bucket_size is not None:
        stats = (banded.groupBy("band", "bsig")
                 .agg(F.count("*").alias("_bn"), F.min(id_col).alias("_rep")))
        keyed = banded.join(stats, on=["band", "bsig"])
        small = keyed.where(F.col("_bn") <= max_bucket_size) \
                     .select(id_col, "band", "bsig")
        pairs_small = (small.alias("x").join(small.alias("y"),
                                             on=["band", "bsig"], how="inner")
                       .where(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
                       .select(F.col(f"x.{id_col}").alias("id_a"),
                               F.col(f"y.{id_col}").alias("id_b")))
        pairs_big = (keyed.where((F.col("_bn") > max_bucket_size)
                                 & (F.col(id_col) != F.col("_rep")))
                     .select(F.col("_rep").alias("id_a"),
                             F.col(id_col).alias("id_b")))
        cand = pairs_small.unionByName(pairs_big).distinct()
    else:
        cand = (banded.alias("x").join(banded.alias("y"),
                                       on=["band", "bsig"], how="inner")
                .where(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
                .select(F.col(f"x.{id_col}").alias("id_a"),
                        F.col(f"y.{id_col}").alias("id_b"))
                .distinct())
    # materialize candidates once: verify_jaccard consumes them twice (id
    # semi-join + intersection join) and recomputing the whole LSH banding
    # subtree per consumer doubles the cost. Strategy is a knob because the
    # tradeoffs differ by deployment:
    # - "local_checkpoint" (default, right for local/ephemeral runs):
    #   truncates lineage AND lets the ContextCleaner release blocks when
    #   the plan is GC'd (r1 leaked an unreleased persist()); BUT losing an
    #   executor holding checkpoint blocks is unrecoverable — no recompute
    #   path.
    # - "checkpoint": reliable checkpoint to spark.checkpoint.dir —
    #   survives executor loss; costs an fs write. Right for multi-node
    #   clusters.
    # - "persist": keeps lineage (recomputable on block loss). Pass
    #   ``cache_handle=[]`` to receive the persisted candidates DataFrame
    #   (appended to the list) so you can ``handle.unpersist()`` after
    #   materializing the result — an attribute on the returned DataFrame
    #   would be lost on the first downstream transformation, which is why
    #   the out-param exists. Without a handle, blocks are still released
    #   by the ContextCleaner once the plan is GC'd, just not promptly.
    if materialize == "local_checkpoint":
        cand = cand.localCheckpoint(eager=False)
    elif materialize == "checkpoint":
        cand = cand.checkpoint(eager=False)
    elif materialize == "persist":
        cand = cand.persist()
    elif materialize != "none":
        raise ValueError(f"unknown materialize strategy {materialize!r}")
    if materialize != "none" and cache_handle is not None:
        cache_handle.append(cand)
    return verify_jaccard(cand, docs, text_col, id_col, k, threshold)


def word_shingle_arrays(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 3) -> DataFrame:
    """(id_col, shingles array<string>, n_sh) — each doc's DISTINCT
    word-k-gram shingle SET as one array row, emitted straight from the
    vectorized builder (fast_hash.shingles_arrow): no explode, no
    groupBy/collect_list, zero shuffles. Same sets as
    word_shingles(distinct=True) grouped per doc."""
    import pyarrow as pa

    src = docs.select(id_col, text_col)
    id_type = src.schema[id_col].dataType.simpleString()

    def f(batches):
        import numpy as np

        from photohive_spark.fast_hash import shingles_arrow
        for b in batches:
            names = b.schema.names
            texts = b.column(names.index(text_col))
            doc_idx, grams = shingles_arrow(texts, k)
            n = len(texts)
            cnt = np.bincount(doc_idx, minlength=n).astype(np.int64)
            offs = pa.array(np.concatenate([[0], np.cumsum(cnt)])
                            .astype(np.int32), type=pa.int32())
            arr = pa.ListArray.from_arrays(offs, grams)
            yield pa.RecordBatch.from_arrays(
                [b.column(names.index(id_col)), arr,
                 pa.array(cnt, type=pa.int64())],
                [id_col, "shingles", "n_sh"])

    return src.mapInArrow(
        f, f"{id_col} {id_type}, shingles array<string>, n_sh bigint")


def verify_jaccard(pairs: DataFrame, docs: DataFrame, text_col: str,
                   id_col: str, k: int, threshold: float) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs.

    Scale: only docs that appear in a candidate pair are shingled — the
    semi-join below prunes the corpus first, so the shingle work is
    proportional to candidates, not corpus size.

    r7 shape: each candidate doc's distinct shingle SET rides as ONE
    array row (word_shingle_arrays), the pair join attaches both sides'
    arrays, and the intersection count is the JVM ``array_intersect``
    intrinsic — exact string-set semantics, identical counts to the old
    exploded (pairs x shingles) join+groupBy, which shuffled one row
    PER (pair, shingle-of-a) (~50x more rows than pairs) plus a second
    string-keyed exchange. Now only the bounded per-doc arrays move.
    """
    cand_ids = (pairs.select(F.col("id_a").alias(id_col))
                .union(pairs.select(F.col("id_b").alias(id_col)))
                .distinct())
    docs = docs.join(cand_ids, on=id_col, how="left_semi")
    sh = word_shingle_arrays(docs, text_col, id_col, k)
    a = sh.select(F.col(id_col).alias("id_a"),
                  F.col("shingles").alias("_sa"), F.col("n_sh").alias("n_a"))
    b = sh.select(F.col(id_col).alias("id_b"),
                  F.col("shingles").alias("_sb"), F.col("n_sh").alias("n_b"))
    inter = F.size(F.array_intersect("_sa", "_sb")).cast("bigint")
    return (pairs
            .join(a, on="id_a")
            .join(b, on="id_b")
            .withColumn("inter", inter)
            .withColumn("jaccard",
                        F.col("inter")
                        / (F.col("n_a") + F.col("n_b") - F.col("inter")))
            .where(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard")))


def ngram_jaccard_pairs(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 3,
                        threshold: float = 0.8) -> DataFrame:
    """All-pairs n-gram Jaccard >= threshold via shingle-inverted-index
    self-join (no LSH; exact). Quadratic in docs sharing a shingle — use
    minhash_lsh_pairs at scale; this is the exactness baseline/oracle."""
    sh = word_shingles(docs, text_col, id_col, k)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    inter = (sh.alias("a").join(sh.alias("b"), on="shingle")
             .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
             .groupBy(F.col(f"a.{id_col}").alias("id_a"),
                      F.col(f"b.{id_col}").alias("id_b"))
             .agg(F.count("*").alias("inter")))
    return (inter
            .join(sizes.select(F.col(id_col).alias("id_a"),
                               F.col("n_sh").alias("n_a")), on="id_a")
            .join(sizes.select(F.col(id_col).alias("id_b"),
                               F.col("n_sh").alias("n_b")), on="id_b")
            .withColumn("jaccard",
                        F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")))
            .where(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard")))


def dup_span_stats(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", k: int = 5,
                   min_count: int = 2,
                   hash_grams: bool = False) -> DataFrame:
    """Per-document duplicated-span coverage: the fraction of each doc's
    words covered by word k-grams that occur >= ``min_count`` times in
    the whole corpus (counting within-doc repeats). This is the
    practical distributed form of exact-substring training-data dedup
    (Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    Better"): a true suffix-array ExactSubstr needs a global sorted
    index, but every duplicated substring of length >= k is a union of
    duplicated k-grams, so k-gram span coverage upper-bounds it tightly
    and maps onto plain Spark relational ops. Filter on ``dup_frac``
    (e.g. > 0.5) to drop boilerplate-heavy pages before training.

    Returns (doc_id, n_words, dup_tokens, dup_frac): ``dup_tokens`` is
    the exact size of the union of [pos, pos+k) intervals over
    duplicated-gram start positions (equal-length intervals sorted by
    start: each contributes min(next_start - start, k), the last one k,
    everything capped by doc end), ``dup_frac`` = dup_tokens / n_words
    rounded to 6 dp (0.0 for empty docs).

    Scale shape: posexplode grams (no shuffle) -> groupBy(gram) count
    with map-side partial aggregation -> inner join positions against
    the duplicated-gram keys (sort-merge on gram; AQE splits skewed hot
    grams, which a count-over-window form could not) -> one window +
    groupBy on ``id_col`` (the groupBy reuses the window's hash
    partitioning) -> left join back to per-doc sizes. No Python in the
    plan; gram strings shuffle once.

    ``hash_grams=True`` is the 100 TB path: the gram key is reduced to
    xxhash64(gram string) BEFORE the count shuffle and join, so the two
    gram-keyed exchanges move 8-byte bigints instead of k-word strings
    (~5-10x fewer shuffle bytes; the string is still built, but only as
    a map-side projection that never leaves the task). Cost: 64-bit
    collisions mark both colliding grams duplicated — at 10^12 grams
    that is ~5e4 expected collisions mislabeling O(k) tokens each, a
    ~1e-8 dup_frac perturbation; use the default exact strings when the
    output feeds an equality oracle."""
    rows = _word_gram_rows(docs, text_col, id_col, k)
    win = Window.partitionBy(id_col).orderBy("_pos")
    parts = [F.col("_w")] + [F.lead("_w", j).over(win) for j in range(1, k)]
    gram = F.concat_ws(" ", *parts)
    if hash_grams:
        gram = F.xxhash64(gram)
    grams = (rows.withColumn("gram", gram)
             .where("_keep").where(F.col("_pos").isNotNull())
             .select(id_col, "_nw", "_pos", "gram"))
    dup_grams = (grams.groupBy("gram")
                 .agg(F.count(F.lit(1)).alias("_cnt"))
                 .where(F.col("_cnt") >= min_count)
                 .select("gram"))
    cover = (grams.join(dup_grams, on="gram")
             .withColumn("_nxt", F.lead("_pos").over(win))
             .withColumn("_cover", F.least(
                 F.coalesce(F.col("_nxt") - F.col("_pos"), F.lit(k)),
                 F.lit(k), F.col("_nw") - F.col("_pos")))
             .groupBy(id_col)
             .agg(F.sum("_cover").alias("dup_tokens")))
    base = docs.select(
        F.col(id_col),
        F.size(F.expr(f"filter(split({text_col}, ' '), "
                      "w -> length(w) > 0)")).alias("n_words"))
    return (base.join(cover, on=id_col, how="left")
            .select(id_col, "n_words",
                    F.coalesce("dup_tokens", F.lit(0).cast("bigint"))
                    .alias("dup_tokens"))
            .withColumn("dup_frac", F.round(
                F.col("dup_tokens") / F.greatest("n_words", F.lit(1)), 6)))


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            bits: int = SIMHASH_BITS, hash_fn: str = "poly") -> DataFrame:
    """Per-doc SimHash over word hashes: bit b set iff the majority of
    words have bit b set ( sum(±1) > 0 ). Returns (doc_id, simhash bigint).

    Single shuffle: explode words -> groupBy(doc) with `bits` sum()
    aggregates -> bit-assemble projection.

    ``hash_fn``: "poly" (default) = per-character poly word hash, DuckDB-
    oracle-reproducible but INTERPRETED (HOFs are CodegenFallback — the
    same ~30x lever as minhash's fast path); "fast" = lower ``bits`` of
    the codegen xxhash64 intrinsic — different hash values, same uniform-
    bit semantics, the 10^12-doc path.
    """
    if hash_fn == "poly":
        # r7: whole per-doc simhash in ONE vectorized mapInArrow stage
        # (fast_hash.simhash_arrow) — no explode, no groupBy shuffle, no
        # interpreted per-char HOF. Identical integers (parity pinned);
        # docs with no words are dropped exactly like the explode form.
        import pyarrow as pa

        src = docs.select(id_col, text_col)
        id_type = src.schema[id_col].dataType.simpleString()

        def f(batches):
            from photohive_spark.fast_hash import simhash_arrow
            for b in batches:
                names = b.schema.names
                keep, sim = simhash_arrow(b.column(names.index(text_col)),
                                          bits)
                ids = b.column(names.index(id_col)).filter(pa.array(keep))
                yield pa.RecordBatch.from_arrays(
                    [ids, pa.array(sim)], [id_col, "simhash"])

        return src.mapInArrow(f, f"{id_col} {id_type}, simhash bigint")
    words = docs.select(
        F.col(id_col),
        F.explode(F.expr(f"filter(split({text_col}, ' '), w -> length(w) > 0)"))
         .alias("w"))
    if hash_fn == "fast":
        words = words.withColumn(
            "h", F.xxhash64("w").bitwiseAND(F.lit((1 << bits) - 1)))
    elif hash_fn == "expr_poly":
        # original interpreted form — parity oracle for the "poly" path
        words = words.withColumn("h", F.expr(poly_hash_expr("w")))
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    sums = words.groupBy(id_col).agg(*[
        F.sum(((F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1))) * 2 - 1))
        .alias(f"s{b}") for b in range(bits)])
    sim = sums.select(
        F.col(id_col),
        sum((F.when(F.col(f"s{b}") > 0, F.lit(1)).otherwise(F.lit(0))
             .cast("bigint") * F.lit(1 << b)) for b in range(bits))
        .alias("simhash"))
    return sim


def decontaminate(docs: DataFrame, benchmark: DataFrame,
                  text_col: str = "text", id_col: str = "doc_id",
                  k: int = 3, threshold: float = 0.5,
                  per_doc: bool = False) -> DataFrame:
    """Benchmark decontamination: drop training docs whose word k-gram
    shingles overlap benchmark shingles by >= ``threshold`` — the standard
    test-set-overlap removal stage of an LLM data pipeline. Returns the
    CLEAN docs (original columns).

    ``per_doc=False`` (default, pooled semantics): overlap is measured
    against the UNION of all benchmark documents' shingles — a doc
    overlapping 30% with each of two disjoint benchmark docs counts 60%
    and is dropped. ``per_doc=True`` (strict semantics): overlap is the
    MAX against any single benchmark document — that same doc is kept.
    Pooled is the conservative pipeline default; strict matches
    "contaminated BY a benchmark item" audits.

    Scale: the benchmark shingle set is tiny next to the corpus — distinct
    it and broadcast it onto the corpus shingles, so the expensive shingle
    fan-out runs ONCE. Pooled pays one corpus-side shuffle (per-doc
    (n_sh, n_hit) agg); strict pays the same agg keyed
    (doc, benchmark_doc) — rows bounded by corpus shingles x the (few)
    benchmark docs sharing each shingle.
    """
    doc_sh = word_shingles(docs, text_col, id_col, k)
    bench_all = word_shingles(benchmark, text_col, id_col, k)
    if per_doc:
        sizes = doc_sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
        bench_sh = (bench_all
                    .select(F.col(id_col).alias("_bench_id"), "shingle")
                    .distinct())
        hits = (doc_sh.join(F.broadcast(bench_sh), on="shingle")
                .groupBy(id_col, "_bench_id")
                .agg(F.count("*").alias("n_hit"))
                .groupBy(id_col).agg(F.max("n_hit").alias("n_hit")))
        contaminated = (hits.join(sizes, on=id_col)
                        .where(F.col("n_hit") >= F.col("n_sh") * threshold)
                        .select(id_col))
    else:
        bench_sh = (bench_all.select("shingle").distinct()
                    .withColumn("_hit", F.lit(1)))
        flagged = doc_sh.join(F.broadcast(bench_sh), on="shingle", how="left")
        contaminated = (flagged.groupBy(id_col)
                        .agg(F.count("*").alias("n_sh"),
                             F.sum(F.coalesce(F.col("_hit"), F.lit(0)))
                             .alias("n_hit"))
                        .where(F.col("n_hit") >= F.col("n_sh") * threshold)
                        .select(id_col))
    return docs.join(contaminated, on=id_col, how="left_anti")


def simhash_neardup_pairs(docs: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id",
                          max_hamming: int = 3, bands: int = 4,
                          bits: int = SIMHASH_BITS,
                          hash_fn: str = "poly",
                          max_bucket_size: int | None = None) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance <= ``max_hamming``.

    Pigeonhole banding: the ``bits``-bit simhash splits into ``bands``
    equal bands; any pair within hamming ``bands - 1`` shares at least one
    identical band, so candidates = pairs sharing a (band, value) key —
    never an all-pairs comparison (``max_hamming`` must be < ``bands``).
    Exact verification = bit_count(xor) on the candidate set.

    Scale: one groupBy to build signatures, one equi-join on the band key;
    uniform band values (hash bits) mean no skew for DISTINCT texts, but
    exact-duplicate texts share whole signatures — on dup-heavy corpora
    pass ``max_bucket_size`` to cap hot buckets via star pairing (see
    hamming_pairs); same shape as MinHash-LSH banding but with a 1-word
    signature.
    """
    sim = simhash(docs, text_col, id_col, bits, hash_fn)
    return hamming_pairs(sim, "simhash", id_col, max_hamming, bands, bits,
                         max_bucket_size=max_bucket_size)


def hamming_pairs(hashed: DataFrame, hash_col: str, id_col: str,
                  max_hamming: int, bands: int,
                  bits: int = SIMHASH_BITS,
                  max_bucket_size: int | None = None) -> DataFrame:
    """Generic hamming-distance near-dup pairs over ANY bigint hash
    column (SimHash text signatures, pHash image signatures, ...) via
    pigeonhole banding: the ``bits``-bit hash splits into ``bands``
    equal bands; any pair within hamming ``bands - 1`` shares at least
    one identical band, so candidates = pairs sharing a (band, value)
    key — never an all-pairs comparison. Exact verification =
    bit_count(xor), all JVM-side.

    ``max_bucket_size``: the within-bucket self-join is quadratic in
    bucket width, and real scraped corpora are duplicate-heavy — flat /
    low-frequency images in particular collapse to IDENTICAL pHashes, so
    one hot (band, bval) key can hold 10^6 members and the exact
    self-join would emit ~10^12 candidates from that key alone. Buckets
    above the cap switch to STAR pairing (same guard as
    minhash_lsh_pairs): every member pairs with the bucket's min-id
    representative only, O(n) pairs. Verification still runs bit_count
    on each emitted pair, and star pairs carry both endpoint hashes, so
    emitted hamming values stay exact. RECALL CAVEAT: in an over-cap
    bucket, two members within ``max_hamming`` of each other but not of
    the representative lose their direct pair; for the dominant case
    (identical hashes, hamming 0 to the rep) every member stays
    connected through the rep, so connected components are preserved.
    Size the cap well above the expected near-dup cluster width.
    Default None = exact banding (the oracle-checked semantics)."""
    if max_hamming >= bands:
        raise ValueError(f"pigeonhole soundness needs max_hamming < bands "
                         f"({max_hamming} >= {bands})")
    if bits % bands:
        raise ValueError(f"bits={bits} not divisible by bands={bands}")
    width = bits // bands
    mask = (1 << width) - 1
    keyed = (hashed.select(
        id_col, hash_col,
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"),
                     F.shiftright(hash_col, b * width)
                      .bitwiseAND(F.lit(mask)).alias("bval"))
            for b in range(bands)])).alias("k"))
        .select(id_col, hash_col, "k.band", "k.bval")
        .repartition("band", "bval"))
    # ^ r7: one explicit exchange on the join key so the self-join below
    # reuses a single shuffle for both aliases (ReusedExchange) instead
    # of recomputing the hash subtree per alias and planning statless —
    # the simhash source is now a mapInArrow stage with no exchange of
    # its own (same fix as minhash_lsh_pairs; measured 131s -> seconds
    # on the doubled sf1.0 corpus).

    def _self_join(df: DataFrame) -> DataFrame:
        return (df.alias("x").join(df.alias("y"), on=["band", "bval"])
                .where(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
                .select(F.col(f"x.{id_col}").alias("id_a"),
                        F.col(f"y.{id_col}").alias("id_b"),
                        F.bit_count(F.col(f"x.{hash_col}")
                                    .bitwiseXOR(F.col(f"y.{hash_col}")))
                         .alias("hamming")))

    if max_bucket_size is not None:
        # one extra groupBy on the SAME (band, bval) key the join uses —
        # map-side partial counts make it cheap, and min_by carries the
        # representative's hash so star pairs verify without a re-join
        stats = (keyed.groupBy("band", "bval")
                 .agg(F.count("*").alias("_bn"),
                      F.min(id_col).alias("_rep"),
                      F.min_by(hash_col, F.col(id_col)).alias("_rep_hash")))
        joined = keyed.join(stats, on=["band", "bval"])
        small = joined.where(F.col("_bn") <= max_bucket_size) \
                      .select(id_col, hash_col, "band", "bval")
        pairs_big = (joined.where((F.col("_bn") > max_bucket_size)
                                  & (F.col(id_col) != F.col("_rep")))
                     .select(F.col("_rep").alias("id_a"),
                             F.col(id_col).alias("id_b"),
                             F.bit_count(F.col("_rep_hash")
                                         .bitwiseXOR(F.col(hash_col)))
                              .alias("hamming")))
        cand = _self_join(small).unionByName(pairs_big).distinct()
    else:
        cand = _self_join(keyed).distinct()
    return cand.where(F.col("hamming") <= max_hamming)


def connected_components(pairs: DataFrame, nodes: DataFrame,
                         id_col: str = "doc_id",
                         max_iters: int = 50,
                         method: str = "propagate") -> DataFrame:
    """Connected components over near-dup pairs — the canonical 'dedup
    cluster representative' assignment downstream of minhash_lsh_pairs /
    ngram_jaccard_pairs. Every node's label converges to the smallest id
    in its component.

    Returns (id_col, component). Nodes absent from ``pairs`` are singleton
    components labelled by themselves.

    ``method="propagate"`` (default): min-label propagation. Each round is
    one join + one groupBy, and rounds = O(component DIAMETER) — near-dup
    clusters are shallow (stars around a template), so 3-5 rounds typically
    converge. Labels are localCheckpoint'ed per round to truncate lineage.

    ``method="star"``: alternating small-star/large-star (Kiveris et al.,
    "Connected Components in MapReduce and Beyond") — O(log n) rounds
    regardless of diameter, for adversarially deep dup chains where
    propagation would need diameter rounds.
    """
    if method == "star":
        return _star_components(pairs, nodes, id_col, max_iters)
    if method != "propagate":
        raise ValueError(f"unknown method {method!r} "
                         "(expected 'propagate' or 'star')")
    # materialize the (possibly expensive — LSH banding, jaccard verify)
    # pair-discovery subtree ONCE: the loop re-executes `edges` every
    # round, and only labels were checkpointed before.
    edges = (pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
             .unionByName(
                 pairs.select(F.col("id_b").alias("src"),
                              F.col("id_a").alias("dst")))
             .localCheckpoint(eager=False))
    labels = nodes.select(F.col(id_col),
                          F.col(id_col).alias("component")).distinct() \
                  .localCheckpoint(eager=False)
    for _ in range(max_iters):
        neigh = (edges.join(labels,
                            edges.dst == labels[id_col], how="inner")
                 .select(F.col("src").alias(id_col), "component"))
        new = (labels.unionByName(neigh)
               .groupBy(id_col).agg(F.min("component").alias("component"))
               .localCheckpoint(eager=False))
        changed = (labels.alias("o").join(new.alias("n"), on=id_col)
                   .where(F.col("o.component") != F.col("n.component"))
                   .count())
        labels = new
        if changed == 0:
            return labels
    # returning partially-propagated labels would silently split real
    # clusters — fail loudly instead (deep chains need more rounds or the
    # O(log n) small-star/large-star variant)
    raise RuntimeError(
        f"connected_components did not converge in {max_iters} rounds "
        f"(component diameter exceeds max_iters; raise max_iters or use "
        f"method='star')")


def _star_edges_fixpoint(e: DataFrame, max_iters: int) -> tuple[DataFrame, int]:
    """Alternate large-star / small-star on a canonical (hi > lo) edge set
    until it stops changing. Returns (star edges, rounds used).

    Invariants per round (each is two joins + two groupBys — shuffle count
    independent of graph depth):
    - large-star: for each node u, every STRICTLY LARGER neighbor v is
      re-pointed at m = min(neighbors(u) + u);
    - small-star: each edge directed hi -> lo; for each hi, all its lo
      neighbors and hi itself re-point at the minimum lo.
    Fixpoint = disjoint stars rooted at each component's minimum id
    (Kiveris et al. 2014; O(log^2 n) worst case, O(log n) in practice —
    the deep-chain property test observes ~log2(n) rounds)."""
    e = e.localCheckpoint(eager=False)
    prev_count = None   # carries new.count() across rounds: e is the
    for rounds in range(1, max_iters + 1):  # unmodified prior result
        # large-star over the undirected adjacency
        adj = e.select("hi", "lo").unionByName(
            e.select(F.col("lo").alias("hi"), F.col("hi").alias("lo")))
        mins = adj.groupBy("hi").agg(F.min("lo").alias("m"))
        large = (adj.join(mins, on="hi")
                 .where(F.col("lo") > F.col("hi"))
                 .select(F.col("lo").alias("hi"),
                         F.least("hi", "m").alias("lo"))
                 .where(F.col("hi") != F.col("lo")).distinct())
        # small-star over larger->smaller edges
        mins2 = large.groupBy("hi").agg(F.min("lo").alias("m"))
        keyed = large.join(mins2, on="hi")
        new = (keyed.where(F.col("lo") != F.col("m"))
               .select(F.col("lo").alias("hi"), F.col("m").alias("lo"))
               .unionByName(mins2.select("hi", F.col("m").alias("lo")))
               .where(F.col("hi") != F.col("lo")).distinct()
               .localCheckpoint(eager=False))
        # set equality check, short-circuited: both sides are distinct, so
        # equal counts + empty one-sided difference <=> equal sets (avoids
        # a second exceptAll job every unconverged round); e's count is
        # carried from the previous round's new.count()
        e_count = prev_count if prev_count is not None else e.count()
        new_count = new.count()
        changed = (new_count != e_count) or (new.exceptAll(e).count() > 0)
        e, prev_count = new, new_count
        if not changed:
            return e, rounds
    raise RuntimeError(
        f"star connected_components did not converge in {max_iters} rounds")


def _star_components(pairs: DataFrame, nodes: DataFrame, id_col: str,
                     max_iters: int) -> DataFrame:
    e = (pairs.select(F.greatest("id_a", "id_b").alias("hi"),
                      F.least("id_a", "id_b").alias("lo"))
         .where(F.col("hi") != F.col("lo")).distinct())
    stars, _ = _star_edges_fixpoint(e, max_iters)
    members = stars.select(F.col("hi").alias(id_col),
                           F.col("lo").alias("component"))
    return (nodes.select(id_col).distinct()
            .join(members, on=id_col, how="left")
            .select(id_col,
                    F.coalesce("component", F.col(id_col)).alias("component")))


def embedding_neardup_lsh(emb: DataFrame, id_col: str = "vec_id",
                          vec_col: str = "embedding",
                          threshold: float = 0.95, dim: int = 64,
                          n_planes: int = 8, n_tables: int = 3,
                          seed: int = 42) -> DataFrame:
    """Scale path for embedding near-dup: candidates = pairs sharing a
    sign-LSH bucket in ANY of ``n_tables`` independent hyperplane sets
    (banding boosts recall: two vectors at cosine c collide per table with
    p=(1-acos(c)/pi)^n_planes; 1-(1-p)^B overall), then exact cosine
    verification. The corpus never self-joins — each join is restricted to
    bucket-mates, so at 10^12 rows the candidate set stays near-linear.
    """
    from .similarity import cosine_expr, hyperplanes, lsh_bucket_expr

    v = F.col(vec_col).cast("array<double>")
    buckets = [lsh_bucket_expr(v, hyperplanes(dim, n_planes, seed + 1000 * t))
               .alias(f"b{t}") for t in range(n_tables)]
    base = emb.select(F.col(id_col), v.alias("v"), *buckets)
    keyed = base.select(
        id_col, "v",
        F.explode(F.array(*[
            F.struct(F.lit(t).alias("tbl"), F.col(f"b{t}").alias("bkt"))
            for t in range(n_tables)])).alias("k")
    ).select(id_col, "v", "k.tbl", "k.bkt")
    cand = (keyed.alias("a").join(keyed.alias("b"), on=["tbl", "bkt"])
            .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            .select(F.col(f"a.{id_col}").alias("id_a"),
                    F.col(f"b.{id_col}").alias("id_b"),
                    cosine_expr("a.v", "b.v").alias("cos"))
            .distinct())
    return (cand.where(F.col("cos") >= threshold)
            .select("id_a", "id_b", F.round("cos", 6).alias("cosine"))
            .distinct())


def embedding_neardup_pairs(emb: DataFrame, id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            threshold: float = 0.95) -> DataFrame:
    """Embedding-cosine near-dup pairs (id_a < id_b, cosine >= threshold).

    Exact all-pairs via self-join — the correctness baseline. At scale use
    similarity.lsh_buckets to restrict the join to bucket-mates.
    """
    from .similarity import cosine_expr
    n = (emb.select(F.col(id_col),
                    F.col(vec_col).cast("array<double>").alias("v")))
    pairs = (n.alias("a").join(n.alias("b"),
                               F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
             .select(F.col(f"a.{id_col}").alias("id_a"),
                     F.col(f"b.{id_col}").alias("id_b"),
                     cosine_expr("a.v", "b.v").alias("cos")))
    return (pairs.where(F.col("cos") >= threshold)
            .select("id_a", "id_b", F.round("cos", 6).alias("cosine")))
