"""Text analysis operators for training-data pipelines: language-ID
(stopword heuristic), quality scoring, token counting, document
fingerprinting. All pure Catalyst expressions (regexp/string built-ins) —
SQL-expressible for the DuckDB oracle, whole-stage-codegen'd at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

# tiny deterministic stopword lists per language (heuristic, not a model)
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it", "for", "on"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "mit", "von"],
    "fr": ["le", "la", "les", "et", "de", "un", "une", "est", "dans"],
}

# BPE-ish token pattern: word pieces, numbers, or single non-space symbols
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _stopword_hits(text_col: str, words: list[str]):
    """Count of stopword occurrences as whole words (JVM regexp_count)."""
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.regexp_count(F.lower(F.col(text_col)), F.lit(pat))


def lang_id(docs: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """Heuristic language ID: argmax of per-language stopword hit counts
    (ties -> language name ascending; 'und' when zero hits everywhere)."""
    hits = [F.struct(_stopword_hits(text_col, ws).alias("hits"),
                     F.lit(-ord(lang[0])).alias("tie"),
                     F.lit(lang).alias("lang"))
            for lang, ws in sorted(STOPWORDS.items())]
    best = F.greatest(*hits)
    return docs.select(
        F.col(id_col),
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))
         .alias("lang_pred"),
        best["hits"].alias("stopword_hits"))


def quality_score(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Length / punctuation / stopword-ratio quality features + a composite
    score in [0,1]. Formula is deliberately simple and fully SQL-portable."""
    n_chars = F.length(F.col(text_col))
    n_words = F.size(F.expr(f"filter(split({text_col}, ' '), w -> length(w) > 0)"))
    n_punct = F.regexp_count(F.col(text_col), F.lit(r"[^\w\s]"))
    n_stop = _stopword_hits(text_col, STOPWORDS["en"])
    avg_wlen = (n_chars - (n_words - 1)) / F.greatest(n_words, F.lit(1))
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1))
    stop_ratio = n_stop / F.greatest(n_words, F.lit(1))
    # composite: long enough, not punctuation soup, some stopword signal
    score = (F.least(n_words / F.lit(100.0), F.lit(1.0)) * 0.4
             + (1.0 - F.least(punct_ratio * 5.0, F.lit(1.0))) * 0.3
             + F.least(stop_ratio * 4.0, F.lit(1.0)) * 0.3)
    return docs.select(
        F.col(id_col),
        n_words.alias("n_words"),
        F.round(avg_wlen, 6).alias("avg_word_len"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(score, 6).alias("quality"))


def token_counts(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Whitespace token count + BPE-ish regex token count."""
    return docs.select(
        F.col(id_col),
        F.size(F.expr(f"filter(split({text_col}, ' '), w -> length(w) > 0)"))
         .alias("ws_tokens"),
        F.regexp_count(F.col(text_col), F.lit(BPE_PATTERN)).alias("bpe_tokens"))


def fingerprint(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Document fingerprint: md5 of normalized text (lower, collapsed
    whitespace) — the cheap exact-dup / citation key."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return docs.select(F.col(id_col), F.md5(norm).alias("fp"))
