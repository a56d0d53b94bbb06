"""Text analysis for corpus curation: language ID, quality scoring,
token counting, document fingerprinting.

All pure Catalyst column expressions (codegen, pushdown-friendly) and
each with an exact ANSI-SQL twin for the DuckDB oracle.  The digit
normalization / cleaning ops these compose with live in textnorm.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deepie_spark.operators.dedup import char_shingles, portable_hash

# tiny per-language stopword marker sets (n-gram heuristic langid):
# chosen to be disjoint; CJK detection is by Han characters.
LANG_MARKERS = {
    "en": ["the", "and", "was", "of", "by"],
    "fr": ["le", "la", "les", "de", "et"],
    "es": ["el", "los", "las", "de", "y"],
    "de": ["der", "die", "das", "und", "ist"],
}

TOKEN_RE = "[a-z]+|[0-9]+"  # BPE-ish: letter runs and digit runs


def _marker_hits(toks, words: list[str]):
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.array_intersect(F.array_distinct(toks), arr))


def lang_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic language ID: Han-char presence -> zh, else argmax of
    stopword-marker hits, ties/none -> 'unknown'."""
    toks = F.split(F.lower(F.col(text_col)), " ")
    han = F.col(text_col).rlike("[\\u4e00-\\u9fff]")
    hits = {lang: _marker_hits(toks, ws) for lang, ws in LANG_MARKERS.items()}
    # deterministic argmax: lexicographic max over (score, priority,
    # lang) structs; earlier languages in LANG_MARKERS win ties
    n = len(LANG_MARKERS)
    cands = [
        F.struct(
            hits[lang].alias("s"), F.lit(n - i).alias("prio"), F.lit(lang).alias("l")
        )
        for i, lang in enumerate(LANG_MARKERS)
    ]
    best = F.greatest(*cands)
    pred = (
        F.when(han, F.lit("zh"))
        .when(best["s"] > 0, best["l"])
        .otherwise(F.lit("unknown"))
    )
    return docs.select(F.col(id_col), pred.alias("lang_pred"))


def token_counts(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace token count + BPE-ish regex token count + char count."""
    return docs.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), " ")).alias("ws_tokens"),
        F.size(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
        ).alias("re_tokens"),
        F.length(F.col(text_col)).alias("n_chars"),
    )


def quality_score(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Length / punctuation-ratio / stopword-ratio quality heuristics,
    combined into [0,1]."""
    t = F.col(text_col)
    toks = F.split(F.lower(t), " ")
    n_tok = F.size(toks)
    stop = F.array(*[F.lit(w) for ws in LANG_MARKERS.values() for w in ws])
    n_stop = F.size(
        F.filter(toks, lambda x: F.array_contains(stop, x))
    )
    n_punct = F.length(t) - F.length(F.regexp_replace(t, "[^a-zA-Z0-9\\u4e00-\\u9fff ]", ""))
    len_score = F.least(F.length(t) / F.lit(500.0), F.lit(1.0))
    punct_ratio = n_punct / (F.length(t) + F.lit(1))
    stop_ratio = n_stop / (n_tok + F.lit(1))
    mean_word_len = (F.length(t) + F.lit(1)) / (n_tok + F.lit(1))
    score = (
        F.lit(0.4) * len_score
        + F.lit(0.3) * F.least(stop_ratio * 4, F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - F.least(punct_ratio * 5, F.lit(1.0)))
    )
    return docs.select(
        F.col(id_col),
        len_score.alias("len_score"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stop_ratio"),
        mean_word_len.alias("mean_word_len"),
        score.alias("quality"),
    )


def doc_fingerprint(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """Winnowing-style fingerprint: minimum char-k-gram hash (a bottom-1
    sketch) + length; identical-content docs collide, near-identical
    docs usually collide."""
    sh = char_shingles(F.col(text_col), k)
    min_h = F.array_min(F.transform(sh, lambda s: portable_hash(s, 1)))
    return docs.select(
        F.col(id_col),
        min_h.alias("fingerprint"),
        F.length(F.col(text_col)).alias("n_chars"),
    )
