"""Text analysis operators for document corpora.

All pure column expressions (whole-stage codegen, zero shuffle):

- **text_stats** — token/char counts, distinct-token ratio, stopword
  ratio, punctuation ratio: the standard quality-scoring feature set.
- **language_id** — n-gram/marker-token heuristic language guess.
- **token_count_bpe** — BPE-ish regex tokenizer count (letters runs,
  digit runs, single punctuation), the usual pre-tokenizer shape.
- **fingerprint** — md5 content fingerprint + a shingle-based rolling
  fingerprint for near-dup blocking.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]

# marker tokens per language for the heuristic vote
LANG_MARKERS = {
    "de": ["der", "die", "das", "und", "nicht"],
    "es": ["el", "la", "los", "que", "y"],
    "fr": ["le", "les", "des", "est", "une"],
    "zh": ["的", "是", "不", "了", "在"],
}

BPE_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def _tokens(c: Column | str) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return F.split(col, " ")


def _marker_hits(toks: Column, markers: list[str]) -> Column:
    # NB: the lambda must take exactly one parameter — PySpark passes the
    # array index as a second argument when the callable's arity is 2.
    return F.size(F.filter(toks, lambda t: t.isin(markers)))


def text_stats(df: DataFrame, content_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Quality-scoring features per document."""
    toks = _tokens(content_col)
    n_tok = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))
    n_chars = F.length(F.col(content_col))
    n_punct = F.length(F.regexp_replace(F.col(content_col), "[^.,!?;:]", ""))
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tok.alias("n_tokens"),
        n_distinct.alias("n_distinct_tokens"),
        F.round(n_distinct.cast("double") / n_tok, 6).alias("distinct_ratio"),
        F.round(stop_hits.cast("double") / n_tok, 6).alias("stopword_ratio"),
        F.round(n_punct.cast("double") / n_chars, 6).alias("punct_ratio"),
        F.round(n_chars.cast("double") / n_tok, 6).alias("avg_token_len"),
    )


def language_id(df: DataFrame, content_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-token vote: most-hit language wins, 'en' default.

    Deterministic tie-break: languages checked in sorted order, strict
    greater-than to beat the incumbent.
    """
    toks = _tokens(content_col)
    best_lang = F.lit("en")
    best_hits = F.lit(0)
    for lang in sorted(LANG_MARKERS):
        hits = _marker_hits(toks, LANG_MARKERS[lang])
        cond = hits > best_hits
        best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
        best_hits = F.when(cond, hits).otherwise(best_hits)
    return df.select(F.col(id_col), best_lang.alias("lang_pred"))


def token_count_bpe(df: DataFrame, content_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """BPE-ish pre-tokenizer count via regex extraction."""
    return df.select(
        F.col(id_col),
        F.size(F.regexp_extract_all(F.col(content_col), F.lit(BPE_TOKEN_RE), 0)).alias(
            "n_bpe_tokens"
        ),
    )


def fingerprint(df: DataFrame, content_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Content fingerprints: md5 of the text + first-shingle rolling hash
    (cheap blocking key for near-dup passes)."""
    from icebergproject_spark.llm.dedup import word_shingles

    return df.select(
        F.col(id_col),
        F.md5(F.col(content_col)).alias("content_md5"),
        F.xxhash64(F.element_at(word_shingles(content_col, 3), 1)).alias("block_key"),
    )
