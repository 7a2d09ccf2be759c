"""Text-analysis operators for a training-data pipeline over ``documents``.

All pure built-in column expressions (JVM-side, codegen'd — no UDF in any
of these), designed so an equivalent ANSI/DuckDB SQL oracle can compute the
same values exactly (see ``__spark_entry__.oracle_sql``):

- ``tokenize`` / ``token_count`` — lowercase word tokens on a fixed
  ``[^a-z0-9]+`` class (identical regex semantics in Spark and DuckDB).
- ``quality_features`` / ``quality_score`` — length, alpha ratio,
  stopword ratio, mean token length; score is a clipped linear blend.
- ``language_id`` — stopword-hit heuristic over small per-language lists;
  argmax with a fixed priority tie-break.
- ``fingerprint`` — md5 of whitespace-normalized lowercased text (document
  identity for exact dedup at any scale).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

TOKEN_SPLIT_RE = "[^a-z0-9]+"

STOPWORDS_EN = ("the", "a", "an", "and", "of", "to", "in", "is", "on", "for")
STOPWORDS_DE = ("der", "die", "das", "und", "ist", "von", "zu", "mit", "ein", "eine")
STOPWORDS_ES = ("el", "la", "los", "las", "y", "de", "en", "es", "un", "una")
STOPWORDS_FR = ("le", "la", "les", "et", "de", "en", "est", "un", "une", "des")

LANG_STOPWORDS = {
    "en": STOPWORDS_EN,
    "de": STOPWORDS_DE,
    "es": STOPWORDS_ES,
    "fr": STOPWORDS_FR,
}


def tokenize(text: Column) -> Column:
    """Non-empty lowercase word tokens."""
    return F.filter(F.split(F.lower(text), TOKEN_SPLIT_RE), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokenize(text))


def _stopword_hits(tokens: Column, words: tuple[str, ...]) -> Column:
    wordlist = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens, lambda t: F.array_contains(wordlist, t)))


def quality_features(text: Column) -> list[Column]:
    """(n_tokens, alpha_ratio, stopword_ratio, mean_token_len) columns."""
    toks = tokenize(text)
    n_tokens = F.size(toks)
    n_chars = F.length(text)
    alpha = F.length(F.regexp_replace(text, "[^A-Za-z]", ""))
    alpha_ratio = F.when(n_chars > 0, alpha / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(
        n_tokens > 0, _stopword_hits(toks, STOPWORDS_EN) / n_tokens
    ).otherwise(F.lit(0.0))
    total_tok_len = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    )
    mean_tok_len = F.when(n_tokens > 0, total_tok_len / n_tokens).otherwise(F.lit(0.0))
    return [
        n_tokens.alias("n_tokens"),
        alpha_ratio.alias("alpha_ratio"),
        stop_ratio.alias("stopword_ratio"),
        mean_tok_len.alias("mean_token_len"),
    ]


def quality_score(text: Column) -> Column:
    """[0,1] heuristic: reward mid-length docs, alphabetic text, some (but
    not only) stopwords, plausible word lengths. Deterministic, clipped."""
    toks = tokenize(text)
    n_tokens = F.size(toks).cast("double")
    n_chars = F.length(text).cast("double")
    alpha_ratio = F.when(
        n_chars > 0,
        F.length(F.regexp_replace(text, "[^A-Za-z]", "")) / n_chars,
    ).otherwise(F.lit(0.0))
    stop_ratio = F.when(
        n_tokens > 0, _stopword_hits(toks, STOPWORDS_EN) / n_tokens
    ).otherwise(F.lit(0.0))
    length_term = F.least(n_tokens / F.lit(100.0), F.lit(1.0))
    score = (
        F.lit(0.4) * length_term
        + F.lit(0.4) * alpha_ratio
        + F.lit(0.2) * F.least(stop_ratio * F.lit(5.0), F.lit(1.0))
    )
    return F.round(F.greatest(F.least(score, F.lit(1.0)), F.lit(0.0)), 6)


def language_id(text: Column) -> Column:
    """Argmax of per-language stopword hits; ties and zero hits → 'und'
    then fixed priority en > de > es > fr."""
    toks = tokenize(text)
    hits = {lang: _stopword_hits(toks, words) for lang, words in LANG_STOPWORDS.items()}
    best = F.greatest(*hits.values())
    chain = F.when(best <= 0, F.lit("und"))
    for lang in ("en", "de", "es", "fr"):
        chain = chain.when(hits[lang] == best, F.lit(lang))
    return chain.otherwise(F.lit("und"))


def fingerprint(text: Column) -> Column:
    """md5 of whitespace-collapsed, trimmed, lowercased text."""
    normalized = F.trim(F.regexp_replace(F.lower(text), "\\s+", " "))
    return F.md5(normalized)


def document_profile(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One-stop per-document feature frame."""
    t = F.col(text_col)
    return docs.select(
        "doc_id",
        *quality_features(t),
        quality_score(t).alias("quality"),
        language_id(t).alias("lang_pred"),
        fingerprint(t).alias("fingerprint"),
    )
