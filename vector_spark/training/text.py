"""Text analysis for training-data pipelines: language ID, quality
scoring, token counting, fingerprinting. All built-in expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")
BPE_ISH_RX = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def ws_tokens(text: Column) -> Column:
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(ws_tokens(text))


def bpe_ish_count(text: Column) -> Column:
    """BPE-ish token estimate: alpha runs + digit runs + punct singles."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_RX), F.lit(0)))


def stopword_ratio(text: Column, stopwords=EN_STOPWORDS) -> Column:
    ws = ws_tokens(text)
    return F.size(F.filter(ws, lambda x: x.isin(*stopwords))) / F.size(ws)


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc quality features (length / punct / stopword shapes) —
    the columns a filter stage thresholds on."""
    text = F.col(text_col)
    ws = ws_tokens(text)
    n_words = F.size(ws)
    return docs.select(
        "*",
        n_words.alias("q_n_words"),
        (F.length(text) / n_words).alias("q_avg_word_len"),
        stopword_ratio(text).alias("q_stopword_ratio"),
        (F.size(F.regexp_extract_all(text, F.lit(r"[^\w\s]"), F.lit(0))) / F.length(text)).alias(
            "q_punct_ratio"
        ),
        (F.size(F.array_distinct(ws)) / n_words).alias("q_distinct_ratio"),
    )


def langid(text: Column, stopwords=EN_STOPWORDS, min_hits: int = 1) -> Column:
    """N-gram/stopword-hit language heuristic: 'en' when enough English
    stopwords appear, else 'unk'. Extend with per-language stopword
    tables unioned via greatest-hits."""
    hits = F.size(F.filter(ws_tokens(text), lambda x: x.isin(*stopwords)))
    return F.when(hits >= min_hits, F.lit("en")).otherwise(F.lit("unk"))


def fingerprint(text: Column) -> Column:
    """Normalized md5 fingerprint: lowercase, squeeze whitespace, trim."""
    return F.md5(F.lower(F.trim(F.regexp_replace(text, r"\s+", " "))))


def rolling_fingerprints(text: Column, window: int = 8) -> Column:
    """Rolling window-hash array over whitespace tokens (document
    fingerprinting for partial-overlap detection): hash of each
    `window`-token span."""
    ws = ws_tokens(text)
    idx = F.sequence(F.lit(0), F.greatest(F.size(ws) - window, F.lit(0)))
    return F.transform(
        idx, lambda i: F.xxhash64(F.concat_ws(" ", F.slice(ws, i + 1, window)))
    )
