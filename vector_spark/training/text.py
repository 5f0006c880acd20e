"""Text analysis for training-data pipelines: language ID, quality
scoring, token counting, fingerprinting. All built-in expressions.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 — resolves pandas_udf type hints
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


def repetition_udf():
    """Arrow-batched UDF computing the Gopher-family repetition filters
    (Rae et al. 2021, table A1) in ONE struct-returning invocation —
    one Python boundary crossing per batch, not one per metric (the
    ipv6 lesson: k separate Arrow UDFs pay k serialization passes).

    Per-doc counting of most-frequent / duplicated n-grams needs a hash
    map per row; expressing that as Column HOFs (array_sort + run-length
    aggregate) builds a giant interpreted expression tree, so the Arrow
    UDF IS the fast path here. No shuffle at all: every metric is local
    to its document, the operator is embarrassingly parallel at any
    corpus size.

    Metrics (words = split(' '), lines = split('\\n')):
    - dup_line_frac: duplicated lines / lines
    - dup_line_char_frac: chars in occurrences of duplicated lines /
      chars in all lines
    - top{2,3}gram_char_frac: chars covered by the most frequent word
      n-gram (count * gram chars / total chars); ties break on the
      lexicographically smallest gram
    - dup5gram_frac: char-weighted fraction of 5-grams occurring more
      than once (sum c*len over c>1 grams / sum c*len over all grams).
      Gopher counts distinct character positions; overlapping
      occurrences make that non-relational, so this uses the standard
      weighted form (documented divergence, mirrored by the oracle).
    """
    fields = (
        "dup_line_frac double, dup_line_char_frac double, "
        "top2gram_char_frac double, top3gram_char_frac double, "
        "dup5gram_frac double"
    )

    def one(text: str):
        from collections import Counter

        if not text:
            return (0.0, 0.0, 0.0, 0.0, 0.0)
        lines = text.split("\n")
        lc = Counter(lines)
        n_lines = len(lines)
        dup_line_frac = sum(c for c in lc.values() if c > 1) / n_lines
        all_chars = sum(len(l) * c for l, c in lc.items())
        dup_chars = sum(len(l) * c for l, c in lc.items() if c > 1)
        dup_line_char_frac = (dup_chars / all_chars) if all_chars else 0.0

        words = text.split(" ")
        n_chars = len(text)
        tops = []
        for n in (2, 3):
            if len(words) < n or n_chars == 0:
                tops.append(0.0)
                continue
            grams = Counter(
                " ".join(words[i : i + n]) for i in range(len(words) - n + 1)
            )
            # max count, lexicographically-smallest tiebreak
            maxc = max(grams.values())
            top = min(g for g, c in grams.items() if c == maxc)
            tops.append(maxc * len(top) / n_chars)

        if len(words) < 5:
            dup5 = 0.0
        else:
            g5 = Counter(
                " ".join(words[i : i + 5]) for i in range(len(words) - 4)
            )
            tot = sum(c * len(g) for g, c in g5.items())
            dup = sum(c * len(g) for g, c in g5.items() if c > 1)
            dup5 = (dup / tot) if tot else 0.0
        return (dup_line_frac, dup_line_char_frac, tops[0], tops[1], dup5)

    @F.pandas_udf(f"struct<{fields}>")
    def rep(texts: pd.Series) -> pd.DataFrame:
        rows = [one(t) for t in texts]
        return pd.DataFrame(
            rows,
            columns=[
                "dup_line_frac",
                "dup_line_char_frac",
                "top2gram_char_frac",
                "top3gram_char_frac",
                "dup5gram_frac",
            ],
        )

    return rep


def repetition_scores(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc repetition quality filters (see repetition_udf). Rounded
    to 6 decimals so external engines replay the doubles bit-stable."""
    rep = repetition_udf()(F.col(text_col))
    out = docs.select(F.col(id_col), rep.alias("__r"))
    return out.select(
        id_col,
        *[
            F.round(F.col(f"__r.{f}"), 6).alias(f)
            for f in (
                "dup_line_frac",
                "dup_line_char_frac",
                "top2gram_char_frac",
                "top3gram_char_frac",
                "dup5gram_frac",
            )
        ],
    )
