"""Text analysis for training-data pipelines — all pure Spark columns.

Language-ID (script-count heuristic), quality scoring (length/punct/
stopword ratios), token counting (whitespace + BPE-ish regex classes),
document fingerprinting (full-hash + shingle winnowing).  Everything stays
in whole-stage codegen — at 100 TB these run per document, so no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EN_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "for",
    "on", "with", "as", "at", "by", "be", "this", "that", "from",
]

# BPE-ish pre-tokenizer classes: letter runs, single digits, punctuation
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def ws_tokens(text: Column) -> Column:
    """Whitespace tokens as maximal non-whitespace runs (empty/NULL → []).

    split('\\s+') can emit empty strings only at the string edges, so
    split + drop-empties equals the maximal-run definition.  The old
    trim-based version miscounted docs with leading/trailing
    tabs/newlines (Spark ``trim`` strips spaces only — 'hello world\\n'
    tokenized to 3 with a phantom ''), which inflated n_tokens_ws and
    deflated stopword_ratio for exactly the trailing-newline shape web
    text has.  Oracle twin: ``list_filter(string_split_regex(...,
    '[ \\t\\n\\x0b\\f\\r]+'), x -> x <> '')`` — the class is written out
    because DuckDB's RE2 ``\\s`` excludes \\x0b while Java's includes it.

    ``array_remove(..., '')`` rather than ``F.filter``: split's empties
    are exactly the elements equal to '', and array_remove stays inside
    whole-stage codegen where a higher-order filter would drop the whole
    expression tree to interpreted eval (this helper runs 4× per row in
    with_text_stats).
    """
    return F.array_remove(
        F.split(F.coalesce(text, F.lit("")), r"\s+"), ""
    )


def token_count_ws(text: Column) -> Column:
    return F.size(ws_tokens(text))


def token_count_bpe(text: Column) -> Column:
    """Count of BPE-ish pre-tokens via regexp_count (JVM, no UDF)."""
    return F.regexp_count(text, F.lit(BPE_TOKEN_RE))


def punct_ratio(text: Column) -> Column:
    # Unicode-aware non-word class: Java regex \w is ASCII-only, which
    # would count every Arabic/CJK letter as punctuation and zero the
    # quality score's punct term for exactly the corpora this engine
    # targets
    n = F.length(text)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        F.regexp_count(text, F.lit(r"[^\p{L}\p{N}_\s]")) / n.cast("double")
    )


def stopword_ratio(text: Column) -> Column:
    toks = F.transform(ws_tokens(text), lambda t: F.lower(t))
    n = F.size(toks)
    hits = F.size(F.filter(toks, lambda t: t.isin(*EN_STOPWORDS)))
    return F.when(n == 0, F.lit(0.0)).otherwise(hits / n.cast("double"))


def arabic_char_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit(r"[\x{0600}-\x{06FF}]"))


def latin_char_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit(r"[A-Za-z]"))


def han_char_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit(r"[\x{4E00}-\x{9FFF}]"))


def detect_lang(text: Column) -> Column:
    """Heuristic language id: dominant script, then EN stopword evidence."""
    ar = arabic_char_count(text)
    han = han_char_count(text)
    lat = latin_char_count(text)
    return (
        F.when((ar > 0) & (ar >= lat), F.lit("ar"))
        .when((han > 0) & (han >= lat), F.lit("zh"))
        .when((lat > 0) & (stopword_ratio(text) >= 0.05), F.lit("en"))
        .when(lat > 0, F.lit("latin-other"))
        .otherwise(F.lit("unknown"))
    )


def quality_score(text: Column) -> Column:
    """[0,1] quality heuristic: length band + punct sanity + stopword band.

    The exact formula is ours (the reference has no notion of document
    quality); what matters is that it is deterministic, columnar, and each
    component is independently testable."""
    n = F.length(text).cast("double")
    len_score = F.least(n / F.lit(500.0), F.lit(1.0))
    punct_pen = F.greatest(
        F.lit(0.0), F.lit(1.0) - punct_ratio(text) * F.lit(4.0)
    )
    stop_score = F.least(stopword_ratio(text) * F.lit(5.0), F.lit(1.0))
    return (len_score * F.lit(0.4) + punct_pen * F.lit(0.3)
            + stop_score * F.lit(0.3))


def char_shingles(text: Column, n: int = 8) -> Column:
    """Character n-gram array (positions 1..len-n+1); len<n → whole text."""
    t = text
    cnt = F.greatest(F.length(t) - F.lit(n - 1), F.lit(1))
    return F.transform(
        F.sequence(F.lit(1), cnt), lambda i: t.substr(i, F.lit(n))
    )


def doc_fingerprint(text: Column) -> Column:
    """Whole-document 64-bit fingerprint of whitespace-normalized text."""
    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.xxhash64(norm)


def winnow_fingerprint(text: Column, n: int = 8) -> Column:
    """Rolling-hash winnow: min shingle hash — cheap near-dup signal."""
    return F.array_min(
        F.transform(char_shingles(text, n), lambda s: F.xxhash64(s))
    )


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    return (
        df.withColumn("n_tokens_ws", token_count_ws(t))
        .withColumn("n_tokens_bpe", token_count_bpe(t))
        .withColumn("punct_ratio", punct_ratio(t))
        .withColumn("stopword_ratio", stopword_ratio(t))
        .withColumn("lang_detected", detect_lang(t))
        .withColumn("quality", quality_score(t))
        .withColumn("fingerprint", doc_fingerprint(t))
    )
