"""Text analysis: token counting, quality scoring, language ID,
document fingerprinting. Every op is a JVM column expression
(whole-stage codegen), each designed so a DuckDB oracle can compute
the identical value — ratios are returned in integer basis points to
avoid cross-engine float hashing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# tiny per-language stopword marker sets for the n-gram heuristic;
# chosen to be discriminative among the corpus languages
STOPWORDS = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "das"],
    "fr": ["le", "et", "les"],
    "es": ["el", "y", "los"],
    "zh": ["的", "是", "了"],
}


def token_count_col(text_col: str = "text"):
    return F.size(F.split(F.trim(F.col(text_col)), r"\s+"))


def token_counts(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    return docs.select(
        F.col(id_col).alias("id"),
        token_count_col().alias("n_tokens"),
        F.length("text").alias("n_chars_actual"),
    )


# GPT-2-style pre-tokenizer classes (contractions | space-prefixed
# letter runs | digit runs | punctuation runs | whitespace runs).
# Deliberately lookahead-free so Java regex (Spark) and RE2 (DuckDB)
# count identically — the training-data proxy for "BPE tokens" before
# merges.
BPE_TOKEN_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)"
    r"| ?\p{L}+"
    r"| ?\p{N}+"
    r"| ?[^\s\p{L}\p{N}]+"
    r"|\s+"
)


def bpe_token_counts(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Pre-merge BPE token estimate per document (JVM regexp_count —
    one scan, no Python)."""
    return docs.select(
        F.col(id_col).alias("id"),
        F.regexp_count(F.col("text"), F.lit(BPE_TOKEN_PATTERN))
        .cast("long").alias("n_bpe_tokens"),
        token_count_col().alias("n_ws_tokens"),
    )


def quality_scores(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Length/punctuation/uppercase/digit ratios in basis points +
    mean word length (×100, integer)."""
    text = F.col("text")
    n = F.length(text)
    strip = lambda pat: n - F.length(F.regexp_replace(text, pat, ""))
    n_tok = token_count_col()
    return docs.select(
        F.col(id_col).alias("id"),
        n.alias("n_chars_actual"),
        n_tok.alias("n_tokens"),
        F.floor(strip(r"[.,;:!?]") * 10000 / n).cast("long").alias("punct_bp"),
        F.floor(strip(r"[A-Z]") * 10000 / n).cast("long").alias("upper_bp"),
        F.floor(strip(r"[0-9]") * 10000 / n).cast("long").alias("digit_bp"),
        F.floor((n - F.length(F.regexp_replace(text, r"\s", ""))) * 10000 / n)
        .cast("long").alias("space_bp"),
        F.floor(F.length(F.regexp_replace(text, r"\s", "")) * 100 / n_tok)
        .cast("long").alias("mean_wordlen_c"),
    )


def _stopword_hits(lang: str):
    """Occurrences of the language's marker words as whole tokens."""
    padded = F.concat(F.lit(" "), F.lower(F.col("text")), F.lit(" "))
    total = None
    for w in STOPWORDS[lang]:
        token = " %s " % w
        cnt = (F.length(padded) - F.length(F.replace(padded, F.lit(token)))) / len(token)
        total = cnt if total is None else total + cnt
    return total.cast("long")


def lang_id(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Stopword-marker language ID: argmax over per-language hit
    counts; 'und' when nothing matches. Deterministic tie-break by
    language code order via the struct-max trick."""
    scored = docs.select(
        F.col(id_col).alias("id"),
        *[_stopword_hits(lg).alias("s_%s" % lg) for lg in sorted(STOPWORDS)],
    )
    best = F.greatest(*[F.col("s_%s" % lg) for lg in sorted(STOPWORDS)])
    pred = F.lit("und")
    # reversed so the FIRST language in sorted order wins ties
    for lg in sorted(STOPWORDS, reverse=True):
        pred = F.when(
            (F.col("s_%s" % lg) == best) & (best > 0), F.lit(lg)
        ).otherwise(pred)
    return scored.withColumn("lang_pred", pred).select("id", "lang_pred")


def fingerprint(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Document fingerprint: md5 of casefolded, whitespace-collapsed
    text — robust to formatting-only edits."""
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    return docs.select(F.col(id_col).alias("id"),
                       F.md5(norm).alias("fingerprint"))
