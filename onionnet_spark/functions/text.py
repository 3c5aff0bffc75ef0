"""Text analysis for large-scale training-data pipelines.

All transforms are built-in Spark SQL expressions (JVM-side, whole
stage codegen) — no Python UDFs. Every function has an exactly
matching DuckDB formulation used by the correctness oracle; the
shared constants below (stopword lists, regexes) keep the two in
lockstep.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Deliberately tiny, fixed stopword lists: deterministic, broadcast
# as literals into the expression (no lookup table shuffle).
STOPWORDS = {
    "en": ["the", "a", "is", "and", "of", "to", "in", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "von", "zu", "ein", "mit", "den"],
    "fr": ["le", "la", "et", "est", "de", "un", "une", "que", "pour", "dans"],
    "es": ["el", "la", "es", "y", "de", "un", "una", "que", "por", "con"],
}
PUNCT_CLASS = "[.,;:!?]"
WS_SPLIT = "\\s+"


def tokens_col(text: Column) -> Column:
    """Whitespace tokens of lower-cased trimmed text."""
    return F.split(F.trim(F.lower(text)), WS_SPLIT)


def token_count(text: Column) -> Column:
    return F.size(tokens_col(text))


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document stats: token count, char count, punctuation ratio,
    mean token length — the raw material of quality filtering."""
    toks = tokens_col(F.col(text_col))
    n_chars = F.length(F.col(text_col))
    n_punct = n_chars - F.length(F.regexp_replace(F.col(text_col), PUNCT_CLASS, ""))
    return df.select(
        F.col(id_col),
        token_count(F.col(text_col)).alias("n_tokens"),
        n_chars.cast("bigint").alias("n_chars"),
        F.round(n_punct / n_chars, 6).alias("punct_ratio"),
        F.round(
            F.aggregate(toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t))
            / F.size(toks),
            6,
        ).alias("mean_token_len"),
    )


def _stopword_hits(toks: Column, lang: str) -> Column:
    words = STOPWORDS[lang]
    return F.size(F.filter(toks, lambda t: t.isin(words)))


def quality_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Heuristic quality score in [0,1]:
    0.5 * min(1, n_tokens/100) + 0.3 * (1 - punct_ratio)
    + 0.2 * min(1, 5 * stopword_ratio)   (stopword presence ~ fluent prose)
    """
    toks = tokens_col(F.col(text_col))
    n_tokens = F.size(toks)
    n_chars = F.length(F.col(text_col))
    punct_ratio = (
        n_chars - F.length(F.regexp_replace(F.col(text_col), PUNCT_CLASS, ""))
    ) / n_chars
    sw_ratio = _stopword_hits(toks, "en") / n_tokens
    score = (
        F.lit(0.5) * F.least(F.lit(1.0), n_tokens / F.lit(100.0))
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio)
        + F.lit(0.2) * F.least(F.lit(1.0), F.lit(5.0) * sw_ratio)
    )
    return df.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.round(score, 6).alias("quality"),
    )


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-hit language identification.

    Scores each language by stopword-hit count; predicts the argmax,
    lexicographically smallest language on ties, 'und' when no
    stopword of any language occurs.
    """
    toks = tokens_col(F.col(text_col))
    hit_cols = {lang: _stopword_hits(toks, lang) for lang in sorted(STOPWORDS)}
    best = F.greatest(*hit_cols.values())
    pred = F.lit("und")
    # reverse order so earlier (lexicographically smaller) langs win ties
    for lang in sorted(STOPWORDS, reverse=True):
        pred = F.when(hit_cols[lang] == best, F.lit(lang)).otherwise(pred)
    pred = F.when(best == 0, F.lit("und")).otherwise(pred)
    out = df.select(
        F.col(id_col),
        *[hit_cols[lang].alias(f"hits_{lang}") for lang in sorted(STOPWORDS)],
        pred.alias("pred_lang"),
    )
    return out


def fingerprint(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprint (Schleimer et al., SIGMOD'03).

    k-gram hashes = first 8 hex chars of md5 (portable string order);
    a fingerprint is the minimum hash in each sliding window of
    `window` consecutive k-grams; the document signature is the
    distinct fingerprint set. Returns (doc_id, n_fingerprints,
    min_fingerprint) — set-level facts that are stable across
    engines.
    """
    # Explode positions FIRST, hash as a plain column expression:
    # md5/substr then run inside whole-stage codegen over the exploded
    # rows, instead of as an interpreted higher-order transform()
    # building per-row string arrays (~6x faster at sf0.1).
    s = F.regexp_replace(F.trim(F.lower(F.col(text_col))), WS_SPLIT, " ")
    n_grams = F.greatest(F.length(s) - F.lit(k - 1), F.lit(1))
    exploded = (
        df.select(F.col(id_col), s.alias("s"), n_grams.alias("n"))
        .select(
            id_col,
            "s",
            F.posexplode(F.sequence(F.lit(1), F.col("n"))).alias("pos", "i"),
        )
        .select(
            id_col,
            "pos",
            F.substring(F.md5(F.substr(F.col("s"), F.col("i"), F.lit(k))), 1, 8).alias(
                "h"
            ),
        )
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(0, window - 1)
    )
    fps = (
        exploded.withColumn("win_min", F.min("h").over(w))
        .withColumn(
            "n_in_doc", F.count("*").over(Window.partitionBy(id_col))
        )
        # posexplode's pos is 0-BASED: full windows exist at
        # pos 0 .. n-window. Short docs (n_in_doc <= window) still
        # yield exactly one fingerprint (the min over all their
        # k-grams, the truncated first window) per Schleimer et al.
        .filter(
            F.col("pos") <= F.greatest(F.col("n_in_doc") - window, F.lit(0))
        )
        .select(id_col, F.col("win_min").alias("fp"))
        .distinct()
    )
    return fps.groupBy(id_col).agg(
        F.count("*").cast("bigint").alias("n_fingerprints"),
        F.min("fp").alias("min_fingerprint"),
    )


# PII patterns kept to the Java-regex ∩ RE2 common dialect (char
# classes, bounded quantifiers, \b, non-capturing groups — no
# backrefs/lookaround) so the DuckDB oracle replays them verbatim.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
PII_PHONE = r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"


def scrub_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Redact emails, IPv4 addresses, and US-shaped phone numbers —
    the scrub step every public-corpus pipeline runs before training.

    All three passes are JVM-side regexp_replace/regexp_count inside
    whole-stage codegen (zero Python). Replacement order matters and
    is fixed: emails, then IPs, then phones (an email never contains
    an IP pattern, but a phone regex could bite into an IP's octets
    if it ran first). Returns (doc_id, n_emails, n_ipv4, n_phones,
    text_clean).
    """
    t0 = F.col(text_col)
    n_emails = F.regexp_count(t0, F.lit(PII_EMAIL))
    t1 = F.regexp_replace(t0, PII_EMAIL, "<EMAIL>")
    n_ipv4 = F.regexp_count(t1, F.lit(PII_IPV4))
    t2 = F.regexp_replace(t1, PII_IPV4, "<IP>")
    n_phones = F.regexp_count(t2, F.lit(PII_PHONE))
    t3 = F.regexp_replace(t2, PII_PHONE, "<PHONE>")
    return df.select(
        F.col(id_col),
        n_emails.cast("bigint").alias("n_emails"),
        n_ipv4.cast("bigint").alias("n_ipv4"),
        n_phones.cast("bigint").alias("n_phones"),
        t3.alias("text_clean"),
    )


BPE_ISH_PATTERN = r"'(?:s|t|re|ve|m|ll|d)|[a-z]+|[0-9]+|[^a-z0-9\s']+"


def bpe_ish_tokens(text: Column) -> Column:
    """BPE-style pre-tokenization (the GPT-2 pattern's shape:
    contraction suffixes, letter runs, digit runs, punctuation runs)
    over lowercased text. This is the split BPE mergers run inside;
    counting these is the standard fast token estimate."""
    return F.regexp_extract_all(F.lower(text), F.lit(BPE_ISH_PATTERN), 0)


def bpe_token_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, n_bpe_tokens, n_word_tokens, bpe_per_word): regex
    token counts next to whitespace counts — the two estimates every
    data pipeline tracks (words for quality heuristics, BPE-ish for
    model token budgeting)."""
    toks = bpe_ish_tokens(F.col(text_col))
    words = tokens_col(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.size(toks).cast("bigint").alias("n_bpe_tokens"),
        F.size(words).cast("bigint").alias("n_word_tokens"),
        F.round(F.size(toks) / F.size(words), 6).alias("bpe_per_word"),
    )
