"""Text-analysis column functions for the LLM-data-pipeline surface.

All pure Column expressions (JVM-side, whole-stage codegen) — no Python in
the hot path. Each has an exact DuckDB-SQL twin in plans/text_plans.py so the
driver's oracle gate covers them. The reference's only text machinery was
whitespace tokenization inside the word-count plugin
(mapreduce_plugin_mock/word-count.go:57-70); everything here is north-star
extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from hdfs_mapreduce_spark.functions.hashing import ROLL_MOD, h56

# Tiny public stopword lists — enough for a deterministic heuristic; the
# point is the distributed pattern, not linguistic accuracy.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "you", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "ich", "von"],
    "fr": ["le", "la", "les", "et", "est", "pas", "pour", "que", "une", "dans"],
    "es": ["el", "los", "que", "de", "no", "es", "en", "un", "por", "se"],
}
LANG_PRIORITY = ["en", "de", "fr", "es"]  # deterministic tie-break order


def tokens(col: Column) -> Column:
    """Whitespace tokens with empties dropped (array<string>)."""
    return F.filter(F.split(col, r"\s+"), lambda t: t != "")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


# GPT-2-style pre-tokenizer pattern, restricted to constructs that behave
# identically under Java regex (Spark) and RE2 (DuckDB): leftmost-first
# alternation, no lookahead. Splits contractions ('s, 'll), letter runs,
# digit runs, and punctuation runs — the unit a BPE vocabulary would merge
# from, so len(matches) approximates a BPE token count.
BPE_REGEX = r"'[a-z]+| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def bpe_tokens(col: Column) -> Column:
    """BPE-ish pre-tokens (array<string>); pure JVM regex, no Python."""
    return F.regexp_extract_all(col, F.lit(BPE_REGEX), 0)


def bpe_token_count(col: Column) -> Column:
    return F.size(bpe_tokens(col))


def alpha_ratio(col: Column) -> Column:
    """Fraction of characters that are ASCII letters (0 for empty text)."""
    n = F.length(col)
    alpha = n - F.length(F.regexp_replace(col, "[A-Za-z]", ""))
    return F.when(n > 0, alpha / n).otherwise(F.lit(0.0))


def punct_ratio(col: Column) -> Column:
    n = F.length(col)
    punct = F.length(col) - F.length(
        F.regexp_replace(col, r"[!-/:-@\[-`{-~]", "")
    )
    return F.when(n > 0, punct / n).otherwise(F.lit(0.0))


def stopword_count(col: Column, lang: str = "en") -> Column:
    toks = tokens(F.lower(col))
    words = STOPWORDS[lang]
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def stopword_ratio(col: Column, lang: str = "en") -> Column:
    n = token_count(col)
    return F.when(n > 0, stopword_count(col, lang) / n).otherwise(F.lit(0.0))


def quality_score(col: Column) -> Column:
    """Composite document-quality heuristic in [0,1]:
    0.4·min(n_tokens/20, 1) + 0.4·alpha_ratio + 0.2·min(5·stopword_ratio, 1).
    Pure double arithmetic in a fixed expression shape → bit-identical across
    engines."""
    len_score = F.least(token_count(col) / F.lit(20.0), F.lit(1.0))
    stop_score = F.least(stopword_ratio(col) * F.lit(5.0), F.lit(1.0))
    return (
        F.lit(0.4) * len_score + F.lit(0.4) * alpha_ratio(col) + F.lit(0.2) * stop_score
    )


def lang_scores(col: Column) -> dict[str, Column]:
    """Per-language stopword-hit counts (the n-gram-heuristic scoring)."""
    return {lang: stopword_count(col, lang) for lang in LANG_PRIORITY}


def lang_id(col: Column) -> Column:
    """Argmax language with CJK short-circuit and deterministic priority-order
    tie-break (en > de > fr > es); 'und' (undetermined) when no evidence."""
    n = F.length(col)
    cjk = F.length(col) - F.length(F.regexp_replace(col, "[一-鿿]", ""))
    scores = lang_scores(col)
    expr = F.lit("und")
    # Build the WHEN chain from lowest priority upward so higher-priority
    # languages win exact ties.
    best = None
    for lang in reversed(LANG_PRIORITY):
        cond = scores[lang] > 0
        for other in LANG_PRIORITY:
            if LANG_PRIORITY.index(other) < LANG_PRIORITY.index(lang):
                cond = cond & (scores[lang] > scores[other])
            elif other != lang:
                cond = cond & (scores[lang] >= scores[other])
        best = F.when(cond, F.lit(lang)).otherwise(
            best if best is not None else expr
        )
    return F.when((n > 0) & (cjk / n > F.lit(0.3)), F.lit("zh")).otherwise(best)


def fingerprint(col: Column) -> Column:
    """Order-sensitive rolling document fingerprint:
    fold over tokens, acc = (acc*31 + h56(token)) % 1e9+7. Integer arithmetic
    → exact cross-engine parity; detects reordered-but-same-bag docs that a
    bag-of-words hash would miss."""
    toks = tokens(col)
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: (acc * F.lit(31) + h56(t)) % F.lit(ROLL_MOD),
    )
