"""Text-analysis operators over a documents table (doc_id, text, ...).

Re-expressions of the reference's text pipeline (SURVEY.md §2.8) plus
the training-data-pipeline text ops (language ID, quality scoring,
token counting, fingerprinting). Everything is JVM-side builtins —
whole-stage-codegen friendly, no Python on the hot path.

Reference parity notes:
- token counting ← get_sorted_tokens (/root/reference/tlhop/library.py:557-571)
- language ID    ← language detection via lang attr + ISO mapping
  (/root/reference/tlhop/library.py:407-483, shodan_library.py:118-131);
  here a deterministic stopword-overlap n-gram heuristic instead of an
  attribute regex (no HTML attrs in the driver table).
- fingerprinting ← fingerprints.py's banner hashing, here an
  order-insensitive md5 document fingerprint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tlhop_library_spark.analyzer import tokens_col

# Tiny deterministic per-language marker sets (frozen; shared w/ oracle)
LANG_MARKERS = {
    "en": ["the", "and", "for", "with", "that", "this", "from"],
    "pt": ["que", "para", "com", "uma", "não", "por", "mais"],
    "es": ["que", "para", "con", "una", "los", "por", "como"],
    "de": ["der", "und", "die", "das", "mit", "von", "für"],
}


def token_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_unique_tokens, avg_token_len)."""
    t = docs.where(F.col("text").isNotNull()).select(
        "doc_id", tokens_col(F.col("text")).alias("toks")
    )
    return t.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("toks")).cast("long").alias("n_unique_tokens"),
        F.round(
            F.when(
                F.size("toks") > 0,
                F.aggregate(
                    F.transform("toks", lambda x: F.length(x).cast("double")),
                    F.lit(0.0),
                    lambda a, x: a + x,
                )
                / F.size("toks"),
            ).otherwise(F.lit(None)),
            4,
        ).alias("avg_token_len"),
    )


#: BPE-ish pre-tokenization pattern (GPT-2 style, simplified to the
#: RE2-compatible subset — no lookahead — so the DuckDB oracle can run
#: the identical pattern): letter runs, digit runs, punctuation runs,
#: each with optional leading space.
BPE_ISH_RE = r" ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


def token_count_bpe(docs: DataFrame) -> DataFrame:
    """(doc_id, n_ws_tokens, n_bpe_tokens) — whitespace count vs the
    BPE-ish pre-tokenizer count (JVM regexp_count, zero Python)."""
    t = docs.where(F.col("text").isNotNull())
    return t.select(
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+", -1)).cast("long").alias(
            "n_ws_tokens"
        ),
        F.regexp_count("text", F.lit(BPE_ISH_RE)).cast("long").alias(
            "n_bpe_tokens"
        ),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Heuristic quality features + composite score per doc.

    Features are cheap JVM expressions: length, token count, unique
    ratio, whitespace ratio, digit ratio. The composite is a frozen
    linear formula so the oracle can replicate it exactly.
    """
    t = docs.where(F.col("text").isNotNull()).select(
        "doc_id",
        "text",
        tokens_col(F.col("text")).alias("toks"),
    )
    n_chars = F.length("text")
    n_tokens = F.size("toks")
    uniq_ratio = F.when(
        n_tokens > 0, F.size(F.array_distinct("toks")) / n_tokens
    ).otherwise(F.lit(0.0))
    digit_ratio = F.when(
        n_chars > 0,
        (n_chars - F.length(F.regexp_replace("text", r"[0-9]", ""))) / n_chars,
    ).otherwise(F.lit(0.0))
    space_ratio = F.when(
        n_chars > 0,
        (n_chars - F.length(F.regexp_replace("text", r"\s", ""))) / n_chars,
    ).otherwise(F.lit(0.0))
    len_score = F.least(n_tokens / F.lit(100.0), F.lit(1.0))
    score = (
        0.4 * len_score + 0.4 * uniq_ratio + 0.2 * (1.0 - digit_ratio)
    )
    return t.select(
        "doc_id",
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        F.round(uniq_ratio, 4).alias("unique_ratio"),
        F.round(digit_ratio, 4).alias("digit_ratio"),
        F.round(space_ratio, 4).alias("space_ratio"),
        F.round(score, 4).alias("quality"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Deterministic stopword-overlap language guess.

    (doc_id, lang_pred, lang_hits) — lang with the most marker-token
    hits; ties and zero hits → 'und'. Tie-break: language code asc.
    """
    t = docs.where(F.col("text").isNotNull()).select(
        "doc_id", tokens_col(F.col("text")).alias("toks")
    )
    hit_cols = [
        F.size(
            F.array_intersect(
                F.array_distinct("toks"),
                F.array(*[F.lit(w) for w in words]),
            )
        ).alias(f"hits_{lang}")
        for lang, words in sorted(LANG_MARKERS.items())
    ]
    t = t.select("doc_id", *hit_cols)
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in langs])
    pred = F.lit("und")
    # iterate reversed so earlier (asc) languages win ties
    for lang in reversed(langs):
        pred = F.when(
            (best > 0) & (F.col(f"hits_{lang}") == best), F.lit(lang)
        ).otherwise(pred)
    return t.select(
        "doc_id",
        pred.alias("lang_pred"),
        best.cast("long").alias("lang_hits"),
    )


def doc_fingerprint(docs: DataFrame) -> DataFrame:
    """Order-insensitive content fingerprint: md5 over the sorted
    distinct token set (doc_id, fingerprint)."""
    t = docs.where(F.col("text").isNotNull()).select(
        "doc_id", tokens_col(F.col("text")).alias("toks")
    )
    return t.select(
        "doc_id",
        F.md5(
            F.array_join(F.array_sort(F.array_distinct("toks")), " ")
        ).alias("fingerprint"),
    )


#: frozen stopword list for quality features: the union of the
#: language marker sets (deterministic, shared with oracle SQL)
STOPWORDS = sorted({w for ws in LANG_MARKERS.values() for w in ws})


def stopword_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_stopwords, stopword_ratio) — the brief's
    stopword-ratio quality feature. Pure JVM: membership against the
    frozen STOPWORDS array via a filter HOF, no shuffle."""
    sw = F.array(*[F.lit(w) for w in STOPWORDS])
    t = docs.where(F.col("text").isNotNull()).select(
        "doc_id", tokens_col(F.col("text")).alias("toks")
    )
    n_sw = F.size(F.filter("toks", lambda x: F.array_contains(sw, x)))
    return t.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        n_sw.cast("long").alias("n_stopwords"),
        F.round(
            F.when(
                F.size("toks") > 0, n_sw / F.size("toks")
            ).otherwise(F.lit(0.0)),
            4,
        ).alias("stopword_ratio"),
    )


def winnowing_fingerprint(
    docs: DataFrame, k: int = 4, window: int = 5
) -> DataFrame:
    """Winnowing document fingerprint (Schleimer/Wilkerson/Aiken-style
    rolling selection): hash every k-token gram, slide a window of
    `window` consecutive gram hashes, keep the minimum per window,
    dedup + sort. (doc_id, fingerprints array<string>).

    Guarantees of winnowing: any shared token run of length ≥
    k + window - 1 between two docs yields ≥ 1 shared fingerprint, and
    the selected set is position-robust (local min selection — a
    substring match selects the same grams regardless of offset). All
    JVM higher-order functions, no Python; md5 as the gram hash keeps
    it engine-portable for the DuckDB oracle. Docs with fewer than
    k + window - 1 tokens get an empty fingerprint set.
    """
    t = docs.where(F.col("text").isNotNull()).select(
        "doc_id", tokens_col(F.col("text")).alias("toks")
    )
    grams = F.transform(
        F.sequence(F.lit(0), F.size("toks") - k),
        lambda i: F.md5(F.array_join(F.slice("toks", i + 1, k), " ")),
    )
    t = t.withColumn(
        "grams",
        F.when(F.size("toks") >= k, grams).otherwise(
            F.array().cast("array<string>")
        ),
    )
    wins = F.transform(
        F.sequence(F.lit(0), F.size("grams") - window),
        lambda j: F.array_min(F.slice("grams", j + 1, window)),
    )
    return t.select(
        "doc_id",
        F.when(
            F.size("grams") >= window,
            F.sort_array(F.array_distinct(wins)),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("fingerprints"),
    )


def lang_markers_sql_case(tokens_expr: str) -> str:
    """DuckDB SQL fragments mirroring lang_id (for oracles).

    Returns ``(hits, greatest, whens)``: per-language hit-count
    expressions, the ``greatest(...)`` over them, and the CASE branches.
    """
    hits = {
        lang: (
            f"len(list_intersect(list_distinct({tokens_expr}), "
            f"[{', '.join(repr(w) for w in words)}]))"
        )
        for lang, words in sorted(LANG_MARKERS.items())
    }
    greatest = "greatest(" + ", ".join(hits.values()) + ")"
    whens = " ".join(
        f"WHEN {h} = __best AND __best > 0 THEN '{lang}'"
        for lang, h in hits.items()
    )
    return hits, greatest, whens
