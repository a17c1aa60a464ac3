"""Multi-pattern fingerprinting over a text column.

Reference parity: tlhop's Fingerprints algorithm compiles a hyperscan
automaton per partition and scans banners row-wise
(/root/reference/tlhop/algorithms/fingerprints.py:117-123,289-335),
plus an expression-tree variant built from F.when chains
(fingerprints.py:91-96).

Here both variants, Spark-first:

- ``match_expr``: the pattern DB becomes ONE JVM expression —
  array(when(rlike p1, struct...), ...) + filter(x -> x is not null) —
  fully codegen'd, zero Python. Right default for ≤ a few hundred
  patterns.
- ``match_arrow``: Arrow-batched kernel compiling the DB once per
  worker (the reference's per-partition-compile pattern) and running
  pandas .str.contains per pattern over the whole batch — vectorized
  across rows, scales to thousands of patterns.

Pattern DB rows: (name, pattern, confidence).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

MATCH_SCHEMA = ArrayType(
    StructType(
        [
            StructField("name", StringType()),
            StructField("confidence", DoubleType()),
        ]
    )
)


def match_expr(
    df: DataFrame, text_col: str, patterns: list[tuple[str, str, float]]
) -> DataFrame:
    """Expression-tree variant (ref fingerprints.py:91-96)."""
    arr = F.array(
        *[
            F.when(
                F.col(text_col).rlike(pat),
                F.struct(
                    F.lit(name).alias("name"),
                    F.lit(conf).alias("confidence"),
                ),
            )
            for name, pat, conf in patterns
        ]
    )
    matches = F.filter(arr, lambda x: x.isNotNull())
    # length guard before the regex scan (ref fingerprints.py:108)
    return df.withColumn(
        "fingerprints",
        F.when(F.length(text_col) > 3, matches).otherwise(
            F.array().cast(MATCH_SCHEMA)
        ),
    )


def match_arrow(
    df: DataFrame,
    text_col: str,
    patterns: list[tuple[str, str, float]],
    id_col: str = "doc_id",
) -> DataFrame:
    """Arrow kernel variant: DB compiled once per worker, vectorized
    contains per batch (ref's per-partition hyperscan compile,
    fingerprints.py:117-123)."""
    out_schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType),
            StructField("fingerprints", MATCH_SCHEMA),
        ]
    )
    compiled = [(n, re.compile(p), c) for n, p, c in patterns]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = pdf[text_col].fillna("")
            hit_cols = [
                texts.str.contains(rx, regex=True)
                for _, rx, _ in compiled
            ]
            rows = []
            for i in range(len(pdf)):
                if len(texts.iloc[i]) <= 3:
                    rows.append([])
                    continue
                rows.append(
                    [
                        {"name": n, "confidence": c}
                        for (n, _, c), hits in zip(compiled, hit_cols)
                        if hits.iloc[i]
                    ]
                )
            yield pd.DataFrame(
                {id_col: pdf[id_col], "fingerprints": rows}
            )

    return df.select(id_col, text_col).mapInPandas(run, schema=out_schema)


WEIGHTED_SCHEMA = ArrayType(
    StructType(
        [
            StructField("name", StringType()),
            StructField("match", StringType()),
            StructField("weight", DoubleType()),
            StructField("confidence", DoubleType()),
        ]
    )
)


def match_arrow_weighted(
    df: DataFrame,
    text_col: str,
    patterns: list[tuple[str, str, float]],
    id_col: str = "doc_id",
) -> DataFrame:
    """F13 full parity: difflib confidence weighting.

    The reference weights each fingerprint hit by the difflib
    SequenceMatcher matching-block size between the cleaned pattern and
    the matched substring, then sorts hits by weight descending
    (/root/reference/tlhop/algorithms/fingerprints.py:258-261,289-335).
    Same semantics here, Arrow-batched: per batch the regexes run
    vectorized; only confirmed hits pay the per-hit difflib cost. The
    "cleaned pattern" is the pattern with regex metacharacters
    stripped — the reference's pattern_clean analogue.
    """
    import difflib

    out_schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType),
            StructField("fingerprints", WEIGHTED_SCHEMA),
        ]
    )
    meta_re = re.compile(r"[\\^$.|?*+()\[\]{}]")
    compiled = [
        (n, re.compile(p, re.IGNORECASE), meta_re.sub("", p), c)
        for n, p, c in patterns
    ]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = pdf[text_col].fillna("")
            hit_cols = [
                texts.str.contains(rx, regex=True)
                for _, rx, _, _ in compiled
            ]
            rows = []
            for i in range(len(pdf)):
                t = texts.iloc[i]
                if len(t) <= 3:
                    rows.append([])
                    continue
                hits = []
                for (n, rx, clean, c), hc in zip(compiled, hit_cols):
                    if not hc.iloc[i]:
                        continue
                    m = rx.search(t)
                    matched = m.group(0) if m else ""
                    if len(matched) <= 2:
                        continue  # reference drops matches ≤ 2 chars
                    seq = difflib.SequenceMatcher(None, clean, matched)
                    w = float(
                        sum(b.size for b in seq.get_matching_blocks())
                    )
                    hits.append(
                        {
                            "name": n,
                            "match": matched,
                            "weight": w,
                            "confidence": c,
                        }
                    )
                hits.sort(key=lambda d: (-d["weight"], d["name"]))
                rows.append(hits)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "fingerprints": rows}
            )

    return df.select(id_col, text_col).mapInPandas(run, schema=out_schema)


DEFAULT_PATTERNS = [
    ("spark-engine", r"\bspark\b", 0.9),
    ("stream-workload", r"\bstream\b", 0.7),
    ("vector-workload", r"\bvector\b", 0.7),
    ("analytics-query", r"\b(group|agg|join)\b", 0.5),
]
