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
  worker (the reference's per-partition-compile pattern). To close
  part of the hyperscan gap (the reference scans all patterns
  simultaneously in one automaton pass; hyperscan is not installable
  here), patterns are grouped into ONE combined alternation regex per
  confidence class used as a row prefilter: a row only pays the
  per-pattern resolution scan for classes whose combined regex hit
  it. At realistic hit rates (most banners match few classes) this
  turns O(patterns) passes per batch into O(classes) passes plus
  per-pattern work on the small candidate subset. Patterns that
  don't compose into an alternation (e.g. global inline flags) fall
  back to per-pattern scans for their class only.

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


def _compile_classes(
    patterns: list[tuple[str, str, float]], flags: int = 0,
) -> list[tuple[object | None, list[tuple[int, str, re.Pattern, float]]]]:
    """Group the pattern DB by confidence class and compile one
    combined alternation prefilter per class.

    Returns ``[(combined_or_None, [(db_index, name, rx, conf), ...])]``
    — ``combined`` is ``None`` when the class's patterns don't compose
    into a single alternation (that class falls back to per-pattern
    scans). ``db_index`` preserves pattern-DB order in the output."""
    by_conf: dict[float, list[tuple[int, str, re.Pattern, float]]] = {}
    for i, (n, p, c) in enumerate(patterns):
        by_conf.setdefault(c, []).append(
            (i, n, re.compile(p, flags), c)
        )
    classes = []
    for conf in sorted(by_conf):
        members = by_conf[conf]
        try:
            combined = re.compile(
                "|".join(f"(?:{rx.pattern})" for _, _, rx, _ in members),
                flags,
            )
        except re.error:
            combined = None  # non-composable → per-pattern fallback
        classes.append((combined, members))
    return classes


def _class_hits(
    texts: pd.Series,
    eligible: pd.Series,
    classes: list,
    grouped: bool,
) -> list[tuple[int, str, float, pd.Index]]:
    """Per-pattern hit positions over a batch, prefiltered per class.

    ``texts`` must have a 0..n-1 RangeIndex. Returns one entry per
    pattern, in pattern-DB order: (db_index, name, conf, hit_index)."""
    out: list[tuple[int, str, float, pd.Index]] = []
    for combined, members in classes:
        cand = eligible
        if grouped and combined is not None:
            cand = cand & texts.str.contains(combined, regex=True)
        sub = texts[cand]
        if sub.empty:
            out.extend((i, n, c, sub.index) for i, n, _rx, c in members)
            continue
        for i, n, rx, c in members:
            out.append(
                (i, n, c, sub.index[sub.str.contains(rx, regex=True)])
            )
    out.sort(key=lambda t: t[0])  # pattern-DB order
    return out


def match_arrow(
    df: DataFrame,
    text_col: str,
    patterns: list[tuple[str, str, float]],
    id_col: str = "doc_id",
    grouped: bool = True,
) -> DataFrame:
    """Arrow kernel variant: DB compiled once per worker (ref's
    per-partition hyperscan compile, fingerprints.py:117-123), one
    combined-alternation prefilter pass per confidence class, then
    per-pattern resolution only over that class's candidate rows.
    ``grouped=False`` forces the per-pattern path (benchmark
    baseline / semantics pin — identical output either way)."""
    out_schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType),
            StructField("fingerprints", MATCH_SCHEMA),
        ]
    )
    classes = _compile_classes(patterns)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = pdf[text_col].fillna("").reset_index(drop=True)
            # length guard before any regex scan (ref :108)
            eligible = texts.str.len() > 3
            rows: list[list[dict]] = [[] for _ in range(len(pdf))]
            for _i, n, c, hit_idx in _class_hits(
                texts, eligible, classes, grouped
            ):
                for pos in hit_idx:
                    rows[pos].append({"name": n, "confidence": c})
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].reset_index(drop=True),
                    "fingerprints": rows,
                }
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
    classes = _compile_classes(patterns, flags=re.IGNORECASE)
    cleaned = [meta_re.sub("", p) for _, p, _ in patterns]
    rx_by_idx = {
        i: rx for _, members in classes for i, _n, rx, _c in members
    }

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = pdf[text_col].fillna("").reset_index(drop=True)
            eligible = texts.str.len() > 3
            rows: list[list[dict]] = [[] for _ in range(len(pdf))]
            for i, n, c, hit_idx in _class_hits(
                texts, eligible, classes, grouped=True
            ):
                rx, clean = rx_by_idx[i], cleaned[i]
                for pos in hit_idx:
                    m = rx.search(texts.iloc[pos])
                    matched = m.group(0) if m else ""
                    if len(matched) <= 2:
                        continue  # reference drops matches ≤ 2 chars
                    seq = difflib.SequenceMatcher(None, clean, matched)
                    w = float(
                        sum(b.size for b in seq.get_matching_blocks())
                    )
                    rows[pos].append(
                        {
                            "name": n,
                            "match": matched,
                            "weight": w,
                            "confidence": c,
                        }
                    )
            for hits in rows:
                hits.sort(key=lambda d: (-d["weight"], d["name"]))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].reset_index(drop=True),
                    "fingerprints": rows,
                }
            )

    return df.select(id_col, text_col).mapInPandas(run, schema=out_schema)


DEFAULT_PATTERNS = [
    ("spark-engine", r"\bspark\b", 0.9),
    ("stream-workload", r"\bstream\b", 0.7),
    ("vector-workload", r"\bvector\b", 0.7),
    ("analytics-query", r"\b(group|agg|join)\b", 0.5),
]
