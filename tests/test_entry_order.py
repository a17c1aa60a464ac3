"""Gate-ordering contract: the driver verifies at most the FIRST 50
``queries()`` entries (insertion order), so any 50-prefix must span
every operator family (round-2 verdict "What's wrong #1" — front-
loading the search gates silently dropped all relational/dedup/text/
similarity gates from CORRECTNESS_r02).

Pure-ordering tests — no SparkSession needed.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entry  # noqa: E402

DRIVER_PREFIX = 50


def test_prefix_spans_every_family():
    keys = list(entry.queries())
    fifty = keys[:DRIVER_PREFIX]
    fams = {entry._family(k) for k in fifty}
    assert fams == set(entry._FAMILY_CYCLE), (
        f"driver prefix misses families: {set(entry._FAMILY_CYCLE) - fams}"
    )


def test_priority_gates_inside_prefix():
    # round-4 rotation: the judge-named r03-absent gates plus one
    # continuity anchor per family must land inside any 50-prefix
    fifty = set(list(entry.queries())[:DRIVER_PREFIX])
    for k in (
        # anchors (one per family)
        "extract_html_info",
        "props_extract",
        "dedup_exact",
        "knn_join_topk",
        "bm25_indexed",
        # judge-named rotations (round-3 verdict ask #4); rollup_events
        # and asof_signup from the judge's list were already r01-gated,
        # so they yielded their slots to the last two never-gated
        # entries (lmjm_topk, facet_cardinality_src)
        "bm25_multifield",
        "bm25_cross_fields",
        "percolate_matches",
        "lm_perplexity",
        "facet_date_histogram",
        "bm25_mlt",
        "lmjm_topk",
        "facet_cardinality_src",
    ):
        assert k in fifty, f"{k} fell out of the driver-verified prefix"


def test_prefix_union_covers_every_gate():
    """r01–r03 CORRECTNESS union + the current 50-prefix must cover
    ALL oracle gates: after the r4 driver run, every entry has been
    driver-verified at least once across the project's lifetime."""
    import json

    seen: set[str] = set()
    for r in (1, 2, 3):
        p = Path(__file__).resolve().parents[1] / f"CORRECTNESS_r0{r}.json"
        if p.is_file():
            seen |= set(json.loads(p.read_text()))
    keys = list(entry.queries())
    seen |= set(keys[:DRIVER_PREFIX])
    # gates added after the r4 prefix froze queue for the r5 rotation —
    # exempt here, but they must NOT displace anything in the prefix
    assert not (entry.R5_ROTATION_CANDIDATES & set(keys[:DRIVER_PREFIX]))
    uncovered = [
        k for k in keys
        if k not in seen and k not in entry.R5_ROTATION_CANDIDATES
    ]
    assert uncovered == [], f"gates never driver-gated by r4: {uncovered}"


def test_prefix_first_time_gates_at_least_25():
    # round-4 rotation contract: ≥25 of the 50 driver-gated entries
    # must never have appeared in any prior CORRECTNESS file
    import json

    seen: set[str] = set()
    for r in (1, 2, 3):
        p = Path(__file__).resolve().parents[1] / f"CORRECTNESS_r0{r}.json"
        if p.is_file():
            seen |= set(json.loads(p.read_text()))
    fifty = list(entry.queries())[:DRIVER_PREFIX]
    first_time = [k for k in fifty if k not in seen]
    assert len(first_time) >= 25, (
        f"only {len(first_time)} first-time gates in the prefix: "
        f"{first_time}"
    )


def test_every_gate_has_oracle_or_is_declared():
    q, o = entry.queries(), entry.oracle_sql()
    missing = [k for k in q if k not in o]
    assert missing == [], f"gates without oracle SQL: {missing}"


def test_interleave_is_deterministic_and_lossless():
    a, b = list(entry.queries()), list(entry.queries())
    assert a == b
    assert len(a) == len(set(a))


def test_bench_headline_and_warmup_are_registered_gates():
    """bench.py times HEADLINE entries (and warms with
    bm25_conjunctive) straight out of queries() — a renamed/removed
    gate must fail here, not as a KeyError mid-bench in the driver's
    per-round run."""
    import bench

    keys = set(entry.queries())
    missing = [n for n in bench.HEADLINE if n not in keys]
    assert missing == [], f"HEADLINE names not in queries(): {missing}"
    assert "bm25_conjunctive" in keys  # warm-up gate
