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
    # gates whose round-1 fixes shipped without driver proof, plus the
    # flagship extraction invariant — must land inside any 50-prefix
    fifty = set(list(entry.queries())[:DRIVER_PREFIX])
    for k in (
        "extract_html_info",
        "null_profile_orders",
        "props_extract",
        "corr_matrix_lineitem",
        "knn_join_topk",
        "lsh_topk",
        "bm25_indexed",
        "bm25_sharded",
        "bm25_incremental",
        "bm25_after_delete",
        "training_data_prep",
        "simhash_pairs",
    ):
        assert k in fifty, f"{k} fell out of the driver-verified prefix"


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
