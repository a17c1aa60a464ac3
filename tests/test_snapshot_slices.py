"""Index snapshot/restore lifecycle and sliced-scroll scan slicing."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------------------
# slice_scan
# ------------------------------------------------------------------
def test_slices_tile_the_table_disjointly(spark, corpus_df):
    from tlhop_library_spark.operators.corpus_stats import slice_scan

    n = 4
    total = corpus_df.count()
    seen: set[int] = set()
    sizes = []
    for i in range(n):
        ids = {
            r["doc_id"]
            for r in slice_scan(corpus_df, i, n).select("doc_id").collect()
        }
        assert not (seen & ids), f"slice {i} overlaps earlier slices"
        seen |= ids
        sizes.append(len(ids))
    assert len(seen) == total
    # md5 slicing should be roughly balanced (no slice empty / hogging)
    assert min(sizes) > total // n // 2, sizes


def test_slice_is_layout_independent(spark, corpus_df):
    from tlhop_library_spark.operators.corpus_stats import slice_scan

    a = {
        r["doc_id"]
        for r in slice_scan(corpus_df, 2, 8).select("doc_id").collect()
    }
    b = {
        r["doc_id"]
        for r in slice_scan(
            corpus_df.repartition(17), 2, 8
        ).select("doc_id").collect()
    }
    assert a == b and a


def test_slice_plan_has_no_exchange(spark, corpus_df):
    from tlhop_library_spark.operators.corpus_stats import slice_scan

    plan = slice_scan(corpus_df, 0, 8)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_slice_guard(spark, corpus_df):
    from tlhop_library_spark.operators.corpus_stats import slice_scan

    with pytest.raises(ValueError):
        slice_scan(corpus_df, 8, 8)


# ------------------------------------------------------------------
# snapshot / restore
# ------------------------------------------------------------------
def _ranks(reader, q="bace cada", k=10):
    return [
        (r["rank"], r["doc_id"], r["score"])
        for r in reader.search(q, k=k).collect()
    ]


def test_snapshot_restore_rank_identity(spark, index_dir, tmp_path):
    from tlhop_library_spark.index import (
        IndexReader,
        restore_index,
        snapshot_index,
        verify_snapshot,
    )

    snap = str(tmp_path / "snap")
    s1 = snapshot_index(index_dir, snap)
    assert s1["bytes_copied"] > 0 and s1["bytes_skipped"] == 0
    assert verify_snapshot(snap)["ok"]

    dest = str(tmp_path / "restored")
    restore_index(snap, dest)
    want = _ranks(IndexReader(spark, index_dir))
    got = _ranks(IndexReader(spark, dest))
    assert want and got == want


def test_second_snapshot_is_incremental(index_dir, tmp_path):
    from tlhop_library_spark.index import snapshot_index

    snap = str(tmp_path / "snap")
    snapshot_index(index_dir, snap)
    s2 = snapshot_index(index_dir, snap)
    assert s2["bytes_copied"] == 0 and s2["bytes_skipped"] > 0


def test_tamper_detection_and_restore_refusal(index_dir, tmp_path):
    from tlhop_library_spark.index import (
        restore_index,
        snapshot_index,
        verify_snapshot,
    )

    snap = str(tmp_path / "snap")
    snapshot_index(index_dir, snap)
    # flip a byte in some parquet file inside the snapshot
    victim = None
    for root, _d, files in os.walk(snap):
        for f in files:
            if f.endswith(".parquet"):
                victim = os.path.join(root, f)
                break
        if victim:
            break
    assert victim
    with open(victim, "r+b") as f:
        b = f.read(1)
        f.seek(0)
        f.write(bytes([b[0] ^ 0xFF]))
    v = verify_snapshot(snap)
    assert not v["ok"] and v["bad"]
    with pytest.raises(IOError, match="checksum mismatch"):
        restore_index(snap, str(tmp_path / "d2"))


def test_restore_refuses_nonempty_dest(index_dir, tmp_path):
    from tlhop_library_spark.index import restore_index, snapshot_index

    snap = str(tmp_path / "snap")
    snapshot_index(index_dir, snap)
    dest = tmp_path / "dest"
    dest.mkdir()
    (dest / "keep.txt").write_text("x")
    with pytest.raises(FileExistsError):
        restore_index(snap, str(dest))
    restore_index(snap, str(dest), overwrite=True)
    assert not (dest / "keep.txt").exists()


def test_snapshot_rejects_non_index(tmp_path):
    from tlhop_library_spark.index import snapshot_index

    src = tmp_path / "notidx"
    src.mkdir()
    with pytest.raises(ValueError, match="stats.json"):
        snapshot_index(str(src), str(tmp_path / "s"))


def test_search_scan_slices_tile_matching_set(spark, index_dir):
    """search_scan slices are disjoint and union to the full matching
    set (doc_id AND score preserved)."""
    from tlhop_library_spark.index import IndexReader

    r = IndexReader(spark, index_dir)
    q = "bace cada"
    full = {
        (x["doc_id"], x["score"])
        for x in r.search_scan(q).collect()
    }
    assert full
    assert full == {
        (x["doc_id"], x["score"])
        for x in r._matching_scores(q).collect()
    }
    parts = [
        {
            (x["doc_id"], x["score"])
            for x in r.search_scan(q, i, 4).collect()
        }
        for i in range(4)
    ]
    assert set().union(*parts) == full
    for i in range(4):
        for j in range(i + 1, 4):
            assert not (parts[i] & parts[j])
    with pytest.raises(ValueError):
        r.search_scan(q, 2, 1)


def test_incremental_skip_rehashes_destination(index_dir, tmp_path):
    # round-3 ADVICE: a same-size corrupted dst file must NOT be
    # skipped on the next incremental run (size-only skip let it
    # survive while the manifest asserted the source md5)
    from tlhop_library_spark.index import snapshot_index, verify_snapshot

    snap = str(tmp_path / "snap")
    snapshot_index(index_dir, snap)
    victim = None
    for root, _d, files in os.walk(snap):
        for f in files:
            if f.endswith(".parquet"):
                victim = os.path.join(root, f)
                break
        if victim:
            break
    assert victim
    with open(victim, "r+b") as f:  # same-size corruption
        b = f.read(1)
        f.seek(0)
        f.write(bytes([b[0] ^ 0xFF]))
    s2 = snapshot_index(index_dir, snap)
    assert s2["bytes_copied"] > 0  # victim re-copied, not skipped
    assert verify_snapshot(snap)["ok"]


def test_snapshot_refuses_nested_snap_dir(index_dir):
    from tlhop_library_spark.index import snapshot_index

    with pytest.raises(ValueError, match="inside index_dir"):
        snapshot_index(index_dir, os.path.join(index_dir, "snap"))
    with pytest.raises(ValueError, match="inside index_dir"):
        snapshot_index(index_dir, index_dir)
