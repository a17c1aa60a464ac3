"""Streaming Arrow posting encoder (mapInArrow).

The v1 encoder (applyInPandas) paid for: Spark's implicit group sort,
a second numpy lexsort in Python, and materializing every term as a
Python string object (30M+ allocations per 200k docs) — all memory-
bandwidth, which is precisely the scarce resource at high parallelism.

v2 contract with the planner::

    exploded.repartition(P, "bucket", "range_id")
            .sortWithinPartitions("bucket", "range_id", "tid", "doc_id")
            .mapInArrow(make_stream_encoder(avgdl), SEGMENT_SCHEMA)

- terms arrive already dictionary-encoded as int64 ``tid`` (no Python
  string ever materializes here);
- the ONE sort happens JVM-side (Tungsten binary format, spillable) on
  fixed-width int keys;
- a run spanning Arrow batch boundaries is carried forward, so memory
  is bounded by the largest single (term, range) run, itself bounded
  by range_size docs.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa

from tlhop_library_spark import bm25


def _arrow_schema(spark_schema):
    from pyspark.sql.pandas.types import to_arrow_schema

    return to_arrow_schema(spark_schema)


def make_stream_encoder(avgdl: float, spark_schema, encode_one,
                        n_buckets: int = 32, range_size: int = 1,
                        out_batch_rows: int = 512,
                        positions: bool = False):
    """Returns the mapInArrow function. `encode_one` is
    build._encode_one. bucket/range_id are DERIVED here from
    (tid, doc_id) — they partition and sort upstream as expressions but
    are never shuffled as columns (numpy `%` on int64 matches Spark
    pmod for negative tids).

    ``positions=True``: the stream carries a ``pos`` column (in-document
    token index, ascending within each (tid, doc_id) run by the upstream
    sort); each run's positions are delta-gapped per posting and handed
    to ``encode_one`` as ``pos_gaps``."""
    arrow_schema = _arrow_schema(spark_schema)

    def encode(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        out_rows: list[dict] = []
        # carry: ((bucket, range_id, tid), docs, dls[, poss]) of the
        # unfinished tail run of the previous batch
        carry = None

        def flush_run(bucket, range_id, tid, docs, dls, poss=None):
            # docs ascending; duplicates = same doc repeated tf times
            n = len(docs)
            if n == 0:
                return
            new_doc = np.empty(n, dtype=bool)
            new_doc[0] = True
            np.not_equal(docs[1:], docs[:-1], out=new_doc[1:])
            starts = np.nonzero(new_doc)[0]
            ends = np.concatenate((starts[1:], [n]))
            uniq = docs[starts].astype(np.uint64)
            tfs = (ends - starts).astype(np.uint64)
            dlr = dls[starts].astype(np.uint64)
            w = bm25.tf_weight_np(tfs, dlr, avgdl)
            pos_gaps = None
            if poss is not None:
                # per-posting delta chains: first position absolute, the
                # rest gaps (positions ascend within a posting by sort)
                p = poss.astype(np.uint64)
                pos_gaps = np.empty_like(p)
                if n:
                    pos_gaps[0] = p[0]
                    np.subtract(p[1:], p[:-1], out=pos_gaps[1:])
                    pos_gaps[starts] = p[starts]
                out_rows.append(
                    encode_one(tid, int(bucket), int(range_id), uniq, tfs,
                               dlr, w, pos_gaps=pos_gaps)
                )
                return
            out_rows.append(
                encode_one(tid, int(bucket), int(range_id), uniq, tfs, dlr, w)
            )

        def maybe_yield(force=False):
            if out_rows and (force or len(out_rows) >= out_batch_rows):
                batch = pa.RecordBatch.from_pylist(
                    [_normalize_row(r) for r in out_rows], schema=arrow_schema
                )
                out_rows.clear()
                return batch
            return None

        for batch in batches:
            d = batch.column("doc_id").to_numpy(zero_copy_only=False)
            dl = batch.column("dl").to_numpy(zero_copy_only=False)
            tid = batch.column("tid").to_numpy(zero_copy_only=False)
            ps = (
                batch.column("pos").to_numpy(zero_copy_only=False)
                if positions
                else None
            )
            n = len(d)
            if n == 0:
                continue
            r = d // range_size
            change = np.empty(n, dtype=bool)
            change[0] = True
            change[1:] = (r[1:] != r[:-1]) | (tid[1:] != tid[:-1])
            starts = np.nonzero(change)[0]
            ends = np.concatenate((starts[1:], [n]))

            for i, (s, e) in enumerate(zip(starts, ends)):
                key = (int(tid[s]) % n_buckets, int(r[s]), int(tid[s]))
                docs_se, dls_se = d[s:e], dl[s:e]
                poss_se = ps[s:e] if positions else None
                if carry is not None:
                    if carry[0] == key:
                        docs_se = np.concatenate((carry[1], docs_se))
                        dls_se = np.concatenate((carry[2], dls_se))
                        if positions:
                            poss_se = np.concatenate((carry[3], poss_se))
                        carry = None
                    else:
                        flush_run(carry[0][0], carry[0][1], carry[0][2],
                                  carry[1], carry[2],
                                  carry[3] if positions else None)
                        carry = None
                if i == len(starts) - 1:
                    carry = (key, docs_se.copy(), dls_se.copy()) + (
                        (poss_se.copy(),) if positions else (None,)
                    )
                else:
                    flush_run(key[0], key[1], key[2], docs_se, dls_se,
                              poss_se)
            out = maybe_yield()
            if out is not None:
                yield out

        if carry is not None:
            flush_run(carry[0][0], carry[0][1], carry[0][2], carry[1],
                      carry[2], carry[3] if positions else None)
        out = maybe_yield(force=True)
        if out is not None:
            yield out

    return encode


def _normalize_row(row: dict) -> dict:
    # pa.RecordBatch.from_pylist needs plain python types for binary
    out = dict(row)
    for k in ("doc_bytes", "tf_bytes", "dl_bytes", "pos_bytes"):
        v = out.get(k)
        if v is not None and not isinstance(v, bytes):
            out[k] = bytes(v)
    return out
