"""Deploy-path probe: the north rule's entry point is
``spark-submit --py-files`` on a cluster. Zip the package, launch a
REAL spark-submit child (fresh JVM, package imported only from the
zip), build an index and run a query inside it, and check the child's
ranking equals the in-process engine's on the same corpus.
"""

import json
import os
import shutil
import subprocess
import sys
import zipfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

JOB = r"""
import json, sys
from pyspark.sql import SparkSession
# the package must come from the --py-files zip, not the repo
from tlhop_library_spark.index import build_index, IndexReader

corpus, idx = sys.argv[1], sys.argv[2]
spark = SparkSession.builder.getOrCreate()
docs = spark.read.parquet(corpus)
build_index(spark, docs, idx, n_buckets=8, n_jobs=1)
rows = IndexReader(spark, idx).search("bace cada", k=5).collect()
print("RESULT " + json.dumps(
    [[r["rank"], r["doc_id"], float(r["score"])] for r in rows]
))
"""


def test_spark_submit_py_files_roundtrip(spark, corpus_path, tmp_path):
    import pyspark

    submit = Path(pyspark.__file__).parent / "bin" / "spark-submit"
    if not submit.exists():  # pragma: no cover
        pytest.skip("no spark-submit in this pyspark install")
    pkg_zip = tmp_path / "tlhop.zip"
    with zipfile.ZipFile(pkg_zip, "w", zipfile.ZIP_DEFLATED) as zf:
        for p in (REPO / "tlhop_library_spark").rglob("*.py"):
            zf.write(p, p.relative_to(REPO))
    job = tmp_path / "job.py"
    job.write_text(JOB)
    idx = str(tmp_path / "idx")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only source
    env["PYSPARK_PYTHON"] = sys.executable
    out = subprocess.run(
        [
            str(submit),
            "--master", "local[2]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", str(pkg_zip),
            str(job), corpus_path, idx,
        ],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=str(tmp_path),
    )
    assert out.returncode == 0, out.stderr[-3000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")]
    assert line, out.stdout[-2000:]
    child = [tuple(x) for x in json.loads(line[0][len("RESULT "):])]

    from tlhop_library_spark.index.query import score_exhaustive

    docs = spark.read.parquet(corpus_path)
    want = [
        (r["rank"], r["doc_id"], r["score"])
        for r in score_exhaustive(docs, "bace cada", 5).collect()
    ]
    assert child == want
