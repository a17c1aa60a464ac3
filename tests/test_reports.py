import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from tlhop_library_spark.reports import CorpusReport


def test_corpus_report_suite(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rep = CorpusReport(spark, str(tmp_path / "report"))
    out = rep.run_all(docs)
    summary = out["summary"].collect()[0]
    assert summary["n_docs"] == docs.where(F.col("text").isNotNull()).count()
    assert summary["min_dl"] <= summary["avg_dl"] <= summary["max_dl"]
    lang = out["lang_dist"].orderBy("lang").collect()
    assert abs(lang[-1]["cdf"] - 1.0) < 1e-3
    tt = out["top_terms"].collect()
    assert len(tt) <= 100 and tt[0]["rank"] == 1
    dup = out["dup_summary"].collect()[0]
    assert dup["n_groups"] <= summary["n_docs"]
    qh = out["quality_hist"].agg(F.sum("n")).collect()[0][0]
    assert qh == summary["n_docs"]
