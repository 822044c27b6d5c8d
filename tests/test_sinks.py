"""Plan-shape tests for the bucketed / partitioned sinks: the point of
these layouts is what DISAPPEARS from the physical plan (exchanges,
non-matching partition directories), so the assertions read the plan."""

import pytest
from pyspark.sql import functions as F

from rdf2smw_spark import sinks


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def no_broadcast(spark):
    """Force the planner toward shuffle joins so the bucketing (not a
    broadcast) is what removes the exchange."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path, no_broadcast):
    docs = _docs(spark, sf_dir)
    stats = docs.select("doc_id", F.length("text").alias("n"))
    sinks.write_bucketed(docs, "t_docs_b", str(tmp_path / "docs"), "doc_id", 8)
    sinks.write_bucketed(stats, "t_stats_b", str(tmp_path / "stats"), "doc_id", 8)
    try:
        a = sinks.bucketed_table(spark, "t_docs_b")
        b = sinks.bucketed_table(spark, "t_stats_b")
        joined = a.join(b, "doc_id")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange" not in plan  # the shuffle was pre-paid at write
        assert joined.count() == docs.count()
        # control: the same join from plain (unbucketed) parquet shuffles
        pa = spark.read.parquet(f"{sf_dir}/documents.parquet")
        ctrl = pa.join(pa.select("doc_id", F.length("text").alias("n")), "doc_id")
        assert "Exchange" in _plan(ctrl)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_docs_b")
        spark.sql("DROP TABLE IF EXISTS t_stats_b")


def test_bucketed_groupby_has_no_exchange(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    sinks.write_bucketed(docs, "t_docs_g", str(tmp_path / "docs"), "doc_id", 8)
    try:
        agg = sinks.bucketed_table(spark, "t_docs_g").groupBy("doc_id").count()
        assert "Exchange" not in _plan(agg)
        assert agg.count() == docs.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS t_docs_g")


def test_partitioned_scan_prunes_directories(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    path = str(tmp_path / "bylang")
    sinks.write_partitioned(docs, path, "lang")
    langs = [r["lang"] for r in docs.select("lang").distinct().collect()]
    assert len(langs) > 1  # pruning is only meaningful with >1 directory
    one = sorted(langs)[0]
    scan = spark.read.parquet(path).filter(F.col("lang") == one)
    plan = _plan(scan)
    # partition filter reached the scan, and the scan reports pruning
    assert "PartitionFilters" in plan and "lang" in plan.split("PartitionFilters", 1)[1][:200]
    assert scan.count() == docs.filter(F.col("lang") == one).count()


def test_compact_parquet_reduces_file_count(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    src = str(tmp_path / "shattered")
    docs.repartition(64).write.parquet(src)  # simulate a small-files sink
    import glob

    n_in = len(glob.glob(f"{src}/*.parquet"))
    assert n_in == 64
    dst = str(tmp_path / "compacted")
    n_out = sinks.compact_parquet(spark, src, dst, target_bytes=256 * 1024)
    assert n_out < n_in
    # data unchanged (multiset equality via sorted collect)
    a = sorted(map(str, spark.read.parquet(dst).collect()))
    b = sorted(map(str, docs.collect()))
    assert a == b
