"""Multimodal plumbing + structured-streaming front end."""

import pytest
from pyspark.sql import functions as F

from rdf2smw_spark.operators import multimodal as mm
from rdf2smw_spark.sources.webpages import synth_pages
from rdf2smw_spark.streaming.stream import run_stream_triplify, windowed_capture_counts
from rdf2smw_spark.triplify import triplify


def test_feature_extraction_plumbing(spark):
    media = mm.synth_media(spark, n=24)
    feats = mm.extract_features(media, fake=True)
    rows = feats.collect()
    assert len(rows) == 24
    assert all(len(r["feature"]) == mm.FEATURE_DIM for r in rows)
    assert all(0.0 <= v <= 1.0 for r in rows for v in r["feature"])
    # deterministic across partitioning
    again = {r["media_id"]: r["checksum"] for r in mm.extract_features(media.repartition(7)).collect()}
    assert again == {r["media_id"]: r["checksum"] for r in rows}


def test_real_decode_is_explicit_stub(spark):
    media = mm.synth_media(spark, n=3)
    with pytest.raises(Exception) as exc:
        mm.extract_features(media, fake=False).collect()
    assert "NotImplementedError" in str(exc.value) or "real decode" in str(exc.value)


def test_frame_sampling_counts(spark):
    media = mm.synth_media(spark, n=9)
    frames = mm.frame_sample(media, every_ms=250)
    per = frames.groupBy("media_id").count().collect()
    durations = {r["media_id"]: r["duration_ms"] for r in media.filter("kind = 'video'").collect()}
    for r in per:
        expected = len(range(0, durations[r["media_id"]], 250))
        assert r["count"] == expected


def test_stream_triplify_matches_batch(spark, sf_dir, tmp_path):
    pages = synth_pages(spark, sf_dir).limit(50)
    src = str(tmp_path / "src")
    pages.write.parquet(src)
    schema = spark.read.parquet(src).schema
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    run_stream_triplify(spark, src, out, ck, schema)
    streamed = spark.read.parquet(out).toPandas()
    batch = triplify(spark.read.parquet(src)).toPandas()
    key = lambda df: sorted(map(tuple, df.fillna("").astype(str).values.tolist()))
    assert key(streamed) == key(batch)


def test_stream_nt_ingest_incremental(spark, tmp_path):
    """Exactly-once file-level incremental ingest: a second drain with
    the same checkpoint processes ONLY newly-arrived .nt files, and
    malformed lines are quarantined inline instead of failing the
    stream."""
    import os

    from rdf2smw_spark.streaming.stream import run_stream_nt_ingest

    src = tmp_path / "nt_in"
    os.makedirs(src)
    (src / "a.nt").write_text('<http://e/s1> <http://e/p> "v1" .\n')
    (src / "b.nt").write_text(
        '<http://e/s2> <http://e/p> "v2" .\nthis line is garbage\n'
    )
    out, ck = str(tmp_path / "nt_out"), str(tmp_path / "nt_ck")
    run_stream_nt_ingest(spark, str(src), out, ck)
    first = spark.read.parquet(out)
    assert first.filter("error is null").count() == 2
    assert first.filter("error is not null").count() == 1

    # new file arrives; rerun drains ONLY it (no duplicate s1/s2 rows)
    (src / "c.nt").write_text('<http://e/s3> <http://e/p> "v3" .\n')
    run_stream_nt_ingest(spark, str(src), out, ck)
    rows = spark.read.parquet(out).filter("error is null").collect()
    assert sorted(r["subj"] for r in rows) == [
        "http://e/s1", "http://e/s2", "http://e/s3",
    ]
    # per-file provenance tagged by input_file_name
    assert {r["src_url"].rsplit("/", 1)[-1] for r in rows} == {"a.nt", "b.nt", "c.nt"}


def test_windowed_capture_counts_batch_semantics(spark, sf_dir):
    # the same agg runs on the batch frame (streaming uses withWatermark)
    pages = synth_pages(spark, sf_dir)
    out = (
        pages.groupBy(F.window("warc_ts", "1 hour").alias("w"), "lang")
        .agg(F.count("*").alias("n_captures"))
    )
    total = out.agg(F.sum("n_captures")).first()[0]
    assert total == pages.count()


def test_stateful_url_dedup_across_batches(spark, sf_dir, tmp_path):
    """applyInPandasWithState: first capture per url survives, the
    duplicate capture (same url, +1h) is suppressed by keyed state."""
    from rdf2smw_spark.streaming.stream import dedup_stream_by_url

    pages = synth_pages(spark, sf_dir).limit(120)
    src = str(tmp_path / "src")
    pages.write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    out = str(tmp_path / "out")
    q = (
        dedup_stream_by_url(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(out)
    urls = [r["url"] for r in got.select("url").collect()]
    assert len(urls) == len(set(urls))  # one row per url
    # kept row is the EARLIEST capture
    import pyspark.sql.functions as F
    mn = pages.groupBy("url").agg(F.min("warc_ts").alias("warc_ts"))
    assert got.select("url", "warc_ts").exceptAll(mn.join(got.select("url"), "url")).count() == 0


def test_stateful_fingerprint_dedup_cross_url(spark, tmp_path):
    """Streaming twin of dd_exact: identical text under DIFFERENT urls
    collapses to one row per content fingerprint across micro-batches;
    the kept row is the (warc_ts, url)-earliest."""
    from datetime import datetime

    from rdf2smw_spark.streaming.stream import dedup_stream_by_fingerprint

    rows = [
        ("http://a/1", datetime(2024, 1, 1, 5), "same content"),
        ("http://b/2", datetime(2024, 1, 1, 3), "same content"),   # earliest dup
        ("http://c/3", datetime(2024, 1, 1, 9), "same content"),
        ("http://d/4", datetime(2024, 1, 2, 0), "unique content"),
    ]
    src = str(tmp_path / "src")
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, text string")
    df.coalesce(1).write.parquet(src)
    schema = spark.read.parquet(src).schema
    out = str(tmp_path / "out")
    q = (
        dedup_stream_by_fingerprint(spark.readStream.schema(schema).parquet(src))
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r["fingerprint"]: r["url"] for r in spark.read.parquet(out).collect()}
    assert len(got) == 2 and "http://b/2" in got.values()


def test_stateful_url_dedup_multichunk(spark, tmp_path):
    """Regression (round-1 advice): with arrow.maxRecordsPerBatch=2 a
    url's rows span several Arrow chunks inside ONE micro-batch; the
    earliest capture sits in a later chunk (rows arrive ts-descending).
    The dedup must fold the min across all chunks, not stop at the first
    non-empty one."""
    from datetime import datetime

    from rdf2smw_spark.streaming.stream import dedup_stream_by_url

    rows = [
        ("http://ex.org/a", datetime(2024, 1, 1, h), "en") for h in (23, 22, 21, 20, 1)
    ] + [("http://ex.org/b", datetime(2024, 1, 2, h), "de") for h in (9, 8, 7, 6, 2)]
    src = str(tmp_path / "src")
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, lang string")
    df.coalesce(1).write.parquet(src)
    schema = spark.read.parquet(src).schema

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        out = str(tmp_path / "out")
        q = (
            dedup_stream_by_url(spark.readStream.schema(schema).parquet(src))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {r["url"]: r["warc_ts"] for r in spark.read.parquet(out).collect()}
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert got == {
        "http://ex.org/a": datetime(2024, 1, 1, 1),
        "http://ex.org/b": datetime(2024, 1, 2, 2),
    }
