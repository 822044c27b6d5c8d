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


def test_real_decode_bmp_wav(spark):
    """fake=False decodes REAL pixels/samples for the codec-less formats
    (24-bit BMP, PCM WAV): a solid-red image yields meanR=1/meanG=0 and
    a half-amplitude square wave yields rms~0.5 — computed from bytes,
    not from a digest."""
    red = mm.encode_bmp(4, 2, [(255, 0, 0)] * 8)
    wav = mm.encode_wav(16000, [0.5, -0.5] * 100)
    media = spark.createDataFrame(
        [
            (0, "image", bytearray(red), 4, 2, None, None),
            (1, "audio", bytearray(wav), None, None, 16000, 12),
        ],
        mm.MEDIA_SCHEMA,
    )
    got = {r["media_id"]: r["feature"] for r in mm.extract_features(media, fake=False).collect()}
    img, aud = got[0], got[1]
    assert abs(img[2] - 1.0) < 1e-6 and img[3] == 0.0 and img[4] == 0.0  # mean RGB
    assert abs(img[5] - 1 / 3) < 1e-6                                     # mean gray
    assert abs(aud[0] - 16000 / 48000) < 1e-6                             # sample rate
    assert abs(aud[3] - 0.5) < 1e-3                                       # rms
    assert abs(aud[6] - 1.0) < 1e-2                                       # zero-cross rate


def test_real_decode_ppm_and_unsupported(spark):
    ppm = b"P6\n2 1\n255\n" + bytes([0, 255, 0] * 2)
    w, h, px = mm.decode_image(ppm)
    assert (w, h) == (2, 1) and px == [(0, 255, 0)] * 2
    media = spark.createDataFrame(
        [(0, "image", bytearray(b"\xff\xd8jpeg-bytes"), 1, 1, None, None)],
        mm.MEDIA_SCHEMA,
    )
    with pytest.raises(Exception) as exc:
        mm.extract_features(media, fake=False).collect()
    assert "NotImplementedError" in str(exc.value) or "codec" in str(exc.value)


def test_stream_fingerprint_null_text_passes_through(spark, tmp_path):
    """NULL-text rows are not content duplicates of each other: every
    one passes through (fingerprint NULL) instead of collapsing onto the
    shared NULL md5 key (ADVICE r2)."""
    from datetime import datetime

    from rdf2smw_spark.streaming.stream import dedup_stream_by_fingerprint

    rows = [
        ("http://a/1", datetime(2024, 1, 1, 1), "same content"),
        ("http://b/2", datetime(2024, 1, 1, 2), "same content"),
        ("http://n/3", datetime(2024, 1, 1, 3), None),
        ("http://n/4", datetime(2024, 1, 1, 4), None),
    ]
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, "url string, warc_ts timestamp, text string") \
        .coalesce(1).write.parquet(src)
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
    got = spark.read.parquet(out)
    assert got.filter("fingerprint is null").count() == 2  # both NULL-text rows kept
    assert got.filter("fingerprint is not null").count() == 1  # content dedup intact


def test_stream_url_dedup_ttl_expires_state(spark, tmp_path):
    """ttl_seconds mode: an idle url's state is removed at the first
    micro-batch after the TTL, so a later recapture RE-EMITS — state
    size stays bounded by the urls active within one TTL window."""
    import time
    from datetime import datetime

    from rdf2smw_spark.streaming.stream import dedup_stream_by_url

    src, out, ck = (str(tmp_path / d) for d in ("src", "out", "ck"))
    sch = "url string, warc_ts timestamp, lang string"

    def drain(rows, expected_total):
        # A registered processing-time timeout keeps the query alive
        # forever (it schedules batches to fire future timeouts — even
        # under availableNow, and processAllAvailable never returns), so
        # TTL-mode drains poll the sink for the expected rows, then stop.
        spark.createDataFrame(rows, sch).coalesce(1).write.mode("append").parquet(src)
        schema = spark.read.parquet(src).schema
        q = (
            dedup_stream_by_url(
                spark.readStream.schema(schema).parquet(src), ttl_seconds=1
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        deadline = time.time() + 90
        while time.time() < deadline:
            if q.awaitTermination(2):
                break
            try:
                if spark.read.parquet(out).count() >= expected_total:
                    break
            except Exception:
                pass  # sink dir not created yet
        q.stop()
        q.awaitTermination()

    a, b = "http://ex.org/a", "http://ex.org/b"
    drain([(a, datetime(2024, 1, 1, 0), "en")], 1)         # A emits, TTL clock starts
    time.sleep(2.5)                                        # > ttl
    drain([(b, datetime(2024, 1, 1, 1), "en")], 2)         # batch fires A's timeout
    drain([(a, datetime(2024, 1, 1, 2), "en")], 3)         # A re-emits (state gone)
    urls = [r["url"] for r in spark.read.parquet(out).collect()]
    assert sorted(urls) == [a, a, b]


def test_windowed_counts_drop_late_data(spark, tmp_path):
    """Real watermark semantics across micro-batches: an event arriving
    2h+ behind the observed max ts is DROPPED from its (already
    watermark-closed) window, while a batch aggregation would count it.
    Sequential availableNow drains against one checkpoint advance the
    watermark between batches; append mode emits a window only once the
    watermark passes its end."""
    import os
    from datetime import datetime

    from rdf2smw_spark.streaming.stream import windowed_capture_counts

    src, out, ck = (str(tmp_path / d) for d in ("src", "out", "ck"))
    sch = "url string, warc_ts timestamp, lang string"

    def drain(rows):
        spark.createDataFrame(rows, sch).coalesce(1).write.mode("append").parquet(src)
        schema = spark.read.parquet(src).schema
        q = (
            windowed_capture_counts(
                spark.readStream.schema(schema).parquet(src),
                window="1 hour",
                watermark="2 hours",
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    d = datetime
    drain([("u1", d(2024, 1, 1, 10, 0), "en"), ("u2", d(2024, 1, 1, 10, 15), "en")])
    # late straggler (07:30 << watermark 08:15) + a watermark advancer
    drain([("u3", d(2024, 1, 1, 7, 30), "en"), ("u4", d(2024, 1, 1, 14, 0), "en")])
    # advance watermark past 15:00 so the 14:00 window also emits
    drain([("u5", d(2024, 1, 2, 0, 0), "en")])

    got = {
        (r["window_start"].hour, r["n_captures"])
        for r in spark.read.parquet(out).filter("window_start < '2024-01-01 23:00:00'").collect()
    }
    assert (10, 2) in got      # on-time window emitted complete
    assert (14, 1) in got      # advancer's own window emitted
    assert not any(h == 7 for h, _ in got)  # the late event's window never appears


# --- streaming NEAR-dup suppression (round-4: band-key state + TTL) ----------


def _near_dedup_setup(tmp_path):
    return (
        str(tmp_path / "nd_src"),
        str(tmp_path / "nd_out"),
        str(tmp_path / "nd_ck"),
        str(tmp_path / "nd_state"),
    )


_ND_SCHEMA = "url string, warc_ts timestamp, lang string, text string"

_BASE_TEXT = (
    "the quick brown fox jumps over the lazy dog while seventeen "
    "astronauts catalog improbable minerals beneath the glacier and "
    "the committee debates logistics of the northern expedition route"
)


def test_stream_near_dedup_suppresses_recrawl_within_ttl(spark, tmp_path):
    """A near-duplicate (NOT identical) recrawl under a different url
    must be suppressed on a later drain; after the event-time TTL it
    must re-emit."""
    from datetime import datetime

    from rdf2smw_spark.streaming.stream import run_stream_near_dedup

    src, out, ck, state = _near_dedup_setup(tmp_path)
    sch = _ND_SCHEMA

    def drain():
        run_stream_near_dedup(
            spark, src, out, ck, state,
            spark.read.parquet(src).schema, ttl_seconds=3600,
        )

    # drain 1: the original + one genuinely different doc
    spark.createDataFrame(
        [
            ("https://a.example/1", datetime(2024, 1, 1, 10), "en", _BASE_TEXT),
            ("https://b.example/1", datetime(2024, 1, 1, 10), "en",
             "completely unrelated content about maritime signal flags and "
             "the taxonomy of deepwater cephalopods in the southern ocean"),
        ],
        sch,
    ).write.mode("append").parquet(src)
    drain()
    assert spark.read.parquet(out).count() == 2

    # drain 2 (inside TTL): a near-dup recrawl of doc A (small suffix,
    # exactly the planted-positive shape of near_dup_corpus) + a new doc
    spark.createDataFrame(
        [
            ("https://a.example/recrawl", datetime(2024, 1, 1, 10, 30), "en",
             _BASE_TEXT + " extra tail words appended here"),
            ("https://c.example/1", datetime(2024, 1, 1, 10, 30), "en",
             "a third document on the economics of lighthouse maintenance "
             "contracts along rocky coastlines during the winter season"),
        ],
        sch,
    ).write.mode("append").parquet(src)
    drain()
    urls = {r["url"] for r in spark.read.parquet(out).collect()}
    assert "https://c.example/1" in urls
    assert "https://a.example/recrawl" not in urls, "near-dup must be suppressed"

    # drain 3 (event time far past the TTL): the same near-dup re-emits
    spark.createDataFrame(
        [
            ("https://a.example/later", datetime(2024, 1, 3, 10), "en",
             _BASE_TEXT + " extra tail words appended here"),
        ],
        sch,
    ).write.mode("append").parquet(src)
    drain()
    urls = {r["url"] for r in spark.read.parquet(out).collect()}
    assert "https://a.example/later" in urls, "expired state must re-emit"


def test_stream_near_dedup_within_batch_keeps_min_url(spark, tmp_path):
    """Two near-dups arriving in the SAME drain collapse to one survivor
    (the MIN url), exactly like the batch near_dedup_pages."""
    from datetime import datetime

    from rdf2smw_spark.streaming.stream import run_stream_near_dedup

    src, out, ck, state = _near_dedup_setup(tmp_path)
    spark.createDataFrame(
        [
            ("https://x.example/b", datetime(2024, 2, 1), "en",
             _BASE_TEXT + " extra tail words appended here"),
            ("https://x.example/a", datetime(2024, 2, 1), "en", _BASE_TEXT),
            ("https://y.example/1", datetime(2024, 2, 1), "en",
             "unrelated treatise concerning the migration patterns of arctic "
             "terns and the instrumentation used to track their journeys"),
        ],
        _ND_SCHEMA,
    ).write.mode("append").parquet(src)
    run_stream_near_dedup(
        spark, src, out, ck, state, spark.read.parquet(src).schema,
    )
    urls = {r["url"] for r in spark.read.parquet(out).collect()}
    assert urls == {"https://x.example/a", "https://y.example/1"}


# --- PNG decode (round 4: the last stdlib-decodable image seam closed) -------


def test_png_roundtrip_all_filters():
    """Every scanline filter (None/Sub/Up/Average/Paeth) decodes back to
    the exact pixels — encoder and decoder implement the filters
    independently (forward vs inverse), so agreement is evidence."""
    px = [
        ((r * 37 + c * 91) % 256, (r * 11 + c * 3) % 256, (r * 201 + c * 53) % 256)
        for r in range(5)
        for c in range(7)
    ]
    for ft in range(5):
        raw = mm.encode_png(7, 5, px, color_type=2, filter_type=ft)
        w, h, got = mm.decode_image(raw)
        assert (w, h) == (7, 5) and got == px, f"filter {ft}"


def test_png_gray_and_rgba():
    px = [(i * 8 % 256,) * 3 for i in range(12)]
    for ct in (0, 6):
        raw = mm.encode_png(4, 3, px, color_type=ct, filter_type=4)
        w, h, got = mm.decode_image(raw)
        assert (w, h) == (4, 3) and got == px, f"color_type {ct}"


def test_png_features_through_spark(spark):
    """fake=False computes real pixel statistics from PNG bytes inside
    the Arrow-batched kernel, same as BMP/PPM."""
    green = mm.encode_png(4, 2, [(0, 255, 0)] * 8, filter_type=2)
    media = spark.createDataFrame(
        [(0, "image", bytearray(green), 4, 2, None, None)], mm.MEDIA_SCHEMA
    )
    feats = mm.extract_features(media, fake=False).collect()[0]["feature"]
    assert feats[2] == 0.0 and abs(feats[3] - 1.0) < 1e-6 and feats[4] == 0.0


def test_png_unsupported_variants_raise():
    import struct as st
    import zlib

    # 16-bit depth header
    ihdr = st.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    chunk = lambda t, d: st.pack(">I", len(d)) + t + d + st.pack(
        ">I", zlib.crc32(t + d) & 0xFFFFFFFF
    )
    raw = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError):
        mm.decode_image(raw)


def test_stream_stream_time_join(spark, tmp_path):
    """Fetch→render attribution: renders join their fetch iff within the
    delay bound; streaming result == batch result on the same data."""
    import datetime as dt

    from rdf2smw_spark.streaming.stream import stream_time_join

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ts(mins):
        return t0 + dt.timedelta(minutes=mins)

    fetches = spark.createDataFrame(
        [("u1", ts(0)), ("u2", ts(5)), ("u3", ts(10))],
        "url string, fetch_ts timestamp",
    )
    renders = spark.createDataFrame(
        [
            ("u1", ts(3)),    # within 10 min -> joins
            ("u1", ts(25)),   # too late -> excluded
            ("u2", ts(5)),    # not strictly after -> excluded
            ("u2", ts(14)),   # within -> joins
            ("u9", ts(1)),    # unknown key -> excluded
        ],
        "url string, render_ts timestamp",
    )
    fdir, rdir = str(tmp_path / "f"), str(tmp_path / "r")
    fetches.write.parquet(fdir)
    renders.write.parquet(rdir)

    # batch semantics (watermark no-op) pins the expected pairs
    batch = stream_time_join(fetches, renders, "url", "fetch_ts", "render_ts")
    expected = sorted(
        (r["l.url"] if "l.url" in r else r["url"], r["render_ts"])
        for r in batch.select("l.url", "render_ts").collect()
    )
    assert [u for u, _ in expected] == ["u1", "u2"]

    fs = spark.readStream.schema(fetches.schema).parquet(fdir)
    rs = spark.readStream.schema(renders.schema).parquet(rdir)
    joined = stream_time_join(fs, rs, "url", "fetch_ts", "render_ts")
    out = str(tmp_path / "out")
    q = (
        joined.select("l.url", "fetch_ts", "render_ts")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["url"], r["render_ts"])
        for r in spark.read.parquet(out).collect()
    )
    assert got == expected


def test_session_window_counts(spark, tmp_path):
    """Gap semantics: captures 10 min apart coalesce under a 30-min gap;
    a 2-hour silence opens a new session. Streaming drain == batch."""
    import datetime as dt

    from rdf2smw_spark.streaming.stream import session_capture_counts

    t0 = dt.datetime(2024, 3, 1, 8, 0, 0)

    def ts(mins):
        return t0 + dt.timedelta(minutes=mins)

    rows = [
        ("http://a.example.org/1", ts(0)),
        ("http://a.example.org/2", ts(10)),
        ("http://a.example.org/3", ts(20)),   # one session of 3
        ("http://a.example.org/4", ts(180)),  # silence -> new session
        ("http://b.example.org/1", ts(5)),    # other host, own session
        # watermark flush: append mode emits a session only once the
        # watermark (max event time - 2h) passes its end + gap; this far
        # -future capture closes every real session and stays open itself
        ("http://flush.example.org/x", ts(400)),
    ]
    pages = spark.createDataFrame(rows, "url string, warc_ts timestamp")
    batch = session_capture_counts(pages).collect()
    got = sorted(
        (r["host"], r["n_captures"]) for r in batch
        if r["host"] != "flush.example.org"
    )
    assert got == [("a.example.org", 1), ("a.example.org", 3), ("b.example.org", 1)]

    src = str(tmp_path / "src")
    pages.write.parquet(src)
    stream = spark.readStream.schema(pages.schema).parquet(src)
    out = str(tmp_path / "out")
    q = (
        session_capture_counts(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    drained = sorted(
        (r["host"], r["n_captures"]) for r in spark.read.parquet(out).collect()
    )
    # append mode emits only watermark-closed sessions: every real
    # session closed by the flush row; the flush session itself stays
    # buffered (never emitted), exactly the bounded-state contract
    assert drained == got


def test_stream_incremental_pages_maintains_wiki(spark, tmp_path):
    """Continuous KG construction: three drains (bootstrap, fact delta
    on the fast path, new-predicate delta forcing the full-rebuild
    fallback); after each drain the maintained pages table must equal a
    one-shot batch build over everything ingested so far."""
    import os

    from rdf2smw_spark.operators.convert import triples_to_pages
    from rdf2smw_spark.operators.render import render_all
    from rdf2smw_spark.sources.ntriples import parse_ntriples_lines
    from rdf2smw_spark.streaming.stream import run_stream_incremental_pages

    src = tmp_path / "nt_in"
    os.makedirs(src)
    work = str(tmp_path / "work")

    def batch_pages():
        lines = spark.read.text(str(src)).withColumn(
            "src_url", F.input_file_name()
        )
        t = parse_ntriples_lines(lines).filter(F.col("error").isNull()).select(
            "subj", "pred", "obj", "obj_is_iri", "obj_datatype", "src_url"
        )
        c, p, tp = render_all(triples_to_pages(spark, t), use_templates=True)
        return c.unionByName(p).unionByName(tp).select("title", "page_type", "xml")

    def streamed_pages():
        return spark.read.parquet(os.path.join(work, "pages"))

    def assert_equal():
        a = sorted(map(str, streamed_pages().collect()))
        b = sorted(map(str, batch_pages().collect()))
        assert a == b

    # drain 1: bootstrap
    (src / "a.nt").write_text(
        '<http://e/s1> <http://e/p1> "v1" .\n'
        '<http://e/s2> <http://e/p1> "v2" .\n'
    )
    r1 = run_stream_incremental_pages(spark, str(src), work)
    assert r1["batches"] == 1
    assert_equal()

    # drain 2: fact delta, existing predicate -> incremental fast path
    (src / "b.nt").write_text(
        '<http://e/s1> <http://e/p1> "v3" .\n'
        '<http://e/s3> <http://e/p1> "v4" .\n'
    )
    r2 = run_stream_incremental_pages(spark, str(src), work)
    assert r2["batches"] == 1  # exactly-once: only the new file drained
    assert_equal()
    # s1's page accumulated both facts
    s1 = [r for r in streamed_pages().collect() if r["title"] == "S1"]
    assert len(s1) == 1 and "v1" in s1[0]["xml"] and "v3" in s1[0]["xml"]

    # drain 3: NEW predicate -> full-rebuild fallback; property page appears
    (src / "c.nt").write_text('<http://e/s4> <http://e/p2> "x" .\n')
    run_stream_incremental_pages(spark, str(src), work)
    assert_equal()
    titles = {r["title"] for r in streamed_pages().collect()}
    assert "S4" in titles


def test_funnel_stream_advances_across_batches(spark, tmp_path):
    """The funnel state machine survives micro-batch boundaries: u1
    completes view->click in drain 1 and purchase in drain 2; u2's
    click PRECEDES its view, so it never advances past step 1."""
    import os

    from rdf2smw_spark.streaming.stream import funnel_stream

    src = tmp_path / "ev"
    os.makedirs(src)
    schema = "user_id long, ts long, event_id long, event_type string"

    def drain(tag):
        out = str(tmp_path / f"out_{tag}")
        q = (
            funnel_stream(spark.readStream.schema(schema).parquet(str(src)))
            .writeStream.format("parquet")
            .option("path", str(tmp_path / "sink"))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(str(tmp_path / "sink")).collect()

    import glob
    import shutil

    def land(df, tag):
        tmp = str(tmp_path / f"stage_{tag}")
        df.coalesce(1).write.parquet(tmp)
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        shutil.copy(part, str(src / f"{tag}.parquet"))

    batch1 = spark.createDataFrame(
        [(1, 100, 1, "view"), (1, 200, 2, "click"), (2, 500, 3, "click"), (2, 600, 4, "view")],
        schema,
    )
    land(batch1, "b1")
    rows = {(r["user_id"], r["steps"]) for r in drain(1)}
    # u1 advanced to 2; u2 only to 1 (its click at 500 precedes view at 600)
    assert (1, 2) in rows and (2, 1) in rows and (2, 2) not in rows

    batch2 = spark.createDataFrame(
        [(1, 300, 5, "purchase"), (2, 550, 6, "purchase")], schema
    )
    land(batch2, "b2")
    rows = sorted((r["user_id"], r["steps"]) for r in drain(2))
    # u1 completed (3 steps emitted in drain 2); u2 unchanged (purchase
    # requires a prior click AFTER the view — no new emission)
    assert (1, 3) in rows
    assert (2, 2) not in rows and (2, 3) not in rows
    full = [r for r in drain(3) if r["user_id"] == 1 and r["steps"] == 3]
    assert full and full[0]["purchase_ts"] == 300 and full[0]["view_ts"] == 100
