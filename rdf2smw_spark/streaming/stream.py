"""Structured Streaming front end (SURVEY.md §2.9 — the reference is a
batch CLI; streaming is a new capability for continuous crawl ingestion).

The same EXTRACT/TRIPLIFY transforms run unchanged on a readStream
DataFrame (they are plain column expressions / mapInPandas); this module
adds the streaming-specific pieces: watermarked event-time windows over
crawl captures and a file-source → parquet-sink wiring with availableNow
for deterministic draining in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rdf2smw_spark.sources.ntriples import parse_ntriples_lines
from rdf2smw_spark.triplify import triplify


def stream_pages(spark: SparkSession, src_dir: str, schema) -> DataFrame:
    return spark.readStream.schema(schema).parquet(src_dir)


def windowed_capture_counts(
    pages: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window capture counts per language with late-data
    watermarking — the canonical streaming agg over crawl snapshots."""
    return (
        pages.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "lang")
        .agg(F.count("*").alias("n_captures"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "lang",
            "n_captures",
        )
    )


def dedup_stream_by_url(pages: DataFrame, ttl_seconds: int | None = None) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): emit only the
    first capture of each url across ALL micro-batches — cross-batch
    dedup that dropDuplicates-with-watermark can't express once the
    watermark passes. State per url: a seen flag.

    ttl_seconds=None (drain-style default): NoTimeout, state lives for
    the query's lifetime — availableNow triggers terminate cleanly.
    ttl_seconds set (24/7 crawl mode): ProcessingTimeTimeout — a key
    idle for ttl_seconds has its state removed at the next micro-batch,
    so state size is bounded by the urls active inside one TTL window
    and an expired url re-emits on its next capture. Activity refreshes
    the clock (sliding TTL). Caveat (measured): a registered
    processing-time timeout keeps an availableNow query alive forever
    (it schedules batches to fire future timeouts) — in TTL mode run a
    processing-time trigger, or drain with processAllAvailable()+stop()."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "url string, warc_ts timestamp, lang string"
    state_schema = "seen boolean"
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_seconds
        else GroupStateTimeout.NoTimeout
    )

    def dedup(key, pdf_iter, state: GroupState):
        if ttl_seconds and state.hasTimedOut:
            state.remove()  # aged out: the url may re-emit later
            return
        # A key's rows may span several Arrow chunks within one
        # micro-batch (spark.sql.execution.arrow.maxRecordsPerBatch) —
        # fold the min-warc_ts row across ALL chunks before deciding,
        # not just the first non-empty one.
        first = None
        for pdf in pdf_iter:
            if state.exists or not len(pdf):
                continue
            row = pdf.sort_values("warc_ts").iloc[0]
            if first is None or row["warc_ts"] < first["warc_ts"]:
                first = row
        if first is not None and not state.exists:
            state.update((True,))
            import pandas as pd

            yield pd.DataFrame(
                {"url": [key[0]], "warc_ts": [first["warc_ts"]], "lang": [first["lang"]]}
            )
        if ttl_seconds and state.exists:
            state.setTimeoutDuration(ttl_seconds * 1000)

    return (
        pages.select("url", "warc_ts", "lang")
        .groupBy("url")
        .applyInPandasWithState(
            dedup,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=timeout,
        )
    )


def dedup_stream_by_fingerprint(
    pages: DataFrame, ttl_seconds: int | None = None
) -> DataFrame:
    """Cross-batch EXACT-CONTENT dedup (streaming twin of dd_exact):
    fingerprint = md5 of the extracted text, computed JVM-side; only the
    first document per fingerprint across ALL micro-batches is emitted —
    recrawls and mirrors of identical content are dropped even when they
    arrive days apart under different urls.

    NULL-text rows (extraction produced nothing) are NOT content
    duplicates of each other — they bypass the stateful groupBy entirely
    and pass through with a NULL fingerprint (ADVICE r2: grouping them
    under the shared NULL key silently dropped all but one).

    Plan shape: the md5 is a map-side expression, the stateful groupBy
    shuffles on the 32-char fingerprint (uniformly distributed — no
    skew), and per-key state is one boolean. State size is bounded by
    distinct contents seen within one TTL window when ttl_seconds is set
    (ProcessingTimeTimeout + state.remove(), same semantics as
    dedup_stream_by_url); None keeps drain-style triggers simple."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "fingerprint string, url string, warc_ts timestamp"
    state_schema = "seen boolean"
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_seconds
        else GroupStateTimeout.NoTimeout
    )

    def dedup(key, pdf_iter, state: GroupState):
        if ttl_seconds and state.hasTimedOut:
            state.remove()
            return
        first = None
        for pdf in pdf_iter:
            if state.exists or not len(pdf):
                continue
            row = pdf.sort_values(["warc_ts", "url"]).iloc[0]
            if first is None or (row["warc_ts"], row["url"]) < (
                first["warc_ts"], first["url"]
            ):
                first = row
        if first is not None and not state.exists:
            state.update((True,))
            import pandas as pd

            yield pd.DataFrame(
                {
                    "fingerprint": [key[0]],
                    "url": [first["url"]],
                    "warc_ts": [first["warc_ts"]],
                }
            )
        if ttl_seconds and state.exists:
            state.setTimeoutDuration(ttl_seconds * 1000)

    with_text = pages.filter(F.col("text").isNotNull())
    deduped = (
        with_text.select(
            F.md5(F.encode("text", "UTF-8")).alias("fingerprint"), "url", "warc_ts"
        )
        .groupBy("fingerprint")
        .applyInPandasWithState(
            dedup,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=timeout,
        )
    )
    passthrough = pages.filter(F.col("text").isNull()).select(
        F.lit(None).cast("string").alias("fingerprint"), "url", "warc_ts"
    )
    return deduped.unionByName(passthrough)


def run_stream_nt_ingest(
    spark: SparkSession, src_dir: str, out_dir: str, checkpoint_dir: str
) -> None:
    """Incremental N-Triples ingest: drain new .nt files appearing under
    `src_dir` into a parquet triples table, exactly-once per file via
    the streaming checkpoint. Re-running with the same checkpoint
    processes ONLY files added since the last drain — the streaming
    rendering of the reference's one-shot `--in triples.nt` read
    (ttlfilereader.go:39-58) for a continuously-arriving crawl dump.

    Plan shape: the text scan parallelizes per file split, the parser is
    the same Arrow-batched mapInPandas as the batch path (no per-row
    Python), and the sink appends partitioned parquet — no shuffle at
    all. Malformed lines are quarantined inline (error column) rather
    than failing the stream."""
    lines = (
        spark.readStream.format("text")
        .load(src_dir)
        .withColumn("src_url", F.input_file_name())
    )
    parsed = parse_ntriples_lines(lines)
    q = (
        parsed.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_stream_triplify(
    spark: SparkSession, src_dir: str, out_dir: str, checkpoint_dir: str, schema
) -> None:
    """Drain all available page files through TRIPLIFY into parquet —
    exactly-once via the streaming checkpoint (complements the batch
    lineage layer for continuous ingestion)."""
    pages = stream_pages(spark, src_dir, schema)
    q = (
        triplify(pages)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
