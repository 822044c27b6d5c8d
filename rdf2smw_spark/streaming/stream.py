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


def run_stream_near_dedup(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    state_dir: str,
    schema,
    ttl_seconds: int | None = None,
) -> None:
    """Cross-drain NEAR-duplicate suppression — the streaming lift of
    the batch MinHash→connected-components dedup (round-3 verdict #7):
    a recrawl whose text is merely similar (not byte-identical, so
    dedup_stream_by_fingerprint passes it) is suppressed when any of
    its MinHash LSH band hashes collides with a band seen in an earlier
    drain inside the TTL window.

    Design: foreachBatch + an explicit versioned band-key state table,
    NOT applyInPandasWithState. The emit decision spans state KEYS (a
    doc is new only if NONE of its bands has prior state), and chaining
    a second stateful aggregation behind applyInPandasWithState is
    unsupported in append mode — while a band-keyed state TABLE joined
    per micro-batch expresses it exactly. This is the standard
    production shape (Delta/Iceberg MERGE of an LSH-band table); here
    the table is versioned parquet (state_dir/v=<batch_id>, latest
    version wins, idempotent on batch replay).

    Semantics: suppression fires on BAND COLLISION — the same candidate
    signal the batch path verifies with exact Jaccard. The state table
    stores band hashes, not shingle sets, so the streaming pass skips
    the verify step; for md5-hashed r-row bands a collision between
    genuinely dissimilar docs is ~2^-128, so the practical effect is the
    LSH candidate curve itself (P = 1-(1-j^r)^bands). Within one batch
    the same collision graph feeds dedup_clusters (hash-to-min CC) and
    the MIN url per cluster survives — identical to near_dedup_pages.

    TTL is EVENT-time (max warc_ts of the batch is the clock): state
    rows idle past ttl_seconds are dropped before the probe join, so
    state is bounded by bands active within one TTL window and an
    expired near-dup re-emits — the same contract as the exact-dedup
    operators' ProcessingTimeTimeout, but deterministic for replayed
    crawl dumps. Activity refreshes the clock (every batch band upserts
    last_ts, including suppressed docs' bands — sliding TTL).

    Plan shape per batch: shingles+bands are linear map-side work, the
    state probe is one shuffle join on (band, band_hash) (uniform md5
    keys — no skew), CC runs on candidate edges only. No corpus
    self-join, no driver-side loop over rows."""
    import os as _os
    import shutil as _shutil

    from rdf2smw_spark.operators.dedup import (
        char_shingles,
        dedup_clusters,
        minhash_bands,
    )

    def _latest_state():
        if not _os.path.isdir(state_dir):
            return None
        vs = [d for d in _os.listdir(state_dir) if d.startswith("v=")]
        if not vs:
            return None
        path = _os.path.join(state_dir, max(vs, key=lambda d: int(d[2:])))
        return spark.read.parquet(path)

    def _process(batch: DataFrame, batch_id: int) -> None:
        # one row per url within the batch: earliest capture wins
        docs = (
            batch.filter(F.col("text").isNotNull())
            .groupBy("url")
            .agg(F.min(F.struct("warc_ts", "lang", "text")).alias("s"))
            .select("url", "s.warc_ts", "s.lang", "s.text")
            .persist()
        )
        if docs.limit(1).count() == 0:
            docs.unpersist()
            return
        sh = char_shingles(docs.select(F.col("url").alias("doc_id"), "text"))
        bb = minhash_bands(sh).persist()
        clock = docs.agg(F.max("warc_ts")).first()[0]
        state = _latest_state()
        if state is not None and ttl_seconds is not None:
            state = state.filter(
                F.col("last_ts")
                >= F.lit(clock) - F.expr(f"INTERVAL {int(ttl_seconds)} SECONDS")
            )
        if state is not None:
            suppressed = (
                bb.join(state.select("band", "band_hash"), ["band", "band_hash"])
                .select("doc_id")
                .distinct()
            )
            surv_bands = bb.join(suppressed, "doc_id", "left_anti")
        else:
            surv_bands = bb
        a = surv_bands.select(F.col("doc_id").alias("doc_a"), "band", "band_hash")
        b = surv_bands.select(F.col("doc_id").alias("doc_b"), "band", "band_hash")
        edges = (
            a.join(b, ["band", "band_hash"])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b")
            .distinct()
        )
        sdocs = surv_bands.select("doc_id").distinct()
        keep = (
            dedup_clusters(sdocs, edges)
            .filter(F.col("doc_id") == F.col("cluster_id"))
            .select(F.col("doc_id").alias("url"))
        )
        docs.join(keep, "url").select("url", "warc_ts", "lang").write.mode(
            "append"
        ).parquet(out_dir)
        # upsert: live prior state ∪ this batch's bands (ALL docs — a
        # suppressed recrawl refreshes its colliding bands' clock)
        batch_bands = bb.groupBy("band", "band_hash").agg(
            F.min("doc_id").alias("first_url"), F.lit(clock).alias("last_ts")
        )
        prior = (
            state.select("band", "band_hash", "first_url", "last_ts")
            if state is not None
            else None
        )
        merged = batch_bands if prior is None else prior.unionByName(batch_bands)
        new_state = merged.groupBy("band", "band_hash").agg(
            F.min("first_url").alias("first_url"), F.max("last_ts").alias("last_ts")
        )
        new_state.write.mode("overwrite").parquet(
            _os.path.join(state_dir, f"v={batch_id}")
        )
        # retain only the latest two versions (current + rollback)
        for d in _os.listdir(state_dir):
            if d.startswith("v=") and int(d[2:]) < batch_id - 1:
                _shutil.rmtree(_os.path.join(state_dir, d), ignore_errors=True)
        bb.unpersist()
        docs.unpersist()

    q = (
        spark.readStream.schema(schema)
        .parquet(src_dir)
        .writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_time_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    max_delay_seconds: int = 600,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked stream-stream INNER join: pair each left event with
    the right-stream events for the same key arriving within
    (left_ts, left_ts + max_delay] — the fetch→render / impression→click
    attribution shape. Both sides are watermarked so Spark bounds the
    join state: a buffered left row can be dropped once the right
    watermark passes left_ts + max_delay (and vice versa), giving
    O(keys active within watermark+delay) state instead of unbounded
    buffering — the property that lets the join run forever at crawl
    scale. The time-range predicate (not just key equality) is what
    makes the state eviction possible; an unconstrained stream-stream
    equi-join cannot evict anything.

    Works identically on batch DataFrames (watermark is a no-op in
    batch), which is how the test pins result semantics."""
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = F.expr(
        f"l.{key} = r.{key} AND r.{right_ts} > l.{left_ts} "
        f"AND r.{right_ts} <= l.{left_ts} + interval {max_delay_seconds} seconds"
    )
    return l.join(r, cond, "inner")


def session_capture_counts(
    pages: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Per-host crawl sessions via event-time SESSION windows: captures
    of one host closer than `gap` apart coalesce into one session row
    (session_start, session_end, host, n_captures). Unlike tumbling
    windows, session windows have data-driven extents, so state for a
    session closes only when the watermark passes its end + gap — the
    natural unit for 'one crawl visit to one site'. Works identically
    on a batch frame (watermark no-op), which is how the test pins the
    gap semantics."""
    host = F.expr("parse_url(url, 'HOST')")
    return (
        pages.withWatermark("warc_ts", watermark)
        .groupBy(F.session_window("warc_ts", gap).alias("w"), host.alias("host"))
        .agg(F.count("*").alias("n_captures"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "host",
            "n_captures",
        )
    )


def run_stream_incremental_pages(
    spark: SparkSession,
    src_dir: str,
    work_dir: str,
    use_templates: bool = True,
) -> dict:
    """Continuous KG construction: drain newly-arrived .nt dumps and
    maintain the rendered wiki-page table INCREMENTALLY — each
    micro-batch appends its triples to the standing triples table, then
    re-renders ONLY the pages the batch can affect
    (operators/incremental_kg.py: title-closed affected set, schema-pred
    fallback) and upserts them into the pages table by title.

    This is the end-to-end composition of the streaming ingest
    (exactly-once per file), the delta-maintenance operator, and the
    batch renderer — the shape a standing web-KG service runs forever:
    O(delta) render work per drain instead of O(corpus), with the
    schema-delta probe forcing a full rebuild exactly when global dims
    actually changed.

    Layout under work_dir: triples/ (append-only parquet),
    pages/ (upserted parquet keyed by title), ckpt/ (stream checkpoint).
    Returns {batches, pages_total} for the caller's logbook.

    Scale shape: the upsert is anti-join + union + full rewrite of
    pages/ — at 100 TB the pages table would be title-bucketed
    (sinks.write_bucketed) and the rewrite a partition-overwrite of the
    touched buckets only; the sandbox keeps the simple rewrite, same
    join plan."""
    import os

    from rdf2smw_spark.operators.incremental_kg import (
        _subject_titles,
        delta_forces_rebuild,
        incremental_pages,
        maintained_subject_titles,
    )
    from rdf2smw_spark.operators.render import render_all
    from rdf2smw_spark.session import release_scoped_caches
    from rdf2smw_spark.sources.ntriples import parse_ntriples_lines

    triples_dir = os.path.join(work_dir, "triples")
    pages_dir = os.path.join(work_dir, "pages")
    titles_dir = os.path.join(work_dir, "titles")
    dims_dir = os.path.join(work_dir, "dims")
    ckpt_dir = os.path.join(work_dir, "ckpt")
    _DIMS = ("st", "bt", "cd", "pt", "pst")
    state = {"batches": 0}

    def _write_dims(dims):
        for name, df in zip(_DIMS, dims):
            df.write.mode("overwrite").parquet(os.path.join(dims_dir, name))

    def _read_dims():
        return tuple(
            spark.read.parquet(os.path.join(dims_dir, n)) for n in _DIMS
        )

    def _process(batch, batch_id):
        parsed = parse_ntriples_lines(batch).filter(F.col("error").isNull())
        delta = parsed.select(
            "subj", "pred", "obj", "obj_is_iri", "obj_datatype", "src_url"
        ).localCheckpoint()
        if delta.limit(1).count() == 0:
            return
        have_base = os.path.isdir(triples_dir) and any(
            f.endswith(".parquet") for f in os.listdir(triples_dir)
        )
        new_titles = None
        if have_base:
            base = spark.read.parquet(triples_dir)
            stored_dims = (
                _read_dims() if os.path.isdir(dims_dir) else None
            )
            if (
                stored_dims is not None
                and os.path.isdir(titles_dir)
                and not delta_forces_rebuild(base, delta, dims=stored_dims)
            ):
                # fast path with EVERY maintained dim: a fast-path delta
                # cannot retitle, retype, or re-depth anything (that is
                # what delta_forces_rebuild probes), so the stored
                # (subj, title) dim — advanced O(delta) for new subjects
                # — and the five stored conversion dims replace all the
                # full-stream dimension passes this drain would pay
                titles = spark.read.parquet(titles_dir)
                new_titles = maintained_subject_titles(titles, delta).localCheckpoint()
                pages = incremental_pages(
                    spark, base, delta,
                    subject_titles=new_titles,
                    dims=stored_dims,
                )
            else:
                pages = incremental_pages(spark, base, delta)
        else:
            from rdf2smw_spark.operators.convert import triples_to_pages

            pages = triples_to_pages(spark, delta)
        content, props, tpls = render_all(pages, use_templates=use_templates)
        new_pages = (
            content.unionByName(props).unionByName(tpls)
            .select("title", "page_type", "xml")
            .localCheckpoint()  # materialize BEFORE pages/ is rewritten
        )
        delta.write.mode("append").parquet(triples_dir)
        if os.path.isdir(pages_dir):
            prior = spark.read.parquet(pages_dir).localCheckpoint()
            merged = prior.join(
                new_pages.select("title"), "title", "anti"
            ).unionByName(new_pages)
        else:
            merged = new_pages
        merged.write.mode("overwrite").parquet(pages_dir)
        # advance the maintained title dim: fast path wrote the O(delta)
        # update; bootstrap/rebuild paths recompute it from the full table
        if new_titles is not None:
            new_titles.write.mode("overwrite").parquet(titles_dir)
            # conversion dims unchanged on the fast path — no rewrite
        else:
            allt = spark.read.parquet(triples_dir)
            _subject_titles(allt).write.mode("overwrite").parquet(titles_dir)
            from rdf2smw_spark.operators.convert import conversion_dims

            _write_dims(conversion_dims(spark, allt, cache=False))
        release_scoped_caches()
        state["batches"] += 1

    lines = (
        spark.readStream.format("text")
        .load(src_dir)
        .withColumn("src_url", F.input_file_name())
    )
    q = (
        lines.writeStream.foreachBatch(_process)
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n_pages = (
        spark.read.parquet(pages_dir).count() if os.path.isdir(pages_dir) else 0
    )
    return {"batches": state["batches"], "pages_total": n_pages}


def funnel_stream(events: DataFrame, ttl_seconds: int | None = None) -> DataFrame:
    """Cross-batch stateful funnel (streaming twin of ev_funnel): per
    user, a 3-stage view -> click -> purchase machine advanced by each
    micro-batch; a row (user_id, steps, view_ts, click_ts, purchase_ts)
    is emitted whenever the user's progress ADVANCES, so downstream
    sees one row per conversion milestone, not per event.

    Semantics note (the standard streaming trade-off): events are
    applied in (ts, event_id) order WITHIN the state's view of arrival —
    a late-arriving earlier view cannot retroactively lower view_ts once
    set (the batch ev_funnel is the exact-reprocessing oracle for
    audits). State is 3 BIGINTs per active user, TTL-bounded when
    ttl_seconds is set — the same bounded-state contract as the dedup
    states. Unset stages are stored as -1 (state columns are
    null-hostile across Arrow round-trips) and surfaced as NULLs."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        "user_id long, steps integer, view_ts long, click_ts long, purchase_ts long"
    )
    state_schema = "view_ts long, click_ts long, purchase_ts long"
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_seconds
        else GroupStateTimeout.NoTimeout
    )

    def _steps(v, c, p):
        return 1 if v >= 0 else 0, (1 if c >= 0 else 0), (1 if p >= 0 else 0)

    def fn(key, pdf_iter, state: GroupState):
        import pandas as pd

        if ttl_seconds and state.hasTimedOut:
            state.remove()
            return
        v, c, p = state.get if state.exists else (-1, -1, -1)
        before = sum(_steps(v, c, p))
        chunks = [pdf for pdf in pdf_iter if len(pdf)]
        if chunks:
            rows = pd.concat(chunks).sort_values(["ts", "event_id"])
            for ev in rows.itertuples():
                if ev.event_type == "view" and v < 0:
                    v = int(ev.ts)
                elif ev.event_type == "click" and v >= 0 and c < 0 and ev.ts > v:
                    c = int(ev.ts)
                elif ev.event_type == "purchase" and c >= 0 and p < 0 and ev.ts > c:
                    p = int(ev.ts)
        after = sum(_steps(v, c, p))
        if after > before or (not state.exists and after > 0):
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "steps": [after],
                    "view_ts": [v if v >= 0 else None],
                    "click_ts": [c if c >= 0 else None],
                    "purchase_ts": [p if p >= 0 else None],
                }
            )
        state.update((int(v), int(c), int(p)))
        if ttl_seconds:
            state.setTimeoutDuration(ttl_seconds * 1000)

    return (
        events.select("user_id", "ts", "event_id", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=timeout,
        )
    )


def run_stream_sparql_view(
    spark: SparkSession,
    src_dir: str,
    work_dir: str,
    view_query: str,
) -> dict:
    """A STANDING SPARQL count view over a continuously-arriving crawl:
    drain newly-appeared .nt files (exactly-once via the stream
    checkpoint) and maintain the materialized view INCREMENTALLY with
    operators/ivm.py — each micro-batch merges |V| + |V(Δ)| aggregate
    rows; the accumulated triples are never re-scanned (they are never
    even stored: the view IS the state).

    The view query must be delta-decomposable — single-source
    (ivm.count_view), a single-source SUM/AVG view (ivm.sum_view: the
    snapshot stores the hidden __n/__nn/__s supports and readers get
    the published projection), a single-source MIN/MAX view
    (ivm.minmax_view — the stream is append-only, and extrema are
    exactly maintainable under pure inserts without ever reading the
    accumulated base), a DISTINCT-aggregate / GROUP_CONCAT view
    (ivm.distinct_view: the snapshot stores the per-group
    value-frequency support and readers derive the aggregates from
    it), or an N-pattern JOIN view maintained by the counting
    algorithm (ivm.join_count_*: the snapshot then stores the
    per-pattern PARTIAL COUNT relations alongside the derived view,
    and each drain merges the partials and re-derives the view from
    them alone — the accumulated triples are still never re-scanned).
    A view carrying a HAVING / ORDER BY / LIMIT epilogue is accepted
    when its STRIPPED core fits one of those families: snapshots store
    the full support (every group with its true partials) and readers
    get the epilogue re-applied over the slim snapshot
    (ivm.apply_epilogue), so threshold crossings and top-k membership
    track the stream exactly. Anything else raises loudly (a
    non-additive view belongs on the recompute path).
    Versioned view snapshots (v=N) make each write atomic relative to
    the read of the previous version; only the latest is kept. Each
    snapshot records the set of FILES it has applied: foreachBatch is
    at-least-once (a crash between the view write and the offset
    commit replays the batch — and a lost checkpoint restarts batch
    ids at 0 while repacking old AND new files into one batch), so
    each micro-batch is filtered to its not-yet-applied files before
    merging. Exactly-once per file, independent of batch numbering or
    checkpoint resets; the file list grows one entry per .nt dump.

    Layout under work_dir: view/v=N (parquet snapshots), ckpt/.
    Returns {batches, view_rows}."""
    import os as _os
    import shutil as _shutil

    from rdf2smw_spark.operators.ivm import (
        count_view,
        distinct_view,
        is_delta_decomposable,
        is_distinct_delta_decomposable,
        is_join_delta_decomposable,
        is_minmax_delta_decomposable,
        is_sum_delta_decomposable,
        join_count_partials,
        join_count_view_from_partials,
        join_view_pattern_count,
        maintain_count_view,
        maintain_distinct_view,
        maintain_join_count_partials,
        maintain_minmax_view,
        maintain_sum_view,
        minmax_view,
        read_distinct_view,
        read_minmax_view,
        read_sum_view,
        sum_view,
    )
    from rdf2smw_spark.operators.ivm import (
        _epilogue_rewrite,
        apply_epilogue,
        is_epilogue_decomposable,
    )
    from rdf2smw_spark.sources.ntriples import parse_ntriples_lines
    from rdf2smw_spark.sparql import SparqlSyntaxError

    orig_query = view_query
    epilogue_mode = False
    if is_epilogue_decomposable(view_query):
        # a HAVING/ORDER BY/LIMIT view: maintain the epilogue-STRIPPED
        # core through the family machinery below (snapshots store the
        # full support — every group with its true partials) and
        # re-apply the epilogue over the slim snapshot at read time
        epilogue_mode = True
        view_query = _epilogue_rewrite(view_query)[0]

    join_mode = sum_mode = minmax_mode = distinct_mode = False
    n_pats = 0
    if is_delta_decomposable(view_query):
        pass
    elif is_sum_delta_decomposable(view_query):
        # snapshots carry the hidden __n/__nn supports; readers get
        # read_sum_view's projection
        sum_mode = True
    elif is_minmax_delta_decomposable(view_query):
        # append-only stream: pure-insert extrema merge exactly and
        # never read the accumulated base (no delete path here)
        minmax_mode = True
    elif is_distinct_delta_decomposable(view_query):
        # snapshots store the (keys, __v, __c) value-frequency
        # support; readers derive the published aggregates from it
        distinct_mode = True
    elif is_join_delta_decomposable(view_query):
        join_mode = True
        n_pats = join_view_pattern_count(view_query)
    else:
        raise SparqlSyntaxError(
            "view is neither single-source (count or sum) nor "
            "join-delta-decomposable — recompute instead"
        )

    view_dir = _os.path.join(work_dir, "view")
    ckpt_dir = _os.path.join(work_dir, "ckpt")
    state = {"batches": 0}

    import json as _json

    def _latest():
        # _applied.json is the COMMIT RECORD: a snapshot without it is a
        # crash remnant (the parquet write finished but the marker did
        # not, or neither did). Selecting the highest MARKED version —
        # and garbage-collecting unmarked dirs — closes the crash window
        # where a replayed batch would otherwise re-merge files already
        # in an unmarked newest snapshot (double counting), or read a
        # partially-written snapshot as the base.
        if not _os.path.isdir(view_dir):
            return None, 0, set()
        vs = sorted(
            (int(d[2:]) for d in _os.listdir(view_dir) if d.startswith("v=")),
            reverse=True,
        )
        for n in vs:
            vdir = _os.path.join(view_dir, f"v={n}")
            marker = _os.path.join(vdir, "_applied.json")
            if _os.path.exists(marker):
                with open(marker) as fh:
                    applied = set(_json.load(fh)["files"])
                if join_mode:
                    snap = tuple(
                        spark.read.parquet(_os.path.join(vdir, f"p{i + 1}"))
                        for i in range(n_pats)
                    )
                else:
                    snap = spark.read.parquet(vdir)
                return snap, n, applied
            _shutil.rmtree(vdir, ignore_errors=True)  # uncommitted remnant
        return None, 0, set()

    def _read_view(vdir: str):
        """The queryable view of a committed snapshot (join-mode
        snapshots store it under view/, single/sum-mode at the root;
        sum snapshots drop their hidden support columns)."""
        df = spark.read.parquet(
            _os.path.join(vdir, "view") if join_mode else vdir
        )
        if sum_mode:
            df = read_sum_view(df)
        elif minmax_mode:
            df = read_minmax_view(df)
        elif distinct_mode:
            df = read_distinct_view(df, view_query)
        if epilogue_mode:
            df = apply_epilogue(df, orig_query)
        return df

    def _process(batch, batch_id):
        old, n, applied = _latest()
        batch_files = {
            r["src_url"] for r in batch.select("src_url").distinct().collect()
        }
        new_files = sorted(batch_files - applied)
        if not new_files:
            return  # replay of already-applied data (crash or ckpt reset)
        parsed = parse_ntriples_lines(
            batch.filter(F.col("src_url").isin(new_files))
        ).filter(F.col("error").isNull())
        delta = parsed.select(
            "subj", "pred", "obj", "obj_is_iri", "obj_datatype", "src_url"
        ).localCheckpoint()
        vdir = _os.path.join(view_dir, f"v={n + 1}")
        if join_mode:
            if old is None:
                partials = join_count_partials(delta, view_query)
            else:
                partials = maintain_join_count_partials(
                    old, view_query, delta_plus=delta
                )
            for i, p in enumerate(partials):
                p.write.mode("overwrite").parquet(
                    _os.path.join(vdir, f"p{i + 1}")
                )
            # re-derive the view from the WRITTEN partials (one slim
            # partials-join), so the stored view and partials agree
            join_count_view_from_partials(
                [
                    spark.read.parquet(_os.path.join(vdir, f"p{i + 1}"))
                    for i in range(n_pats)
                ],
                view_query,
            ).write.mode("overwrite").parquet(_os.path.join(vdir, "view"))
        elif sum_mode:
            if old is None:
                new = sum_view(delta, view_query)
            else:
                new = maintain_sum_view(old, view_query, delta_plus=delta)
            new.write.mode("overwrite").parquet(vdir)
        elif minmax_mode:
            if old is None:
                new = minmax_view(delta, view_query)
            else:
                # insert-only: the base argument is never read (no
                # delta_minus) — pass the delta as a placeholder
                new = maintain_minmax_view(
                    old, view_query, delta, delta_plus=delta
                )
            new.write.mode("overwrite").parquet(vdir)
        elif distinct_mode:
            if old is None:
                new = distinct_view(delta, view_query)
            else:
                new = maintain_distinct_view(old, view_query, delta_plus=delta)
            new.write.mode("overwrite").parquet(vdir)
        else:
            if old is None:
                new = count_view(delta, view_query)
            else:
                new = maintain_count_view(old, view_query, delta_plus=delta)
            new.write.mode("overwrite").parquet(vdir)
        with open(_os.path.join(vdir, "_applied.json"), "w") as fh:
            _json.dump({"files": sorted(applied | batch_files)}, fh)
        if old is not None:
            _shutil.rmtree(_os.path.join(view_dir, f"v={n}"), ignore_errors=True)
        state["batches"] += 1

    lines = (
        spark.readStream.format("text")
        .load(src_dir)
        .withColumn("src_url", F.input_file_name())
    )
    q = (
        lines.writeStream.foreachBatch(_process)
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    latest, n, _applied = _latest()
    view_rows = 0
    if latest is not None:
        view_rows = _read_view(_os.path.join(view_dir, f"v={n}")).count()
    return {
        "batches": state["batches"],
        "view_rows": view_rows,
    }
