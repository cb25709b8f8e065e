"""Structured Streaming ingestion + serving tests.

Two micro-batches of pages stream into index generations; batch
serving over the union must equal a direct batch BM25 oracle computed
per generation (generations are doc-disjoint, stats per-generation —
the oracle mirrors that). The serving stream scores a query stream into
the parquet mailbox and poll_result retrieves it.
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

import pytest

from search_engine_spark import corpus
from search_engine_spark.streaming.ingest import (
    generation_stats,
    index_stream,
    list_generations,
    query_generations,
)
from search_engine_spark.streaming.serve import poll_result, serve_stream

pytestmark = pytest.mark.skipif(
    not corpus.reference_available(), reason="reference corpus not present"
)


def _write_pages_batch(spark, rows, d: Path, name: str) -> None:
    df = spark.createDataFrame(rows, corpus.PAGES_SCHEMA)
    df.coalesce(1).write.mode("overwrite").json(str(d / "stage"))
    # atomically move the json file into the watched dir
    staged = list((d / "stage").glob("part-*.json"))
    assert staged
    staged[0].rename(d / name)


def _await(predicate, timeout=60.0, interval=0.5):
    t0 = time.monotonic()
    while time.monotonic() - t0 < timeout:
        if predicate():
            return True
        time.sleep(interval)
    return False


def test_stream_ingest_and_serve(spark, tmp_path):
    rows = corpus.reference_pages_rows()
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    idx_dir = tmp_path / "idx"
    (in_dir / "stage").mkdir()

    _write_pages_batch(spark, rows[:60], in_dir, "batch0.json")

    pages_stream = (
        spark.readStream.schema(corpus.PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(in_dir))
    )
    q = index_stream(
        pages_stream,
        str(idx_dir),
        str(tmp_path / "ckpt"),
        n_buckets_per_gen=2,
        merge_stats_every=1,
    )
    try:
        assert _await(lambda: len(list_generations(str(idx_dir))) >= 1)
        _write_pages_batch(spark, rows[60:], in_dir, "batch1.json")
        assert _await(lambda: len(list_generations(str(idx_dir))) >= 2)
        q.processAllAvailable()
    finally:
        q.stop()

    stats = generation_stats(str(idx_dir))
    assert stats["n_docs"] == 100
    assert stats["n_generations"] >= 2

    # merge_stats_every=1 refreshed the global-stats sidecar after the
    # final committed batch: it covers the full generation set
    from search_engine_spark.streaming.ingest import latest_global_stats

    sidecar, covers = latest_global_stats(str(idx_dir))
    assert sidecar is not None
    assert covers == {Path(g).name for g in list_generations(str(idx_dir))}
    assert json.loads((Path(sidecar) / "stats.json").read_text())[
        "n_docs"
    ] == 100

    # Query the union of generations; compare against per-generation
    # batch oracles merged the same way (doc-disjoint exactness).
    queries = corpus.reference_queries_df(spark)
    got = query_generations(spark, str(idx_dir), queries, k=10).collect()
    assert {r.query_id for r in got} == {f"q{i:02d}-r01" for i in range(1, 11)}

    from pyspark.sql import functions as F

    from search_engine_spark.index.build import (
        build_postings,
        doc_lengths,
        term_stats,
    )
    from search_engine_spark.query.scoring import bm25_topk

    gen_results = []
    for g in list_generations(str(idx_dir)):
        gstats = json.loads((Path(g) / "stats.json").read_text())
        from search_engine_spark.index.segments import read_docmeta

        urls = {r.url for r in read_docmeta(spark, g).select("url").collect()}
        pages_g = spark.createDataFrame(
            [r for r in rows if r[0] in urls], corpus.PAGES_SCHEMA
        )
        postings = build_postings(pages_g)
        dl = doc_lengths(pages_g)
        ts = term_stats(postings, gstats["n_docs"])
        gen_results.append(
            bm25_topk(queries, postings, dl, ts, gstats["avgdl"], k=10)
        )
    unioned = gen_results[0]
    for p in gen_results[1:]:
        unioned = unioned.unionByName(p)
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("url"))
    expected = (
        unioned.withColumn("grank", F.row_number().over(w))
        .filter(F.col("grank") <= 10)
        .select("query_id", F.col("grank").alias("rank"), "url", "score")
        .collect()
    )
    exp = {(r.query_id, r.rank): (r.url, round(r.score, 5)) for r in expected}
    gotk = {(r.query_id, r.rank): (r.url, round(r.score, 5)) for r in got}
    assert exp == gotk

    # Streaming serve path: query stream -> mailbox -> poll.
    qin = tmp_path / "qin"
    qin.mkdir()
    (qin / "stage").mkdir()
    qdf_rows = [("stream-q1", "It's not easy to let go.")]
    import pandas as pd

    pd.DataFrame(qdf_rows, columns=["query_id", "query_string"]).to_json(
        qin / "queries0.json", orient="records", lines=True
    )
    qstream = (
        spark.readStream.schema("query_id string, query_string string")
        .json(str(qin))
    )
    gen0 = list_generations(str(idx_dir))[0]
    mailbox = str(tmp_path / "mailbox")
    sq = serve_stream(qstream, gen0, mailbox, str(tmp_path / "qckpt"), k=10)
    try:
        sq.processAllAvailable()
    finally:
        sq.stop()
    polled = poll_result(spark, mailbox, "stream-q1").collect()
    assert len(polled) > 0
    assert [r.rank for r in polled] == list(range(1, len(polled) + 1))
    missing = poll_result(spark, mailbox, "no-such-query").collect()
    assert missing == []


def test_compaction_equals_batch_index(spark, tmp_path):
    """compact_generations merges N generations into one whose query
    results (incl. scores) are identical to a single batch-built index
    over the same docs — global idf/avgdl restored exactly."""
    from search_engine_spark.index.segments import build_segments, load_stats
    from search_engine_spark.query.wand import wand_topk
    from search_engine_spark.streaming.ingest import compact_generations

    rows = corpus.reference_pages_rows()
    out = tmp_path / "gens"

    def df(rs):
        return spark.createDataFrame(rs, corpus.PAGES_SCHEMA)

    build_segments(spark, df(rows[:60]), str(out / "gen=0"), n_buckets=2, run_id="g0")
    build_segments(spark, df(rows[60:]), str(out / "gen=1"), n_buckets=2, run_id="g1")
    assert len(list_generations(str(out))) == 2

    full = tmp_path / "full"
    build_segments(spark, df(rows), str(full), n_buckets=4, run_id="full")
    queries = corpus.reference_queries_df(spark)
    expected = wand_topk(spark, str(full), queries, k=10).collect()

    dest = compact_generations(spark, str(out), n_buckets=4)
    gens = list_generations(str(out))
    assert gens == [dest] and dest.endswith("gen=1.c1")
    cstats = load_stats(dest)
    fstats = load_stats(str(full))
    assert cstats["n_docs"] == fstats["n_docs"] == 100
    assert abs(cstats["avgdl"] - fstats["avgdl"]) < 1e-9

    got = query_generations(spark, str(out), queries, k=10).collect()
    exp = {(r.query_id, r.rank): (r.url, r.score) for r in expected}
    gotk = {(r.query_id, r.rank): (r.url, r.score) for r in got}
    assert exp == gotk  # exact equality, scores included


def test_global_stats_sidecar_equals_compaction_scores(spark, tmp_path):
    """merge_generation_stats + query_generations(global_stats=True)
    serve corpus-wide-consistent BM25 (idf over union df, global
    N/avgdl) score-equal to a compacted index — WITHOUT re-encoding a
    single posting (VERDICT r3 ask #7). Also proves per-generation
    stats really do diverge (the sidecar changes scores)."""
    from search_engine_spark.index.segments import build_segments
    from search_engine_spark.query.wand import wand_topk
    from search_engine_spark.streaming.ingest import (
        compact_generations,
        expire_generations,
        latest_global_stats,
        merge_generation_stats,
    )

    rows = corpus.reference_pages_rows()
    out = tmp_path / "gens"

    def df(rs):
        return spark.createDataFrame(rs, corpus.PAGES_SCHEMA)

    build_segments(spark, df(rows[:60]), str(out / "gen=0"), n_buckets=2, run_id="g0")
    build_segments(spark, df(rows[60:]), str(out / "gen=1"), n_buckets=2, run_id="g1")
    queries = corpus.reference_queries_df(spark)

    pergen = query_generations(spark, str(out), queries, k=10).collect()
    sidecar = merge_generation_stats(spark, str(out))
    assert sidecar is not None
    got_dir, covers = latest_global_stats(str(out))
    assert got_dir == sidecar and covers == {"gen=0", "gen=1"}
    union = query_generations(
        spark, str(out), queries, k=10, global_stats=True
    ).collect()

    # ground truth: compacted index (exact global stats, judged
    # score-identical to a batch build in test_compaction_equals_batch_index)
    dest = compact_generations(spark, str(out), n_buckets=4, expire=False)
    expected = wand_topk(spark, dest, queries, k=10).collect()

    key = lambda rows: {
        (r.query_id, r.rank): (r.url, r.score) for r in rows
    }
    exp, got = key(expected), key(union)
    assert exp.keys() == got.keys()
    for kk, (url, score) in exp.items():
        gurl, gscore = got[kk]
        assert gurl == url, (kk, url, gurl)
        # summation ORDER over query terms may differ (term upper
        # bounds use per-generation blockmeta); values are the same
        assert gscore == pytest.approx(score, rel=1e-12, abs=1e-12)
    # and the overlay is not a no-op: per-generation idf/avgdl diverge
    assert key(pergen) != got

    # expiry keeps only the newest sidecar; a second merge epoch +
    # expire removes the first
    sidecar2 = merge_generation_stats(spark, str(out))
    assert sidecar2 != sidecar
    removed = expire_generations(str(out))
    assert sidecar in removed and sidecar2 not in removed

    # writer-writer race guard: a merge temp dir with a NEWER epoch
    # than the latest complete sidecar may be an in-flight
    # merge_generation_stats from the live stream — expire must NOT
    # delete it; a superseded (older-epoch) temp is swept
    latest_epoch = int(Path(sidecar2).name.split("=", 1)[1])
    inflight = out / f".globalstats-{latest_epoch + 1}-tmp"
    stale = out / f".globalstats-{latest_epoch}-tmp"
    inflight.mkdir()
    stale.mkdir()
    expire_generations(str(out))
    assert inflight.exists(), "in-flight merge temp must survive expiry"
    assert not stale.exists(), "superseded merge temp must be swept"
    inflight.rmdir()


def test_preview_results(spark):
    """Result preview: first-5-lines display joined from the corpus
    (reference Display for QueryResult, src/lib.rs:229-268)."""
    from search_engine_spark.query.preview import get_document, preview_results

    pages = spark.createDataFrame(
        [("u1", "l1\nl2\nl3\nl4\nl5\nl6\nl7"), ("u2", "only line")],
        ["url", "text"],
    )
    results = spark.createDataFrame(
        [("q1", 1, "u1", 2.5), ("q1", 2, "u2", 1.5)],
        ["query_id", "rank", "url", "score"],
    )
    rows = preview_results(results, pages).collect()
    assert rows[0].preview == "l1\nl2\nl3\nl4\nl5"
    assert rows[1].preview == "only line"
    doc = get_document(pages, "u2").collect()
    assert len(doc) == 1 and doc[0].text == "only line"


def test_compaction_swap_is_atomic_for_readers(spark, tmp_path):
    """A reader polling list_generations/query_generations concurrently
    with compact_generations never observes zero or partial generations:
    the manifest flip is the single atomic visibility point, absorbed
    generations stay on disk until expire_generations (VERDICT r2 #5 /
    ADVICE: shrink the non-atomic swap window to nothing)."""
    import threading

    from search_engine_spark.index.segments import build_segments
    from search_engine_spark.streaming.ingest import (
        compact_generations,
        expire_generations,
    )

    rows = corpus.reference_pages_rows()
    out = tmp_path / "gens"

    def df(rs):
        return spark.createDataFrame(rs, corpus.PAGES_SCHEMA)

    build_segments(spark, df(rows[:40]), str(out / "gen=0"), n_buckets=2, run_id="g0")
    build_segments(spark, df(rows[40:80]), str(out / "gen=1"), n_buckets=2, run_id="g1")
    build_segments(spark, df(rows[80:]), str(out / "gen=2"), n_buckets=2, run_id="g2")

    observed: list[tuple] = []
    stop = threading.Event()

    def poller():
        while not stop.is_set():
            gens = list_generations(str(out))
            observed.append(tuple(Path(g).name for g in gens))

    t = threading.Thread(target=poller)
    t.start()
    try:
        dest = compact_generations(spark, str(out), n_buckets=4, expire=False)
    finally:
        stop.set()
        t.join()
    assert len(observed) > 50  # the poller really raced the swap
    old = ("gen=0", "gen=1", "gen=2")
    new = ("gen=2.c1",)
    assert set(observed) <= {old, new}, set(observed)
    assert observed[-1] == new

    # expire=False left every absorbed generation on disk for in-flight
    # readers; queries through the new manifest are already exact
    for name in old:
        assert (out / name / "stats.json").exists()
    queries = corpus.reference_queries_df(spark)
    got = query_generations(spark, str(out), queries, k=5).collect()
    assert len(got) > 0

    removed = expire_generations(str(out))
    assert {Path(r).name for r in removed} == set(old)
    assert list_generations(str(out)) == [dest]
    # idempotent; the active generation survives
    assert expire_generations(str(out)) == []
    assert (Path(dest) / "stats.json").exists()


def test_compaction_inherits_pfor_codec(spark, tmp_path):
    """Compacting a PFor index stays PFor (pfor=None inherits the
    newest generation's recorded layout) — the r2 hygiene finding that
    build_segments_from_postings silently re-encoded as varint."""
    from search_engine_spark.index.segments import build_segments
    from search_engine_spark.streaming.ingest import compact_generations

    rows = corpus.reference_pages_rows()
    out = tmp_path / "gens"

    def df(rs):
        return spark.createDataFrame(rs, corpus.PAGES_SCHEMA)

    build_segments(
        spark, df(rows[:50]), str(out / "gen=0"), n_buckets=2,
        run_id="g0", pfor=True,
    )
    build_segments(
        spark, df(rows[50:]), str(out / "gen=1"), n_buckets=2,
        run_id="g1", pfor=True,
    )
    dest = compact_generations(spark, str(out), n_buckets=2)
    layout = json.loads((Path(dest) / "layout.json").read_text())
    assert layout["pfor"] is True
    # and the compacted index actually contains PFor-flagged blocks
    from search_engine_spark.index.codec import BlockMeta

    metas = (
        spark.read.parquet(str(Path(dest) / "index"))
        .filter("kind = 1")
        .select("blockmeta")
        .collect()
    )
    assert any(
        BlockMeta(r.blockmeta).docid_codec.any()
        or BlockMeta(r.blockmeta).tf_codec.any()
        for r in metas
    )


def test_stateful_streaming_sessionization(spark, tmp_path):
    """applyInPandasWithState sessionization over a 3-micro-batch event
    stream equals the batch operator (q_event_sessions) on the same
    data, minus each user's final still-open session — state must carry
    open sessions across micro-batch boundaries."""
    from pyspark.sql import functions as F

    from search_engine_spark.api_pipeline import q_event_sessions
    from search_engine_spark.streaming.sessions import sessionize_stream

    sf = "/root/testdata/sf0.001"
    ev = (
        spark.read.parquet(f"{sf}/events.parquet")
        .select("event_id", "ts", "user_id", "value")
        .orderBy("ts", "event_id")
    )
    rows = ev.collect()
    in_dir = tmp_path / "ev"
    in_dir.mkdir()
    third = len(rows) // 3
    schema = "event_id long, ts timestamp_ntz, user_id long, value double"
    for i, chunk in enumerate(
        [rows[:third], rows[third : 2 * third], rows[2 * third :]]
    ):
        df = spark.createDataFrame(chunk, schema)
        df.coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / f"stage{i}")
        )
        part = next((tmp_path / f"stage{i}").glob("part-*.parquet"))
        part.rename(in_dir / f"batch{i}.parquet")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir))
    )
    q = (
        sessionize_stream(stream)
        .writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = {
        (r.user_id, r.session_id): r
        for r in spark.table("sessions_out").collect()
    }

    batch = q_event_sessions(spark, sf).collect()
    last_sid = {}
    for r in batch:
        last_sid[r.user_id] = max(last_sid.get(r.user_id, 0), r.session_id)
    want = {
        (r.user_id, r.session_id): r
        for r in batch
        if r.session_id != last_sid[r.user_id]
    }

    assert set(got) == set(want)
    assert len(want) > 50  # the corpus really exercises multi-session users
    import datetime as dt

    epoch = dt.datetime(1970, 1, 1)
    for k, w in want.items():
        g = got[k]
        assert g.n_events == w.n_events, k
        assert g.duration_us == w.duration_us, k
        start_us = int((w.session_start - epoch).total_seconds() * 1e6)
        assert abs(g.start_us - start_us) <= 1, k
        assert abs(g.sum_value - w.sum_value) < 1e-6, k


def test_idle_timeout_keeps_session_counter():
    """An idle-timeout flush must NOT reset the per-user session
    counter: a returning user continues at sid+1, so (user_id,
    session_id) keys never collide with previously closed sessions
    (ADVICE r3 #3). Driven directly through the sessionizer with a fake
    GroupState — the timeout branch is deterministic logic, not
    stream-timing behavior."""
    import pandas as pd

    from search_engine_spark.api_pipeline import SESSION_GAP_US
    from search_engine_spark.streaming.sessions import _make_sessionizer

    class FakeState:
        def __init__(self):
            self.exists = False
            self.hasTimedOut = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = tuple(v)
            self.exists = True

        def remove(self):
            self._v, self.exists = None, False

        def setTimeoutDuration(self, ms):
            pass

    fn = _make_sessionizer(idle_timeout_ms=1000)
    st = FakeState()

    def run(pdfs, timed_out=False):
        st.hasTimedOut = timed_out
        return pd.concat(list(fn((7,), pdfs, st)), ignore_index=True)

    ev = pd.DataFrame({"us": [0, 10], "event_id": [1, 2], "value": [1.0, 2.0]})
    out1 = run([ev])
    assert out1.empty and st._v[0] == 1  # open session, sid=1

    out2 = run([], timed_out=True)  # idle flush closes sid=1 ...
    assert list(out2.session_id) == [1]
    assert st.exists and st._v == (1, None, None, 0, 0.0)  # ... counter kept

    later = ev.assign(us=ev.us + 10 * SESSION_GAP_US)
    run([later])
    out3 = run([], timed_out=True)
    assert list(out3.session_id) == [2]  # returning user: sid=2, no reuse


def test_watermarked_window_agg_finalizes_and_drops_late(spark, tmp_path):
    """Watermarked streaming window agg: (1) append-mode rows equal the
    batch aggregate over the punctual events once the watermark passes
    every real window; (2) an event arriving later than the watermark
    allows is DROPPED from its already-finalized window (the batch
    recompute, which has no lateness notion, counts it)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from search_engine_spark.streaming.windows import (
        windowed_event_counts_stream,
    )

    sf = "/root/testdata/sf0.001"
    ev = (
        spark.read.parquet(f"{sf}/events.parquet")
        .select("event_id", "ts", "event_type", "value")
        .orderBy("ts", "event_id")
    )
    rows = ev.collect()
    third = len(rows) // 3
    chunks = [rows[:third], rows[third : 2 * third], rows[2 * third :]]
    max_ts = max(r.ts for r in rows)
    # a copy of the earliest event, replayed in the final micro-batch —
    # hours behind the watermark by then
    late_plant = rows[0]
    sentinel = type(rows[0])(
        event_id=10**9,
        ts=max_ts + dt.timedelta(hours=10),
        event_type="sentinel",
        value=0.0,
    )
    batches = [
        chunks[0],
        chunks[1],
        chunks[2] + [late_plant],
        [sentinel],
    ]
    schema = "event_id long, ts timestamp_ntz, event_type string, value double"
    in_dir = tmp_path / "ev"
    in_dir.mkdir()
    for i, chunk in enumerate(batches):
        df = spark.createDataFrame(chunk, schema)
        df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / f"s{i}"))
        part = next((tmp_path / f"s{i}").glob("part-*.parquet"))
        part.rename(in_dir / f"batch{i}.parquet")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir))
    )
    q = (
        windowed_event_counts_stream(stream, watermark="2 hours")
        .writeStream.format("memory")
        .queryName("win_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in spark.table("win_out").collect()
    }
    # batch truth over the PUNCTUAL events only (no late plant/sentinel)
    want = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in spark.createDataFrame(rows, schema)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.window("ts", "1 hour").getField("start").alias("window_start"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum("value") + F.lit(1e-9), 6).alias("sum_value"),
        )
        .collect()
    }
    assert got == want
    assert len(got) > 10
    # the late plant's window finalized WITHOUT it: a batch recompute
    # that includes the replayed event disagrees with the stream output
    late_key_ts = late_plant.ts.replace(minute=0, second=0, microsecond=0)
    late_key = (late_key_ts, late_plant.event_type)
    assert got[late_key][0] == want[late_key][0]
    with_plant = {
        (r.window_start, r.event_type): r.n_events
        for r in spark.createDataFrame(rows + [late_plant], schema)
        .groupBy(F.window("ts", "1 hour").getField("start").alias("window_start"), "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .collect()
    }
    assert with_plant[late_key] == got[late_key][0] + 1


def test_dedup_stream_first_seen_wins_across_microbatches(spark, tmp_path):
    """Streaming exact dedup: (1) survivors equal the batch gate's
    survivor set over an in-order replay, (2) a duplicate arriving in a
    LATER micro-batch is suppressed by cross-batch state."""
    from search_engine_spark.pipeline.dedup import exact_dups
    from search_engine_spark.streaming.dedup import dedup_stream

    texts = {
        0: "alpha beta gamma",
        1: "delta epsilon",
        2: "  ALPHA   beta GAMMA ",   # dup of 0 after normalization
        3: "zeta eta",
        4: "delta epsilon",            # dup of 1, later micro-batch
        5: "unique tail",
    }
    schema = "doc_id long, text string"
    rows = sorted(texts.items())
    in_dir = tmp_path / "docs"
    in_dir.mkdir()
    for i, chunk in enumerate([rows[:2], rows[2:4], rows[4:]]):
        df = spark.createDataFrame(chunk, schema)
        df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / f"s{i}"))
        part = next((tmp_path / f"s{i}").glob("part-*.parquet"))
        part.rename(in_dir / f"batch{i}.parquet")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir))
    )
    q = (
        dedup_stream(stream)
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {r.doc_id for r in spark.table("dedup_out").collect()}

    batch = exact_dups(spark.createDataFrame(rows, schema))
    survivors = {
        r.doc_id for r in batch.collect() if not r.is_duplicate
    }
    assert got == survivors == {0, 1, 3, 5}


def test_dedup_stream_within_watermark_bounds_state(spark, tmp_path):
    """dropDuplicatesWithinWatermark: a re-arrival inside the horizon
    is suppressed; one far beyond it is re-emitted (state was evicted)
    — the bounded-state trade stated in the module docstring."""
    from datetime import datetime

    from search_engine_spark.streaming.dedup import (
        dedup_stream_within_watermark,
    )

    schema = "doc_id long, text string, ts timestamp_ntz"
    t0 = datetime(2026, 1, 1, 0, 0, 0)

    def at(h):
        return datetime(2026, 1, 1, 0, 0, 0).replace(hour=h % 24, day=1 + h // 24)

    b0 = [(0, "same text", at(0)), (1, "other", at(0))]
    b1 = [(2, "same text", at(1))]        # 1h later: inside 2h horizon
    b2 = [(3, "advance", at(30))]         # push watermark far ahead
    # eviction lags one batch: the watermark from b2's data takes
    # effect in b3, whose END-of-batch eviction finally drops the
    # expired "same text" state — so the re-arrival goes in b4
    b3 = [(5, "advance two", at(30))]
    b4 = [(4, "same text", at(31))]       # re-arrival after eviction
    in_dir = tmp_path / "docs"
    in_dir.mkdir()
    for i, chunk in enumerate([b0, b1, b2, b3, b4]):
        df = spark.createDataFrame(chunk, schema)
        df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / f"s{i}"))
        part = next((tmp_path / f"s{i}").glob("part-*.parquet"))
        dst = in_dir / f"batch{i}.parquet"
        part.rename(dst)
        # FileStreamSource orders files by modification time; the
        # rename loop can land equal mtimes at fs timestamp
        # granularity, which would let batch4's re-arrival be picked
        # BEFORE batch3's eviction tick (ADVICE r4). Pin a strictly
        # increasing mtime per file so batch order is deterministic.
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir))
    )
    q = (
        dedup_stream_within_watermark(stream, watermark="2 hours")
        .writeStream.format("memory")
        .queryName("dedup_wm_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {r.doc_id for r in spark.table("dedup_wm_out").collect()}

    assert 0 in got and 1 in got and 3 in got and 5 in got
    assert 2 not in got, "in-horizon duplicate must be suppressed"
    assert 4 in got, "post-eviction re-arrival is re-emitted by design"
