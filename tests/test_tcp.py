"""Wire-protocol test for the TCP submit/poll front-end (SURVEY §2
S3/S4; reference ``src/server.rs`` + client loop ``src/bin/test.rs``)."""

from __future__ import annotations

import time

from search_engine_spark import corpus
from search_engine_spark.index.segments import build_segments
from search_engine_spark.streaming.tcp import (
    NOT_READY,
    TcpServingFrontend,
    poll_query,
    submit_query,
)


def test_tcp_submit_poll_roundtrip(spark, tmp_path):
    pages = corpus.reference_pages(spark)
    idx = str(tmp_path / "idx")
    build_segments(spark, pages, idx, n_buckets=2, run_id="tcp")

    fe = TcpServingFrontend(spark, idx, k=5)
    try:
        submit_port, poll_port = fe.start()

        # unknown id -> the EXACT retry sentinel + placeholder documents
        miss = poll_query("127.0.0.1", poll_port, "no-such-id")
        assert miss["message"] == NOT_READY
        assert miss["documents"] == [["", 0]]
        assert miss["query_processing_time"] == {"secs": 0, "nanos": 0}

        # submit two in-vocabulary queries and one all-OOV query
        queries = [
            "standard american breakfast",
            "two snakes wrapped around a staff from greek mythology",
            "zzqqxunheardofterm",
        ]
        qids = []
        for q in queries:
            resp = submit_query("127.0.0.1", submit_port, q)
            assert resp["message"] == f"Query received: {q}"
            assert len(resp["query_id"]) == 36  # uuid4
            qids.append(resp["query_id"])

        # reference client loop: poll until the sentinel goes away
        results = {}
        deadline = time.monotonic() + 120
        for qid in qids:
            while True:
                r = poll_query("127.0.0.1", poll_port, qid)
                if r["message"] != NOT_READY:
                    results[qid] = r
                    break
                assert time.monotonic() < deadline, "poll timed out"
                time.sleep(0.2)

        for qid, q in zip(qids[:2], queries[:2]):
            docs = results[qid]["documents"]
            assert 1 <= len(docs) <= 5
            # [url, i32 millipoints], rank order = descending score
            assert all(isinstance(u, str) and isinstance(s, int)
                       for u, s in docs)
            scores = [s for _, s in docs]
            assert scores == sorted(scores, reverse=True)
            d = results[qid]["query_processing_time"]
            assert d["secs"] >= 0 and 0 <= d["nanos"] < 1_000_000_000
        # the OOV query completes with an EMPTY result (not the sentinel)
        assert results[qids[2]]["documents"] == []
    finally:
        fe.stop()
