#!/usr/bin/env python
"""Serve a prebuilt segment index over the reference's TCP protocol.

    python scripts/serve_tcp.py --index /path/to/index

binds the submit server on :8080 and the poll server on :8081 — the
reference's own ports (``src/server.rs:34,64``), so its test client
(``src/bin/test.rs``) can point at this engine unchanged. Ctrl-C stops.
"""

from __future__ import annotations

import argparse
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--submit-port", type=int, default=8080)
    ap.add_argument("--poll-port", type=int, default=8081)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[*]")
        .appName("search-engine-spark-tcp")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from search_engine_spark.streaming.tcp import TcpServingFrontend

    fe = TcpServingFrontend(
        spark, args.index, k=args.k,
        submit_port=args.submit_port, poll_port=args.poll_port,
    )
    sp, pp = fe.start()
    print(f"submit on :{sp}  poll on :{pp}  (Ctrl-C to stop)")
    try:
        while True:
            time.sleep(1)
    except KeyboardInterrupt:
        fe.stop()
        spark.stop()


if __name__ == "__main__":
    main()
