#!/usr/bin/env python
"""spark-submit entrypoint: batch top-k BM25 serving over a segment index.

    spark-submit --py-files /tmp/search_engine_spark.zip \\
        scripts/query_index.py \\
        --index /data/index --queries queries.txt --k 10 \\
        [--out /data/results_parquet]

queries.txt: one free-text query per line (the reference's protocol,
/root/reference/queries.txt). Output: (query_id, rank, url, score) —
printed as JSON lines, or written to parquet with --out.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--queries", required=True)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--out")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("segment-index-query").getOrCreate()

    from search_engine_spark.query.wand import wand_topk

    with open(args.queries, encoding="utf-8") as fh:
        lines = [ln for ln in (line.rstrip("\n") for line in fh) if ln.strip()]
    queries = spark.createDataFrame(
        [(f"q{i + 1:04d}", q) for i, q in enumerate(lines)],
        ["query_id", "query_string"],
    )

    result = wand_topk(spark, args.index, queries, k=args.k)
    if args.out:
        result.write.mode("overwrite").parquet(args.out)
    else:
        for r in result.collect():
            print(json.dumps(
                {"query_id": r.query_id, "rank": r.rank,
                 "url": r.url, "score": r.score}
            ))
    spark.stop()


if __name__ == "__main__":
    main()
