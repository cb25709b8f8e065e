#!/usr/bin/env python
"""Benchmark driver for search_engine_spark.

Default mode: run every headline query from ``__spark_entry__.queries()``
against ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` (default 32) and print ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"<name>": sec, ...}, "sf": <sf>, ...extras}

Extras carried in the same JSON object (driver ignores unknown keys):
  - ``index``: docs/sec + postings/sec of a compressed-segment build over
    the sf corpus (the BASELINE.json headline metric is index-build
    throughput, so the bench measures it every round).

``--scaling`` mode: the north_rule two-cluster-size evidence. Runs the
*same* index-build job on the *same* synthetic input at two parallelism
levels (local[N] and local[4N], N from ``--base-cores``, default 8) in
one process (stop/recreate SparkContext) and prints one JSON line with
throughput at both plus efficiency = (thr_4N / thr_N) / 4.  Results are
copied into BASELINE.md by hand when re-measured.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def make_spark(cores: int, shuffle_partitions: int | None = None):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cores}]")
        .appName("search-engine-spark-bench")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )


def _sf_of(sf_dir: str) -> float:
    name = Path(sf_dir).name
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return -1.0


def bench_queries(spark, sf_dir: str) -> dict[str, float]:
    import __spark_entry__ as entrymod

    # Untimed warmup: pay JVM/codegen/Arrow first-run costs once, outside
    # the per-query timings (standard steady-state measurement).
    from search_engine_spark.corpus import load_table

    load_table(spark, sf_dir, "documents").count()
    entrymod.queries()["tfsum_topk"](spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name, fn in sorted(entrymod.queries().items()):
        t0 = time.monotonic()
        df = fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.monotonic() - t0, 3)
        print(f"# {name}: {timings[name]:.3f}s rows={n}", file=sys.stderr)
    return timings


def bench_index_build(spark, sf_dir: str, out_dir: str) -> dict:
    """Compressed-segment build over the sf documents corpus; returns
    wall-clock throughput (driver-side, includes all Spark overhead)."""
    import shutil

    from pyspark.sql import functions as F

    from search_engine_spark.corpus import load_table
    from search_engine_spark.index.segments import build_segments, read_metrics

    shutil.rmtree(out_dir, ignore_errors=True)
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("url"), "text"
    )
    t0 = time.monotonic()
    summary = build_segments(spark, docs, out_dir, n_buckets=32, run_id="bench")
    wall = time.monotonic() - t0
    m = (
        read_metrics(spark, out_dir)
        .agg(
            F.sum("input_docs").alias("docs"),
            F.sum("n_postings").alias("postings"),
            F.sum("segment_bytes").alias("bytes"),
        )
        .collect()[0]
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    return {
        "docs": int(m.docs),
        "postings": int(m.postings),
        "segment_bytes": int(m.bytes),
        "build_secs": round(wall, 3),
        "docs_per_sec": round(m.docs / wall, 1),
        "postings_per_sec": round(m.postings / wall, 1),
        "n_docs": summary["n_docs"],
    }


def run_default() -> dict:
    spark = make_spark(CPUS)
    try:
        timings = bench_queries(spark, SF_DIR)
        index = bench_index_build(spark, SF_DIR, "/tmp/bench-segidx")
        total = round(sum(timings.values()), 3)
        return {
            "metric": "headline query wall time (sum) at sf; index-build throughput in `index`",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": _sf_of(SF_DIR),
            "cores": CPUS,
            "index": index,
        }
    finally:
        spark.stop()


def _scaling_build(cores: int, n_pages: int, seed: int) -> dict:
    """One index-build run at a given core count over the deterministic
    synthetic Zipfian corpus (pure function of seed — identical input at
    any parallelism)."""
    import shutil

    from search_engine_spark.corpus import synth_pages
    from search_engine_spark.index.segments import build_segments

    out_dir = f"/tmp/scaling-segidx-{cores}"
    shutil.rmtree(out_dir, ignore_errors=True)
    spark = make_spark(cores, shuffle_partitions=max(cores * 2, 64))
    try:
        pages = synth_pages(spark, n_pages, seed=seed, partitions=max(cores * 2, 64))
        pages = pages.persist()
        pages.count()  # materialize input so we time the build, not the generator
        t0 = time.monotonic()
        build_segments(spark, pages, out_dir, n_buckets=max(cores * 2, 64), run_id=f"scale-{cores}")
        wall = time.monotonic() - t0
    finally:
        spark.stop()
        shutil.rmtree(out_dir, ignore_errors=True)
    return {"cores": cores, "build_secs": round(wall, 3),
            "docs_per_sec": round(n_pages / wall, 1)}


def run_scaling(base_cores: int, n_pages: int, seed: int = 42) -> dict:
    lo = _scaling_build(base_cores, n_pages, seed)
    hi = _scaling_build(base_cores * 4, n_pages, seed)
    eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / 4.0
    return {
        "metric": "index-build scaling efficiency N->4N cores",
        "value": round(eff, 3),
        "unit": "efficiency",
        "n_pages": n_pages,
        "low": lo,
        "high": hi,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--base-cores", type=int, default=8)
    ap.add_argument("--pages", type=int, default=40_000)
    args = ap.parse_args()
    result = (
        run_scaling(args.base_cores, args.pages) if args.scaling else run_default()
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
