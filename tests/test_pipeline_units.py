"""Unit tests for the pipeline kernels: cross-engine hash parity, shingle
edge cases, LSH recall sanity, multimodal stub behavior."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from search_engine_spark.pipeline import embeddings as emb
from search_engine_spark.pipeline import multimodal
from search_engine_spark.pipeline.common import (
    hash60_col,
    shingles_col,
    sql_hash60,
    sql_shingles,
    sql_words,
    words_col,
)


def test_hash60_parity(spark):
    """Spark conv(md5[:15],16,10) == DuckDB ('0x'||md5[:15])::BIGINT."""
    samples = ["", "a", "abc", "the quick brown fox", "0|w1 w2 w3", "ünïcødé"]
    sdf = spark.createDataFrame([(s,) for s in samples], ["s"]).select(
        "s", hash60_col(F.col("s")).alias("h")
    )
    got = {r.s: r.h for r in sdf.collect()}
    con = duckdb.connect()
    for s in samples:
        (exp,) = con.execute(
            f"SELECT {sql_hash60('?')}", [s]
        ).fetchone()
        assert got[s] == exp, s


def test_shingles_parity_and_short_docs(spark):
    texts = [
        "a b c d e",
        "one two",        # < 3 words -> no shingles
        "x",              # single word
        "",               # empty
        "p q r",          # exactly one shingle
        "t t t t",        # duplicate shingles deduped
    ]
    sdf = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["i", "text"])
    got = {
        r.i: sorted(r.sh)
        for r in sdf.select("i", shingles_col(words_col("text")).alias("sh")).collect()
    }
    con = duckdb.connect()
    for i, t in enumerate(texts):
        (exp,) = con.execute(
            f"SELECT {sql_shingles('w')} FROM (SELECT {sql_words('?')} AS w)", [t]
        ).fetchone()
        assert got[i] == sorted(exp), f"text={t!r}"
    assert got[1] == [] and got[2] == [] and got[3] == []
    assert got[4] == ["p q r"]
    assert got[5] == ["t t t"]


def test_hyperplanes_deterministic():
    assert len(emb.HYPERPLANES) == emb.LSH_PLANES
    assert all(len(p) == emb.EMB_DIM for p in emb.HYPERPLANES)
    assert all(s in (-1, 1) for p in emb.HYPERPLANES for s in p)
    # frozen spot-checks: regenerating must not drift
    assert emb.HYPERPLANES[0][:4] == [emb._plane_sign(0, d) for d in range(4)]


def test_lsh_recall_reasonable(spark):
    """LSH ANN must be a subset-ish of brute force with nontrivial recall
    (same corpus, same k). Not rank-identical by design."""
    sf = "/root/testdata/sf0.001"
    brute = {
        (r.query_id, r.vec_id)
        for r in emb.ann_brute_topk(
            spark.read.parquet(f"{sf}/embeddings.parquet")
        ).collect()
    }
    lsh = {
        (r.query_id, r.vec_id)
        for r in emb.ann_lsh_topk(
            spark.read.parquet(f"{sf}/embeddings.parquet")
        ).collect()
    }
    recall = len(brute & lsh) / len(brute)
    assert recall > 0.2, f"LSH recall collapsed: {recall:.2f}"


def test_multimodal_stub_raises():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x00")
    with pytest.raises(NotImplementedError):
        multimodal.decode_audio(b"\x00")


def test_video_frames_shape(spark):
    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    media = multimodal.media_from_documents(docs)
    frames = multimodal.sample_frames(media)
    pdf = frames.toPandas()
    # only video docs (doc_id % 3 == 2), 1..7 frames each, hashes unique
    assert set(pdf.media_id % 3) == {2}
    per = pdf.groupby("media_id").frame_idx.agg(["min", "max", "count"])
    assert (per["min"] == 0).all()
    assert (per["count"] == per["max"] + 1).all()
    assert per["count"].between(1, 7).all()
    assert pdf.frame_hash.is_unique


def test_cosine_neardup_lsh_subset_and_recall(spark):
    """Banded near-dup pairs must be a subset of the exact all-pairs
    result (same threshold, exact cosines), and recall on PLANTED true
    near-duplicates (cosine ~0.999) must be high. The 16-bit bands are
    deliberately selective: mid-similarity pairs (cosine ~0.3-0.5) are
    mostly not candidates — that tail is the all-pairs oracle's job, the
    LSH gate's design point is genuine near-dups."""
    import numpy as np

    rng = np.random.RandomState(7)
    rows = []
    for i in range(200):  # background: random directions, cosine ~ 0
        rows.append((i, [float(x) for x in rng.randn(emb.EMB_DIM)]))
    planted = []
    for p in range(20):  # planted true near-dups: v and v + 1% noise
        v = rng.randn(emb.EMB_DIM)
        w = v + 0.01 * rng.randn(emb.EMB_DIM)
        a, b = 1000 + 2 * p, 1001 + 2 * p
        rows += [(a, [float(x) for x in v]), (b, [float(x) for x in w])]
        planted.append((a, b))
    embs = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )
    brute = {
        (r.vec_id_a, r.vec_id_b): r.cosine
        for r in emb.cosine_neardup_pairs(embs).collect()
    }
    lsh = {
        (r.vec_id_a, r.vec_id_b): r.cosine
        for r in emb.cosine_neardup_lsh_pairs(embs).collect()
    }
    assert set(lsh) <= set(brute)
    for k, v in lsh.items():
        assert v == brute[k], k  # exact cosine re-check, not an estimate
    found = sum(1 for p in planted if p in lsh)
    assert found >= 18, f"planted near-dup recall collapsed: {found}/20"


def test_cosine_neardup_hot_band_cap_bounds_skew(spark):
    """NEARDUP_BAND_CAP + 20 identical vectors share every band key —
    the cap must drop those keys before the self-join (no quadratic
    clone-cluster blow-up; clone clusters are exact dedup's job), while
    a genuine near-dup pair on cold bands is still found."""
    import numpy as np

    rng = np.random.RandomState(11)
    n_hot = emb.NEARDUP_BAND_CAP + 20
    clone = [float(x) for x in rng.randn(emb.EMB_DIM)]
    rows = [(i, clone) for i in range(n_hot)]
    v = rng.randn(emb.EMB_DIM)
    w = v + 0.01 * rng.randn(emb.EMB_DIM)
    rows += [
        (n_hot, [float(x) for x in v]),
        (n_hot + 1, [float(x) for x in w]),
    ]
    embs = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )
    got = {
        (r.vec_id_a, r.vec_id_b)
        for r in emb.cosine_neardup_lsh_pairs(embs).collect()
    }
    assert got == {(n_hot, n_hot + 1)}, sorted(got)[:5]


def test_simhash_wide_bands_survive_cap(spark):
    """Planted corpus where EVERY 8-bit band value is hot (>BAND_CAP):
    narrow 8-bit banding caps away all candidates (recall silently -> 0,
    the r3 scale bug), while the shipped 15-bit bands still find the
    planted hd=1 near-dup because its wide band values stay cold."""
    import random

    from search_engine_spark.pipeline import dedup

    rnd = random.Random(13)
    sig_a = rnd.getrandbits(60)
    sig_b = sig_a ^ 1  # hamming distance 1
    low32 = sig_a & 0xFFFFFFFF
    rows = [(1000, sig_a), (1001, sig_b)]
    # background shares sig_a's low 32 bits (so all four 8-bit band
    # values are shared by 150+ docs) but has random high bits
    for i in range(dedup.BAND_CAP + 50):
        rows.append((i, (rnd.getrandbits(28) << 32) | low32))
    sig = spark.createDataFrame(rows, "doc_id long, simhash long")

    narrow = dedup.banded_hamming_pairs(sig, bits=32, n_bands=4).collect()
    assert narrow == [], narrow[:5]  # the 8-bit cap cliff: zero recall

    wide = {
        (r.doc_id_a, r.doc_id_b, r.hamming)
        for r in dedup.banded_hamming_pairs(sig).collect()
    }
    assert (1000, 1001, 1) in wide, sorted(wide)[:5]


def test_fingerprints_plan_is_shuffle_free(spark):
    """Winnowing is per-document array math — the physical plan must
    contain no Exchange (the old posexplode+window version shuffled the
    whole corpus)."""
    from search_engine_spark.pipeline import textstats

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    plan = textstats.fingerprints(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_pipeline_tokenizer_ascii_contract(spark):
    """The pipeline word tokenizer (common.words_col) is PINNED to ASCII
    \\w semantics: Spark-Java \\w and DuckDB-RE2 \\w agree with each
    other (the oracle contract), and both diverge from the engine's
    Unicode-aware tokenizers in functions/tokenize.py on non-ASCII.
    This test freezes that decision — if words_col ever goes (?U), the
    oracle SQL must change in lockstep."""
    s = "héllo wörld it's 123_x"
    got = (
        spark.createDataFrame([(s,)], ["text"])
        .select(words_col("text").alias("w"))
        .collect()[0]
        .w
    )
    con = duckdb.connect()
    (exp,) = con.execute(f"SELECT {sql_words('?')}", [s]).fetchone()
    assert got == exp
    # ASCII \w splits at accented letters — the pinned (non-Unicode) behavior
    assert got == ["h", "llo", "w", "rld", "it", "s", "123_x"]


def test_lsh_hot_band_cap_bounds_skew(spark):
    """A synthetic hot band — BAND_CAP+20 identical docs sharing every
    band key — must NOT produce a quadratic candidate blow-up: the cap
    drops the hot band keys before the self-join, while a genuine
    near-dup pair on cold bands survives."""
    from search_engine_spark.pipeline import dedup

    n_hot = dedup.BAND_CAP + 20
    boiler = "the quick brown fox jumps over the lazy dog again and again"
    near_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near_b = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda"
    rows = [(i, boiler) for i in range(n_hot)]
    rows += [(n_hot, near_a), (n_hot + 1, near_b)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    mh = dedup.minhash_pairs(docs).collect()
    ids = {r.doc_id_a for r in mh} | {r.doc_id_b for r in mh}
    # no pair from the hot cluster (its n^2/2 = 7k+ pairs are cut)...
    assert not any(i < n_hot for i in ids), sorted(ids)[:5]
    # ...but the cold near-dup pair is still found
    assert {(r.doc_id_a, r.doc_id_b) for r in mh} == {(n_hot, n_hot + 1)}

    sh = dedup.simhash_pairs(docs).collect()
    assert not any(
        r.doc_id_a < n_hot or r.doc_id_b < n_hot for r in sh
    ), sh[:5]


def test_dedup_groups_transitive_closure(spark):
    """dedup_groups merges A-B and B-C into ONE component even when the
    A-C pair itself never surfaces as an LSH candidate — transitivity is
    what pairs alone can't give a curation pipeline. Also checks the
    canonical group_id (min doc_id), group sizes, and that unrelated
    docs stay out."""
    from search_engine_spark.pipeline import dedup

    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    words = base.split()
    chain_a = " ".join(words)                      # doc 10
    chain_b = " ".join(words[:-1] + ["phi"])       # doc 11: 1 word off a
    chain_c = " ".join(["psi"] + words[1:-1] + ["phi"])  # doc 12: off b
    other = "completely different text about rivers mountains and towns"
    rows = [
        (10, chain_a),
        (11, chain_b),
        (12, chain_c),
        (13, other),
        (14, other + " indeed"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = {
        (r.doc_id_a, r.doc_id_b)
        for r in dedup.minhash_pairs(docs)
        .filter(F.col("est_jaccard") >= dedup.GROUP_MIN_JACCARD)
        .collect()
    }
    got = {
        r.doc_id: (r.group_id, r.group_size)
        for r in dedup.dedup_groups(docs).collect()
    }
    # the chain component exists and is fully merged under min doc_id
    assert got[10] == (10, 3) and got[11] == (10, 3) and got[12] == (10, 3)
    # transitivity did real work unless LSH happened to emit a-c too
    if (10, 12) not in pairs:
        assert {(10, 11), (11, 12)} <= pairs
    # docs 13/14 either form their own 2-component or are absent —
    # never merged into the chain
    if 13 in got:
        assert got[13][0] in (13,) and got[13][1] == 2
    assert all(v[0] != 10 for k, v in got.items() if k in (13, 14))


def test_ivf_assignment_plan_is_shuffle_free(spark):
    """IVF cell assignment is ONE narrow Arrow pass against the
    closure-captured centroid matrix — the physical plan must contain no
    Exchange (the round-2 version cross-joined 16 centroids then
    windowed over 16N embedding-bearing rows)."""
    sf = "/root/testdata/sf0.001"
    embs = spark.read.parquet(f"{sf}/embeddings.parquet")
    n = emb._vectors(embs)
    cents = emb._collect_centroids(n)
    assigned = emb._assign_cells(n, cents)
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    # and ties break to the lower cell_id: centroids are their own
    # nearest centroid (cosine 1.0 with themselves, first occurrence wins)
    own = {
        r.vec_id: r.cell_id
        for r in assigned.filter(F.col("vec_id") < emb.IVF_CELLS).collect()
    }
    assert own == {cid: cid for cid, _, _ in cents}


def test_ivf_recall_reasonable(spark):
    """IVF ANN (probe 4/16 cells, exact re-rank) must overlap brute
    force meaningfully — determinism is gated by the oracle; this checks
    the recall isn't degenerate."""
    sf = "/root/testdata/sf0.001"
    embs = spark.read.parquet(f"{sf}/embeddings.parquet")
    brute = {
        (r.query_id, r.vec_id) for r in emb.ann_brute_topk(embs).collect()
    }
    ivf = {
        (r.query_id, r.vec_id) for r in emb.ann_ivf_topk(embs).collect()
    }
    recall = len(brute & ivf) / len(brute)
    assert recall > 0.2, f"IVF recall collapsed: {recall:.2f}"


def test_band_bucketed_layout_prunes_and_matches(spark, tmp_path):
    """Write-time band bucketing (Iceberg bucket(B, band_val) on plain
    parquet): the candidate scan must carry PartitionFilters — partition
    pruning, not a full read — and the served top-k must be identical to
    the unbucketed ann_lsh_topk."""
    sf = "/root/testdata/sf0.001"
    embs = spark.read.parquet(f"{sf}/embeddings.parquet")
    path = str(tmp_path / "band_bucketed")
    emb.write_band_bucketed(embs, path)

    out = emb.ann_lsh_topk_bucketed(spark, path)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the corpus-side scan prunes on both partition columns
    assert "PartitionFilters" in plan, plan
    assert "band_bucket" in plan.split("PartitionFilters", 2)[-1][:400], plan

    got = sorted(map(tuple, out.collect()))
    want = sorted(map(tuple, emb.ann_lsh_topk(embs).collect()))
    assert got == want


def test_cell_partitioned_layout_prunes_and_matches(spark, tmp_path):
    """IVF identity-partitioned layout: the probe join reads only the
    probed cells (PartitionFilters on cell_id) and serves the identical
    top-k as ann_ivf_topk."""
    sf = "/root/testdata/sf0.001"
    embs = spark.read.parquet(f"{sf}/embeddings.parquet")
    path = str(tmp_path / "cell_partitioned")
    emb.write_cell_partitioned(embs, path)

    out = emb.ann_ivf_topk_partitioned(spark, path)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan, plan
    assert "cell_id" in plan.split("PartitionFilters", 2)[-1][:400], plan

    got = sorted(map(tuple, out.collect()))
    want = sorted(map(tuple, emb.ann_ivf_topk(embs).collect()))
    assert got == want


def test_event_sessions_single_exchange(spark):
    """Sessionization (lag -> running sum -> groupBy) shares the user_id
    hash partitioning end to end: exactly ONE Exchange in the physical
    plan, and sessions are consistent (no overlaps, gap rule honored)."""
    from search_engine_spark.api_pipeline import SESSION_GAP_US, q_event_sessions

    sf = "/root/testdata/sf0.001"
    out = q_event_sessions(spark, sf)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan

    rows = out.collect()
    assert rows
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for user, sess in by_user.items():
        sess.sort(key=lambda r: r.session_id)
        assert [s.session_id for s in sess] == list(range(1, len(sess) + 1))
        for a, b in zip(sess, sess[1:]):
            # consecutive sessions are separated by more than the gap
            gap_us = (b.session_start - a.session_end).total_seconds() * 1e6
            assert gap_us > SESSION_GAP_US, (user, a.session_id)
        for s in sess:
            assert s.duration_us >= 0 and s.n_events >= 1


def test_dataset_splits_deterministic_and_shuffle_free(spark):
    """Hash splits: zero-Exchange plan, stable across runs, ratios in
    the right ballpark, and salt-decorrelated from raw hash60(doc_id)."""
    from search_engine_spark.pipeline import curation

    sf = "/root/testdata/sf0.01"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    out = curation.dataset_splits(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    a = {r.doc_id: r.split for r in out.collect()}
    b = {r.doc_id: r.split for r in curation.dataset_splits(docs).collect()}
    assert a == b and len(a) == 500
    frac_train = sum(v == "train" for v in a.values()) / len(a)
    assert 0.8 < frac_train < 0.97


def test_contamination_finds_planted_overlap(spark):
    """A training doc sharing a long passage with an eval doc must be
    flagged; disjoint docs must not."""
    from search_engine_spark.pipeline import curation

    passage = ("the quick brown fox jumps over the lazy dog while the "
               "rain in spain stays mainly on the plain tonight")
    rows = [
        (0, f"EVAL {passage} end of benchmark text"),          # eval (0 % 50 == 0)
        (1, f"training copy {passage} with extra words"),      # contaminated
        (2, "completely unrelated content about databases and "
            "distributed execution engines with columnar files"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r.n_shared_grams for r in curation.contamination(docs).collect()}
    assert 1 in got and got[1] >= curation.CONTAM_MIN_SHARED
    assert 2 not in got
    assert 0 not in got  # eval docs excluded from the output


def test_sq_recall_reasonable(spark):
    """Scalar-quantized ANN (uint8 codes + oversampled exact re-rank)
    must recover most of the brute-force top-k — 8-bit quantization of
    64-dim vectors loses little ranking signal."""
    sf = "/root/testdata/sf0.001"
    embs = spark.read.parquet(f"{sf}/embeddings.parquet")
    brute = {
        (r.query_id, r.vec_id) for r in emb.ann_brute_topk(embs).collect()
    }
    sq = {(r.query_id, r.vec_id) for r in emb.ann_sq_topk(embs).collect()}
    recall = len(brute & sq) / len(brute)
    assert recall > 0.8, f"SQ recall collapsed: {recall:.2f}"


def test_pq_recall_reasonable(spark):
    """Product-quantized ANN (4-bit subspace codes, 128x compression)
    must recover a solid share of the brute-force top-k via the
    oversampled exact re-rank; PQ is lossier than SQ by design, so the
    floor sits lower."""
    sf = "/root/testdata/sf0.001"
    embs = spark.read.parquet(f"{sf}/embeddings.parquet")
    brute = {
        (r.query_id, r.vec_id) for r in emb.ann_brute_topk(embs).collect()
    }
    pq = {(r.query_id, r.vec_id) for r in emb.ann_pq_topk(embs).collect()}
    recall = len(brute & pq) / len(brute)
    assert recall > 0.4, f"PQ recall collapsed: {recall:.2f}"


def test_ivfpq_recall_and_pruning(spark):
    """IVFxPQ recall stays useful, and the candidate set respects the
    probed-cell restriction (every returned neighbor's cell is one of
    its query's probed cells)."""
    sf = "/root/testdata/sf0.001"
    embs = spark.read.parquet(f"{sf}/embeddings.parquet")
    brute = {
        (r.query_id, r.vec_id) for r in emb.ann_brute_topk(embs).collect()
    }
    got = emb.ann_ivfpq_topk(embs).collect()
    pairs = {(r.query_id, r.vec_id) for r in got}
    recall = len(brute & pairs) / len(brute)
    assert recall > 0.4, f"IVFxPQ recall collapsed: {recall:.2f}"

    n = emb._vectors(embs)
    cents = emb._collect_centroids(n)
    cell_of = {
        r.vec_id: r.cell_id
        for r in emb._assign_cells(n, cents).select("vec_id", "cell_id").collect()
    }
    queries = [(c, v, m) for c, v, m in cents if c < emb.N_QUERIES]
    probed = {}
    for qid, _, _, cid in emb._probe_cells_local(queries, cents):
        probed.setdefault(qid, set()).add(cid)
    for r in got:
        assert cell_of[r.vec_id] in probed[r.query_id], (
            r.query_id, r.vec_id, cell_of[r.vec_id], probed[r.query_id]
        )


def test_repetition_stats_planted_values(spark):
    """Gopher repetition signals on hand-computable corpora, mirrored
    against the DuckDB oracle."""
    from search_engine_spark.api_pipeline import q_repetition_stats
    from search_engine_spark.pipeline import textstats

    texts = {
        0: "a b c d e f",        # all distinct: every frac 0
        1: "a a a a a a",        # total repetition
        2: "x y x y x y x y",    # alternating: "x y"/"y x" dominate
        3: "one two",            # exactly one 2-gram, no 3-grams
        4: "solo",               # 1 word -> absent from output
        5: "",                   # empty -> absent
    }
    sdf = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], ["doc_id", "text"]
    )
    got = {r.doc_id: r.asDict() for r in textstats.repetition_stats(sdf).collect()}

    assert set(got) == {0, 1, 2, 3}  # 4 and 5 have no 2-grams
    assert got[0]["n_2grams"] == 5
    assert got[0]["top_2gram_frac"] == 0.2
    assert got[0]["dup_2gram_frac"] == 0.0
    assert got[0]["dup_3gram_frac"] == 0.0
    assert got[0]["dup_5gram_frac"] == 0.0
    # "a a ...": 5 identical 2-grams, 4 identical 3-grams, 2 identical 5-grams
    assert got[1]["top_2gram_frac"] == 1.0
    assert got[1]["dup_2gram_frac"] == 0.8  # 1 - 1/5
    assert got[1]["dup_3gram_frac"] == 0.75
    assert got[1]["dup_5gram_frac"] == 0.5
    # alternating: 7 2-grams, top ("x y") appears 4 times
    assert got[2]["n_2grams"] == 7
    assert got[2]["top_2gram_frac"] == round(4 / 7 + 1e-9, 6)
    assert got[2]["dup_2gram_frac"] == round(1 - 2 / 7 + 1e-9, 6)
    assert got[3] == {
        "doc_id": 3,
        "n_2grams": 1,
        "top_2gram_frac": 1.0,
        "dup_2gram_frac": 0.0,
        "dup_3gram_frac": 0.0,
        "dup_5gram_frac": 0.0,
    }

    # oracle parity on the same corpus
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)", list(texts.items())
    )
    odf = con.execute(textstats.SQL_REPETITION_STATS).fetch_df()
    exp = {int(r["doc_id"]): {k: r[k] for k in got[0]} for _, r in odf.iterrows()}
    for i in got:
        for k, v in got[i].items():
            assert exp[i][k] == v, (i, k, v, exp[i][k])


def test_repetition_stats_two_exchanges_only(spark):
    """The mode computation is the only shuffle work: exactly two
    Exchanges (explode->groupBy(doc,gram)->groupBy(doc)); the 3/5-gram
    fractions ride along as array arithmetic without extra shuffles or
    a join back."""
    from search_engine_spark.pipeline import textstats

    sdf = spark.createDataFrame([(0, "a b c")], ["doc_id", "text"])
    plan = (
        textstats.repetition_stats(sdf)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 2, plan
    assert "Join" not in plan, plan


# --- corpus_stats: unigram LM score, TF-IDF keywords, source rollup -------


def _planted_docs(spark):
    rows = [
        (1, "a a b", "en", "web"),
        (2, "b c", "en", "web"),
        (3, "", "de", "books"),
        (4, "a c c c", "fr", "books"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])


def test_lm_score_planted_values(spark):
    """Hand-computed unigram cross-entropy on a 4-doc corpus; the empty
    document scores (0, 0.0) instead of disappearing."""
    import math

    from search_engine_spark.pipeline import corpus_stats

    got = {
        r.doc_id: (r.n_tokens, r.bits_per_token)
        for r in corpus_stats.lm_score(_planted_docs(spark)).collect()
    }
    # corpus counts: a=3, b=2, c=4, total=9
    cnt, total = {"a": 3, "b": 2, "c": 4}, 9.0

    def bits(toks):
        s = -sum(math.log2(cnt[t] / total) for t in toks)
        return round(s / len(toks) + 1e-9, 6)

    assert got[1] == (3, bits(["a", "a", "b"]))
    assert got[2] == (2, bits(["b", "c"]))
    assert got[3] == (0, 0.0)
    assert got[4] == (4, bits(["a", "c", "c", "c"]))


def test_tfidf_keywords_rank_and_tiebreak(spark):
    """Rank = tfidf DESC then term ASC; the cut keeps <= k rows per doc."""
    import math

    from search_engine_spark.pipeline import corpus_stats

    out = corpus_stats.tfidf_keywords(_planted_docs(spark), k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.rank, r.term, r.tfidf))
    for rs in by_doc.values():
        rs.sort()
        assert [r[0] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 2
        keyed = [(-r[2], r[1]) for r in rs]
        assert keyed == sorted(keyed)
    # doc 1: tf(a)=2 df(a)=2 -> 2*ln(5/3); tf(b)=1 df(b)=2 -> ln(5/3)
    idf = math.log(5.0 / 3.0)
    assert by_doc[1][0][1] == "a"
    assert by_doc[1][0][2] == round(2 * idf + 1e-9, 6)
    assert by_doc[1][1][1] == "b"
    assert 3 not in by_doc  # empty doc has no keywords


def test_source_stats_planted(spark):
    from search_engine_spark.pipeline import corpus_stats

    got = {
        r.source: (r.n_docs, r.total_tokens, r.avg_chars, r.n_langs)
        for r in corpus_stats.source_stats(_planted_docs(spark)).collect()
    }
    assert got["web"] == (2, 5, round((5 + 3) / 2 + 1e-9, 6), 1)
    assert got["books"] == (2, 4, round((0 + 7) / 2 + 1e-9, 6), 2)


def test_corpus_stats_no_global_window(spark):
    """Scalar totals come from broadcast 1-row aggregates, never a
    partitionless window (which would single-task the vocabulary):
    lm_score's plan has no Window at all, and tfidf's only Window is
    partitioned by doc_id."""
    from search_engine_spark.pipeline import corpus_stats

    docs = _planted_docs(spark)
    plan_lm = (
        corpus_stats.lm_score(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan_lm, plan_lm
    plan_tf = (
        corpus_stats.tfidf_keywords(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for line in plan_tf.splitlines():
        if "Window [" in line or line.strip().startswith("Window "):
            assert "doc_id" in line, line


def test_connected_components_local_vs_distributed(spark, monkeypatch):
    """The driver union-find fast path and the distributed label
    propagation produce identical labels on the same graph."""
    from search_engine_spark.pipeline import dedup

    # two chains and a triangle, out-of-order ids
    edges = [(5, 9), (9, 2), (30, 31), (7, 8), (8, 6), (6, 7)]
    edf = spark.createDataFrame(edges, ["a", "b"])
    local = sorted(map(tuple, dedup.connected_components(edf).collect()))
    monkeypatch.setattr(dedup, "CC_LOCAL_EDGE_THRESHOLD", 0)
    dist = sorted(map(tuple, dedup.connected_components(edf).collect()))
    assert local == dist
    assert local == [
        (2, 2), (5, 2), (6, 6), (7, 6), (8, 6), (9, 2), (30, 30), (31, 30),
    ]


def test_reliable_checkpoint_dir_parity(spark, monkeypatch, tmp_path):
    """checkpoint_dir (reliable checkpoint; VERDICT r4 #6) produces
    byte-identical output to the default local/persist materialization
    for all four operators that take it: connected_components (forced
    onto the distributed path), line_dedup, dup_spans/cut_dup_spans,
    and sequence_pack."""
    from search_engine_spark.pipeline import curation, dedup

    ck = str(tmp_path / "reliable-ckpt")

    # CC on the distributed path (the fast path never checkpoints rounds)
    edges = [(5, 9), (9, 2), (30, 31), (7, 8), (8, 6), (6, 7)]
    edf = spark.createDataFrame(edges, ["a", "b"])
    monkeypatch.setattr(dedup, "CC_LOCAL_EDGE_THRESHOLD", 0)
    default = sorted(map(tuple, dedup.connected_components(edf).collect()))
    ckpt = sorted(map(tuple, dedup.connected_components(
        edf, checkpoint_dir=ck).collect()))
    assert default == ckpt

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(60)

    for fn in (
        lambda d, **kw: dedup.line_dedup(dedup.synth_multiline_docs(d), **kw),
        lambda d, **kw: dedup.dup_spans(dedup.synth_quoted_docs(d), **kw),
        lambda d, **kw: dedup.cut_dup_spans(dedup.synth_quoted_docs(d), **kw),
        curation.sequence_pack,
    ):
        a = sorted(map(tuple, fn(docs).collect()))
        b = sorted(map(tuple, fn(docs, checkpoint_dir=ck).collect()))
        assert a == b and len(a) > 0


def test_curation_verdict_composition(spark):
    """The composed verdict equals the rule fold over the component
    operators' own outputs (first failing rule in priority order), and
    the exact-dup rule outranks near-dup for the same doc."""
    from search_engine_spark.pipeline import (
        corpus_stats,
        curation,
        dedup,
        textstats,
    )

    base = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "to the hills where it is safe and the sun is warm today"
    )
    rows = [
        (1, base, "en", "web"),
        (2, base, "en", "web"),          # exact dup of 1 (loses to id 1)
        (3, base + " extra tail words here", "en", "web"),  # near dup
        (4, "zz qq xx vv kk jj", "en", "web"),              # no markers
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])
    got = {
        r.doc_id: (r.keep, r.verdict)
        for r in curation.curation_verdict(docs).collect()
    }
    assert len(got) == 4

    exact = {r.doc_id: r.is_duplicate for r in dedup.exact_dups(docs).collect()}
    near = {
        r.doc_id: r.doc_id != r.group_id
        for r in dedup.dedup_groups(docs).collect()
    }
    lang = {r.doc_id: r.lang_pred for r in textstats.lang_id(docs).collect()}
    qual = {
        r.doc_id: r.quality_score for r in textstats.text_stats(docs).collect()
    }
    bits = {
        r.doc_id: r.bits_per_token
        for r in corpus_stats.lm_score(docs).collect()
    }
    rep = {
        r.doc_id: r.dup_2gram_frac
        for r in textstats.repetition_stats(docs).collect()
    }

    def expected(d):
        if exact[d]:
            return "exact_dup"
        if near.get(d, False):
            return "near_dup"
        if lang[d] == "und":
            return "lang"
        if qual[d] < curation.VERDICT_QUALITY_MIN:
            return "quality"
        if bits[d] > curation.VERDICT_BITS_MAX:
            return "perplexity"
        if rep.get(d, 0.0) > curation.VERDICT_DUP2_MAX:
            return "repetition"
        return "keep"

    for d in (1, 2, 3, 4):
        exp = expected(d)
        assert got[d] == (exp == "keep", exp), (d, got[d], exp)
    # the planted shapes actually exercised the dedup + lang rules
    assert got[2][1] == "exact_dup"
    assert got[3][1] == "near_dup"
    assert got[4][1] == "lang"

    # precomputed-metrics form (the production contract, VERDICT r4
    # #2): passing the operators' own outputs yields the identical
    # verdict, and the composition recomputes NO dedup operator — the
    # plan contains no aggregate over shingle/minhash columns, only the
    # doc_id joins over the supplied relations
    composed = curation.curation_verdict(
        docs,
        exact=dedup.exact_dups(docs),
        groups=dedup.dedup_groups(docs),
        lang=textstats.lang_id(docs),
        quality=textstats.text_stats(docs),
        lm=corpus_stats.lm_score(docs),
        repetition=textstats.repetition_stats(docs),
    )
    got2 = {r.doc_id: (r.keep, r.verdict) for r in composed.collect()}
    assert got2 == got


def test_stratified_sample_zero_exchange(spark):
    """Per-source hash sampling is a pure projection — no Exchange."""
    from search_engine_spark.pipeline import curation

    docs = _planted_docs(spark)
    sdf = curation.stratified_sample(docs)
    plan = sdf._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    got = {r.doc_id: r for r in sdf.collect()}
    assert len(got) == 4
    for r in got.values():
        assert 0 <= r.sample_bucket < 1000
        rate = curation.SAMPLE_RATES.get(r.source, curation.DEFAULT_RATE)
        assert r.kept == (r.sample_bucket < rate)


def test_phrase_topk_planted(spark):
    """Exact-phrase counts, n>=3 path, rank/tie-break, and the
    no-partial-match guarantee (subphrases don't count)."""
    from search_engine_spark.query.phrase import phrase_topk

    rows = [
        (1, "a b c a b c a b"),      # "a b c" twice, "a b" three times
        (2, "a b x a b"),            # "a b" twice, no "a b c"
        (3, "c b a"),                # reversed: nothing
        (4, "a b c"),                # one of each
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r.query_id, r.doc_id): (r.rank, r.n_occurrences)
        for r in phrase_topk(
            docs, [("q1", "a b c"), ("q2", "a b"), ("q3", "zz top")]
        ).collect()
    }
    assert got[("q1", 1)] == (1, 2)
    assert got[("q1", 4)] == (2, 1)
    assert ("q1", 2) not in got and ("q1", 3) not in got
    assert got[("q2", 1)] == (1, 3)
    assert got[("q2", 2)] == (2, 2)
    assert got[("q2", 4)] == (3, 1)
    assert not any(q == "q3" for q, _ in got)  # unmatched phrase absent


def test_event_asof_planted_ties(spark, monkeypatch):
    """As-of semantics on planted data: equal-ts view IS visible, the
    highest event_id wins among equal-ts views, no-prior-view yields
    nulls, and the whole operator is ONE user_id Exchange."""
    import datetime as dt

    import search_engine_spark.api_pipeline as ap

    t0 = dt.datetime(2024, 1, 1)

    def t(sec):
        return t0 + dt.timedelta(seconds=sec)

    rows = [
        # user 1: view@0, view@5(x2 ids), purchase@5 (ties), purchase@9
        (10, t(0), 1, "view", 1.0, "{}"),
        (11, t(5), 1, "view", 2.0, "{}"),
        (12, t(5), 1, "view", 3.0, "{}"),
        (13, t(5), 1, "purchase", 9.0, "{}"),
        (14, t(9), 1, "purchase", 8.0, "{}"),
        # user 2: purchase with NO prior view; later view then purchase
        (20, t(1), 2, "purchase", 5.0, "{}"),
        (21, t(2), 2, "view", 6.0, "{}"),
        (22, t(3), 2, "purchase", 7.0, "{}"),
        # noise the filter must drop
        (30, t(0), 1, "click", 0.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    monkeypatch.setattr(
        ap, "load_table", lambda spark_, sf_dir, name: ev
    )
    out = ap.q_event_asof(spark, "unused")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    got = {r.purchase_id: r for r in out.collect()}
    assert set(got) == {13, 14, 20, 22}
    # equal-ts views visible; highest event_id (12) wins over 11
    assert got[13].view_id == 12 and got[13].view_value == 3.0
    assert got[13].lag_us == 0
    assert got[14].view_id == 12 and got[14].lag_us == 4_000_000
    # no prior view -> nulls
    assert got[20].view_id is None and got[20].lag_us is None
    assert got[22].view_id == 21 and got[22].lag_us == 1_000_000


def test_event_range_join_planted(spark, monkeypatch):
    """Binned range join: inclusive +-W boundary, bin-crossing pairs
    emitted exactly once, out-of-window pairs absent, and the plan is a
    hash equi-join (never BroadcastNestedLoopJoin)."""
    import datetime as dt

    import search_engine_spark.api_pipeline as ap

    W = ap.RANGE_W_US  # 1 hour in us
    t0 = dt.datetime(2024, 1, 1)

    def t(us):
        return t0 + dt.timedelta(microseconds=us)

    rows = [
        # user 1: error at 90min; clicks at exactly +-W, inside, outside,
        # and one in the adjacent bin (bin width == W so +-W spans bins)
        (1, t(90 * 60_000_000), 1, "error", 0.0, "{}"),
        (2, t(90 * 60_000_000 - W), 1, "click", 0.0, "{}"),   # -W edge: in
        (3, t(90 * 60_000_000 + W), 1, "click", 0.0, "{}"),   # +W edge: in
        (4, t(95 * 60_000_000), 1, "click", 0.0, "{}"),       # inside
        (5, t(90 * 60_000_000 + W + 1), 1, "click", 0.0, "{}"),  # out by 1us
        # user 2: same timestamps as user 1's error - must not match
        (6, t(91 * 60_000_000), 2, "click", 0.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    monkeypatch.setattr(ap, "load_table", lambda s_, d_, n_: ev)
    out = ap.q_event_range_join(spark, "unused")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan
    got = sorted((r.error_id, r.click_id, r.dt_us) for r in out.collect())
    assert got == [(1, 2, -W), (1, 3, W), (1, 4, 5 * 60_000_000)], got


def test_pii_scrub_plan_and_planted_values(spark):
    """pii_scrub is a pure projection: zero Exchange; the injected PII is
    found, counted, and fully redacted (no pattern survives scrubbing)."""
    from search_engine_spark.pipeline import crawl

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    out = crawl.pii_scrub(crawl.inject_pii(docs))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[0].n_emails == 1 and rows[0].n_phones == 1  # 0 % 7 == 0
    assert rows[0].n_ips == 1  # 0 % 11 == 0
    assert rows[1].n_emails == 0 and rows[1].n_phones == 0 and rows[1].n_ips == 0
    # nothing matching the patterns survives the scrub
    scrubbed = crawl.inject_pii(docs).select(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.col("text"), crawl.EMAIL_RE, "<EMAIL>"),
                crawl.PHONE_RE,
                "<PHONE>",
            ),
            crawl.IP_RE,
            "<IP>",
        ).alias("t")
    )
    leftovers = scrubbed.filter(
        F.col("t").rlike(crawl.EMAIL_RE)
        | F.col("t").rlike(crawl.PHONE_RE)
        | F.col("t").rlike(crawl.IP_RE)
    ).count()
    assert leftovers == 0


def test_latest_capture_single_exchange_and_winner(spark):
    """Crawl consolidation is ONE hash aggregate (single Exchange, with a
    map-side partial_max_by below it) and the newest capture's body wins."""
    from search_engine_spark.pipeline import crawl

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    out = crawl.latest_capture(crawl.multi_capture_pages(docs))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert "partial_max_by" in plan or "partial" in plan.lower(), plan
    rows = {r.url: r for r in out.collect()}
    # doc 9: three captures, latest text ends ' updated twice'
    base9 = docs.filter(F.col("doc_id") == 9).collect()[0].text
    import hashlib

    assert rows["doc://9"].n_captures == 3
    assert rows["doc://9"].latest_text_hash == hashlib.md5(
        (base9 + " updated twice").encode()
    ).hexdigest()
    # doc 1: single capture, untouched body
    base1 = docs.filter(F.col("doc_id") == 1).collect()[0].text
    assert rows["doc://1"].n_captures == 1
    assert rows["doc://1"].latest_text_hash == hashlib.md5(base1.encode()).hexdigest()
    assert rows["doc://1"].first_us == rows["doc://1"].latest_us == 1_000_000


def test_kmeans_separated_blobs_never_co_cluster(spark):
    """Two far-apart blobs: after the update + re-assign, no vector
    co-clusters with a vector from the other blob (init centroids 0-3
    live in blob A, 4-7 in blob B, so every point's nearest trained
    centroid is inside its own blob)."""
    import random

    rng = random.Random(7)
    rows = []
    for vid in range(40):
        blob = 0 if (vid < 4 or (8 <= vid < 24)) else 1
        base = 0.0 if blob == 0 else 1000.0
        rows.append(
            (vid, [base + rng.uniform(-1, 1) for _ in range(emb.EMB_DIM)], blob)
        )
    sdf = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    got = emb.kmeans_clusters(sdf).collect()
    blob_of = {vid: b for vid, _, b in rows}
    by_cluster = {}
    for r in got:
        by_cluster.setdefault(r.cluster_id, set()).add(blob_of[r.vec_id])
    for cid, blobs in by_cluster.items():
        assert len(blobs) == 1, f"cluster {cid} mixes blobs: {blobs}"
    sizes = {r.vec_id: r.cluster_size for r in got}
    assert sum(1 for _ in got) == 40 and min(sizes.values()) >= 1


def test_kmeans_empty_cluster_keeps_init_and_matches_oracle(spark):
    """vec 0 and vec 1 identical: round-1 ties send both to cluster 0,
    cluster 1 is empty at update time and must keep its init centroid
    (per-dimension COALESCE in the oracle) — the gate stays hash-exact
    on exactly this corpus."""
    import duckdb

    rows = []
    for vid in range(20):
        v = [float((vid if vid != 1 else 0) * 3 + d % 5) for d in range(emb.EMB_DIM)]
        rows.append((vid, v, 0))
    sdf = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    srows = sorted(tuple(r) for r in emb.kmeans_clusters(sdf).collect())

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE embeddings(vec_id BIGINT, embedding DOUBLE[], label BIGINT)"
    )
    con.executemany("INSERT INTO embeddings VALUES (?, ?, ?)", rows)
    orows = sorted(tuple(r) for r in con.execute(emb.SQL_KMEANS_CLUSTERS).fetchall())
    assert srows == orows
    # both identical vectors landed in the same (lower-id) cluster
    cl = {r[0]: r[1] for r in srows}
    assert cl[0] == cl[1]


def test_kmeans_assign_is_zero_exchange(spark):
    """The assignment pass is a narrow plan: no Exchange anywhere in
    the mapInPandas assign stage (the only shuffles in the whole gate
    are the 512-key update agg and the final size window)."""
    sf = "/root/testdata/sf0.001"
    embs = spark.read.parquet(f"{sf}/embeddings.parquet")
    import numpy as np

    n = emb._vectors(embs)
    xq = n.select(
        "vec_id",
        F.transform(
            F.col("v"),
            lambda x: F.round(x * emb.KMEANS_SCALE + 1e-9).cast("long"),
        ).alias("x"),
    )
    init = xq.filter(F.col("vec_id") < emb.KMEANS_K).orderBy("vec_id").collect()
    C0 = np.asarray([[int(c) for c in r.x] for r in init], dtype=np.float64)
    cids = np.asarray([int(r.vec_id) for r in init], dtype=np.int64)
    assigned = xq.mapInPandas(
        emb._kmeans_assign_kernel(C0, cids),  # the PRODUCTION kernel
        schema="vec_id long, x array<long>, cluster_id long",
    )
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_kmeans_large_coordinates_stay_oracle_exact(spark):
    """Distance sums here exceed 2^63 (coords ~1e3 -> scaled diffs ~1e9,
    squared ~1e18, x64 dims ~6e19): an int64 accumulator would silently
    wrap in numpy while DuckDB's BIGINT raised — the float64 fold keeps
    both engines bit-identical. Regression for the overflow bug."""
    import duckdb as _duckdb
    import random

    rng = random.Random(23)
    rows = [
        (vid,
         [rng.uniform(-1000.0, 1000.0) for _ in range(emb.EMB_DIM)],
         0)
        for vid in range(60)
    ]
    sdf = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    srows = sorted(tuple(r) for r in emb.kmeans_clusters(sdf).collect())

    con = _duckdb.connect()
    con.execute(
        "CREATE TABLE embeddings(vec_id BIGINT, embedding DOUBLE[], label BIGINT)"
    )
    con.executemany("INSERT INTO embeddings VALUES (?, ?, ?)", rows)
    orows = sorted(
        tuple(r) for r in con.execute(emb.SQL_KMEANS_CLUSTERS).fetchall()
    )
    assert srows == orows
    assert len({c for _, c, _ in srows}) > 1  # nontrivial clustering


def test_quality_quantiles_error_bound_and_oracle(spark):
    """Binned quantiles: within one bin width (1e-4) of the exact
    type-1 quantile of the same quality values, monotone in q, and
    hash-exact vs the DuckDB oracle on a planted corpus."""
    import math

    from search_engine_spark.pipeline import textstats as ts

    rows = [
        (i, " ".join(f"w{j % (1 + i % 37)}" for j in range(5 + (i * 7) % 300)),
         ["en", "de"][i % 2])
        for i in range(200)
    ]
    sdf = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    got = ts.quality_quantiles(sdf).collect()
    stats = ts.text_stats(sdf).collect()
    lang_of = {r[0]: r[2] for r in rows}
    by_lang = {}
    for r in stats:
        by_lang.setdefault(lang_of[r.doc_id], []).append(r.quality_score)

    for r in got:
        vals = sorted(by_lang[r.lang])
        exact = vals[max(0, math.ceil(r.q * len(vals) - 1e-9) - 1)]
        assert abs(r.quantile_score - exact) <= 1e-4 + 1e-6, (
            r.lang, r.q, r.quantile_score, exact
        )
        assert r.n_docs == len(vals)
    for lang in ("en", "de"):
        qs_sorted = sorted(
            (r.q, r.quantile_score) for r in got if r.lang == lang
        )
        vals = [v for _, v in qs_sorted]
        assert vals == sorted(vals), f"non-monotone quantiles for {lang}"

    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR, lang VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?, ?)", rows)
    orows = sorted(
        tuple(r) for r in con.execute(ts.SQL_QUALITY_QUANTILES).fetchall()
    )
    assert sorted(tuple(r) for r in got) == orows


def test_quality_quantiles_plan_shape(spark):
    """The quantile plan must (1) partial-aggregate (lang, bin) counts
    map-side BEFORE the first Exchange — that's what bounds every
    task's output to langs x (BINS+1) rows at any corpus size — and
    (2) column-prune the scan to (text, lang)."""
    from search_engine_spark.pipeline import textstats as ts

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        ts.quality_quantiles(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    agg_at = plan.index("partial_count")
    m = re.search(r"Exchange hashpartitioning\(lang#\d+, bin#\d+", plan)
    assert m is not None, plan
    # plans print top-down, so the upstream partial agg appears BELOW
    # (after) the (lang, bin) Exchange that consumes it
    assert agg_at > m.start(), plan
    scan = plan[plan.index("ReadSchema"):].splitlines()[0]
    assert "text" in scan and "lang" in scan and "doc_id" not in scan, scan


def test_url_normalize_edge_cases(spark):
    """Hand-checked canonicalization: fragments, utm-only query
    strings, default vs non-default ports, https, empty path,
    idempotence (normalizing a canonical form is a no-op)."""
    from search_engine_spark.pipeline import crawl

    cases = {
        "http://A.com/x#frag": "http://a.com/x",
        "http://a.com/x?utm_source=s": "http://a.com/x",
        "http://a.com/x?utm_source=s&id=1": "http://a.com/x?id=1",
        "http://a.com/x?id=1&utm_a=1&utm_b=2": "http://a.com/x?id=1",
        "http://a.com/x?utm_a=1&id=1&utm_b=2": "http://a.com/x?id=1",
        "http://a.com/x?utm_a=1&utm_b=2": "http://a.com/x",
        # a legit param merely ENDING in utm_... must be untouched
        "http://a.com/x?id=1&myutm_x=2": "http://a.com/x?id=1&myutm_x=2",
        # '&' is a legal PATH character (RFC 3986 sub-delim): never
        # rewritten, even when the query separately loses a utm param
        "http://a.com/red&blue": "http://a.com/red&blue",
        "http://a.com/x&y?id=1": "http://a.com/x&y?id=1",
        "http://a.com/x&y?utm_a=1&id=2": "http://a.com/x&y?id=2",
        "HTTP://WWW.A.COM:80/x": "http://www.a.com/x",
        "https://a.com:443/x": "https://a.com/x",
        "https://a.com:8443/x": "https://a.com:8443/x",  # non-default kept
        "http://a.com": "http://a.com/",                 # empty path -> /
        "http://a.com/x?id=1": "http://a.com/x?id=1",    # idempotent
        # non-scheme://authority forms pass through (fragment/utm
        # still cleaned) instead of collapsing to ':///'
        "example.com/x": "example.com/x",
        "example.com/x#frag": "example.com/x",
        "//host/path?utm_a=1&id=2": "//host/path?id=2",
        "mailto:someone@example.com": "mailto:someone@example.com",
        "data:text/plain;base64,aGk=": "data:text/plain;base64,aGk=",
    }
    sdf = spark.createDataFrame([(u,) for u in cases], ["url"])
    got = {r.url: r.url_norm for r in crawl.url_normalize(sdf).collect()}
    for raw, want in cases.items():
        assert got[raw] == want, (raw, got[raw], want)

    # idempotence over the full synthesized alias soup
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    normed = crawl.url_normalize(crawl.synth_messy_urls(docs))
    twice = crawl.url_normalize(
        normed.select(F.col("url_norm").alias("url"))
    )
    assert twice.filter(F.col("url") != F.col("url_norm")).count() == 0


def test_line_dedup_drops_planted_boilerplate_only(spark):
    """A source with >= LINE_DUP_MIN_DOCS docs loses exactly its two
    planted boilerplate lines (header + footer) per doc; a small source
    (below threshold) keeps everything; content lines survive."""
    import hashlib

    from search_engine_spark.pipeline import dedup

    rows = []
    # big source: 12 docs (>= threshold 10) with unique 16-word bodies
    for i in range(12):
        rows.append((i, " ".join(f"u{i}w{j}" for j in range(16)), "en", "big", 0))
    # small source: 3 docs — its boilerplate stays
    for i in range(12, 15):
        rows.append((i, " ".join(f"s{i}w{j}" for j in range(16)), "en", "small", 0))
    docs = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    got = {r.doc_id: r for r in dedup.line_dedup_gate(docs).collect()}

    for i in range(12):
        r = got[i]
        # 1 header + 2 content lines (16 words / 8) + 1 footer
        assert r.n_lines == 4 and r.n_dropped == 2 and r.n_kept == 2, r
        words = [f"u{i}w{j}" for j in range(16)]
        clean = " ".join(words[:8]) + "\n" + " ".join(words[8:])
        assert r.clean_hash == hashlib.md5(clean.encode()).hexdigest(), i
    for i in range(12, 15):
        r = got[i]
        assert r.n_lines == 4 and r.n_dropped == 0 and r.n_kept == 4, r


def test_sequence_pack_hand_computed_and_no_global_window(spark):
    """Planted token counts with hand-computed chunk offsets (seq_len
    2048), incl. a 0-token doc and a multi-sequence spanner; and the
    plan must contain NO Window operator — the global running sum is
    realized as range-partition + broadcast-offset prefix-sum, never a
    single-task unbounded window."""
    from search_engine_spark.pipeline import curation

    sizes = {0: 100, 1: 2000, 2: 5000, 3: 0, 4: 48}
    rows = [
        (i, " ".join(f"w{j}" for j in range(n)), "en", "s", 0)
        for i, n in sizes.items()
    ]
    docs = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    out = curation.sequence_pack(docs)
    got = {r.doc_id: r for r in out.collect()}

    # offsets: 0, 100, 2100, 7100, 7100
    exp = {
        0: (100, 0, 0, 1),
        1: (2000, 0, 100, 2),      # 100..2099 spans seqs 0-1
        2: (5000, 1, 52, 3),       # 2100..7099 spans seqs 1-3
        3: (0, 3, 956, 0),         # empty doc: spans nothing
        4: (48, 3, 956, 1),
    }
    for i, (nt, sid, off, spans) in exp.items():
        r = got[i]
        assert (r.n_tokens, r.seq_id, r.offset_in_seq, r.n_seqs_spanned) == (
            nt, sid, off, spans
        ), (i, r)

    # the final plan scans the checkpointed RDD, which would HIDE a
    # Window smuggled in upstream — so assert on the PRODUCTION
    # pre-checkpoint lineage (the factored _sequence_pack_ranged prefix
    # sequence_pack itself consumes): range Exchange, no Window
    pre = (
        curation._sequence_pack_ranged(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in pre, pre
    assert "rangepartitioning" in pre.lower(), pre
    post = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in post, post


def test_dup_spans_hand_computed(spark):
    """Three docs share a 25-token quote -> each has exactly 6
    duplicated 20-token windows (25 - 20 + 1) with span_df = 3; a
    unique doc reports zero; a short doc (< 20 tokens) is REPORTED
    with all-zero counts (ADVICE r4: downstream doc_id joins must see
    every input document)."""
    from search_engine_spark.pipeline import dedup

    quote = " ".join(f"q{j}" for j in range(25))
    rows = [
        (0, " ".join(f"a{j}" for j in range(30)) + " " + quote),
        (1, " ".join(f"b{j}" for j in range(10)) + " " + quote),
        (2, quote + " " + " ".join(f"c{j}" for j in range(5))),
        (3, " ".join(f"u{j}" for j in range(40))),   # unique
        (4, "tiny doc"),                              # < 20 tokens
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r for r in dedup.dup_spans(docs).collect()}

    r = got[4]
    assert (r.n_spans, r.n_dup_spans, r.n_distinct_dup_spans,
            r.max_span_df) == (0, 0, 0, 0), r
    for i, n_toks in [(0, 55), (1, 35), (2, 30)]:
        r = got[i]
        assert r.n_spans == n_toks - 19, r
        assert r.n_dup_spans == 6 and r.n_distinct_dup_spans == 6, r
        assert r.max_span_df == 3, r
    r = got[3]
    assert r.n_spans == 21 and r.n_dup_spans == 0 and r.max_span_df == 0, r

    # the cut step removes EXACTLY the quote's 25 tokens from each
    # quoted doc (overlapping windows union to one contiguous range)
    # and nothing from the unique or short docs
    cut = {r.doc_id: r for r in dedup.cut_dup_spans(docs).collect()}
    import hashlib

    for i, n_toks, kept in [
        (0, 55, " ".join(f"a{j}" for j in range(30))),
        (1, 35, " ".join(f"b{j}" for j in range(10))),
        (2, 30, " ".join(f"c{j}" for j in range(5))),
        (3, 40, " ".join(f"u{j}" for j in range(40))),
        (4, 2, "tiny doc"),
    ]:
        r = cut[i]
        assert r.n_tokens == n_toks, r
        assert r.n_cut_tokens == (25 if i in (0, 1, 2) else 0), r
        assert r.n_dup_windows == (6 if i in (0, 1, 2) else 0), r
        assert r.clean_hash == hashlib.md5(kept.encode()).hexdigest(), (
            i, r)
