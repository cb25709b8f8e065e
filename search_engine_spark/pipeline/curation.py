"""Dataset curation operators: deterministic splits and train/eval
decontamination — the last-mile steps of a training-data pipeline.

Both are built on the cross-engine primitives in ``common.py`` (hash60,
word shingles) so each has an exact DuckDB oracle.

Scale notes (100 TB):
- ``dataset_splits`` is a pure per-row hash projection — zero shuffle,
  zero state (no-Exchange plan asserted in tests). Hash-based splits
  are the only splits that survive re-runs, late-arriving data, and
  multi-team reproduction; ratios are enforced in expectation by the
  uniformity of md5.
- ``contamination`` broadcasts the eval set's distinct shingle hashes
  (benchmark suites are tiny next to a training corpus) and map-side
  joins the exploded corpus shingles against them: the only Exchange is
  the final per-doc count aggregation, with map-side partial counts
  doing almost all the work. This is the standard n-gram
  decontamination shape (the overlap-count threshold suppresses
  3-gram false positives; production systems raise the gram width
  and/or the threshold together).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .common import hash60_col, shingles_col, sql_hash60, sql_shingles, sql_words, words_col

# split thresholds over pmod(hash60, 100): [0,90) train, [90,95) val, rest test
TRAIN_PCT = 90
VAL_PCT = 95
# eval membership for the self-contained contamination gate
EVAL_MOD = 50
# minimum shared distinct shingles before a doc counts as contaminated
CONTAM_MIN_SHARED = 5


def dataset_splits(docs: DataFrame) -> DataFrame:
    """(doc_id, split) — deterministic hash-based train/val/test split.

    bucket = pmod(hash60('split|' || doc_id), 100); the salt prefix
    decorrelates the split from every other hash60 use of doc_id (dedup
    keys, sampling), so membership in one never biases the other.
    """
    bucket = F.pmod(
        hash60_col(F.concat(F.lit("split|"), F.col("doc_id").cast("string"))),
        F.lit(100),
    )
    split = (
        F.when(bucket < TRAIN_PCT, "train")
        .when(bucket < VAL_PCT, "val")
        .otherwise("test")
    )
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"), split.alias("split")
    )


SQL_DATASET_SPLITS = f"""
SELECT doc_id::BIGINT AS doc_id,
       CASE WHEN b < {TRAIN_PCT} THEN 'train'
            WHEN b < {VAL_PCT} THEN 'val'
            ELSE 'test' END AS split
FROM (
    SELECT doc_id,
           {sql_hash60("'split|' || doc_id::VARCHAR")} % 100 AS b
    FROM documents
)
"""


def contamination(docs: DataFrame) -> DataFrame:
    """(doc_id, n_shared_grams) — training docs sharing >=
    ``CONTAM_MIN_SHARED`` distinct word 3-grams with the eval set
    (docs with ``doc_id % EVAL_MOD == 0`` — a deterministic stand-in
    for a benchmark suite).

    Plan: the eval set's distinct gram hashes broadcast; the corpus
    side explodes its distinct shingles and inner-joins map-side; one
    hash aggregation counts shared grams per doc. Eval docs themselves
    are excluded from the output (they trivially match).
    """
    grams = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.explode(shingles_col(words_col("text"))).alias("gram"),
    ).select("doc_id", hash60_col(F.col("gram")).alias("gh"))
    eval_grams = (
        grams.filter(F.col("doc_id") % EVAL_MOD == 0)
        .select("gh")
        .distinct()
    )
    return (
        grams.filter(F.col("doc_id") % EVAL_MOD != 0)
        .join(F.broadcast(eval_grams), "gh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_grams"))
        .filter(F.col("n_shared_grams") >= CONTAM_MIN_SHARED)
    )


SQL_CONTAMINATION = f"""
WITH grams AS (
    SELECT doc_id::BIGINT AS doc_id,
           {sql_hash60("g.gram")} AS gh
    FROM documents,
         unnest({sql_shingles(sql_words("text"))}) AS g(gram)
),
eval_grams AS (
    SELECT DISTINCT gh FROM grams WHERE doc_id % {EVAL_MOD} = 0
)
SELECT doc_id, count(*)::BIGINT AS n_shared_grams
FROM grams
WHERE doc_id % {EVAL_MOD} != 0
  AND gh IN (SELECT gh FROM eval_grams)
GROUP BY doc_id
HAVING count(*) >= {CONTAM_MIN_SHARED}
"""


# --- composed keep/drop verdict -------------------------------------------

# Frozen filter thresholds (chosen to exercise every rule on the driver
# corpus; a production pipeline tunes these per source).
VERDICT_QUALITY_MIN = 0.25   # text_stats.quality_score floor
VERDICT_BITS_MAX = 5.2       # lm_score.bits_per_token ceiling
VERDICT_DUP2_MAX = 0.10      # repetition_stats.dup_2gram_frac ceiling

# rule order = report priority: the FIRST failing rule names the verdict
VERDICT_RULES = (
    "exact_dup", "near_dup", "lang", "quality", "perplexity", "repetition",
)


def curation_verdict(
    docs: DataFrame,
    *,
    exact: DataFrame | None = None,
    groups: DataFrame | None = None,
    lang: DataFrame | None = None,
    quality: DataFrame | None = None,
    lm: DataFrame | None = None,
    repetition: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, keep, verdict, quality_score, bits_per_token) — the
    composed end-to-end curation decision: every per-document signal the
    pipeline computes (exact dedup, MinHash near-dup clusters, language
    ID, quality heuristic, unigram LM cross-entropy, Gopher repetition)
    joined on ``doc_id`` and folded into one keep/drop verdict.

    ``verdict`` is the highest-priority failing rule (``VERDICT_RULES``
    order) or ``'keep'``:

    - ``exact_dup``: the doc is an exact-duplicate non-survivor.
    - ``near_dup``: the doc is in a MinHash-LSH near-dup cluster and is
      not the cluster's canonical (min-id) keeper.
    - ``lang``: language ID returned 'und'.
    - ``quality``: quality_score < VERDICT_QUALITY_MIN.
    - ``perplexity``: bits_per_token > VERDICT_BITS_MAX.
    - ``repetition``: dup_2gram_frac > VERDICT_DUP2_MAX (docs with < 2
      words have no 2-grams and pass this rule).

    Scale notes (100 TB): every input is a per-document metrics relation
    keyed by the unique, uniform ``doc_id`` — the composition is a
    chain of skew-free equi-joins that AQE plans as broadcast or
    shuffle joins by size. A production pipeline materializes each
    metrics table once (they are corpus-sized but narrow) and runs this
    composition as the cheap final pass; the keyword arguments exist for
    exactly that contract (VERDICT r4 #2): pass the operators' own
    output relations (``exact_dups``, ``dedup_groups``, ``lang_id``,
    ``text_stats``, ``lm_score``, ``repetition_stats``) and this
    function is ONLY the join+fold — it recomputes nothing. When a
    relation is omitted it is derived from ``docs`` inline (the
    self-contained correctness-gate shape); the signal operators
    themselves carry the scale analysis (see their docstrings).
    """
    from . import corpus_stats, dedup, textstats

    base = docs.select(F.col("doc_id").cast("long").alias("doc_id"))
    if exact is None:
        exact = dedup.exact_dups(docs)
    exact = exact.select("doc_id", "is_duplicate")
    if groups is None:
        groups = dedup.dedup_groups(docs)
    near = groups.select(
        "doc_id", (F.col("doc_id") != F.col("group_id")).alias("near_loser")
    )
    if lang is None:
        lang = textstats.lang_id(docs)
    lang = lang.select("doc_id", "lang_pred")
    if quality is None:
        quality = textstats.text_stats(docs)
    quality = quality.select("doc_id", "quality_score")
    if lm is None:
        lm = corpus_stats.lm_score(docs)
    lm = lm.select("doc_id", "bits_per_token")
    if repetition is None:
        repetition = textstats.repetition_stats(docs)
    rep = repetition.select("doc_id", "dup_2gram_frac")

    joined = (
        base.join(exact, "doc_id")
        .join(near, "doc_id", "left")
        .join(lang, "doc_id")
        .join(quality, "doc_id")
        .join(lm, "doc_id")
        .join(rep, "doc_id", "left")
    )
    verdict = (
        F.when(F.col("is_duplicate"), "exact_dup")
        .when(F.coalesce("near_loser", F.lit(False)), "near_dup")
        .when(F.col("lang_pred") == "und", "lang")
        .when(F.col("quality_score") < VERDICT_QUALITY_MIN, "quality")
        .when(F.col("bits_per_token") > VERDICT_BITS_MAX, "perplexity")
        .when(
            F.coalesce("dup_2gram_frac", F.lit(0.0)) > VERDICT_DUP2_MAX,
            "repetition",
        )
        .otherwise("keep")
    )
    return joined.select(
        "doc_id",
        (verdict == "keep").alias("keep"),
        verdict.alias("verdict"),
        "quality_score",
        "bits_per_token",
    )


def _sql_curation_verdict() -> str:
    """Compose the module oracle SQLs as derived tables (single source
    of truth: each rule's SQL is the already-gated operator's own)."""
    from . import corpus_stats, dedup, textstats

    return f"""
WITH verdicts AS (
    SELECT d.doc_id,
           CASE
             WHEN ex.is_duplicate THEN 'exact_dup'
             WHEN coalesce(dg.doc_id != dg.group_id, false) THEN 'near_dup'
             WHEN lg.lang_pred = 'und' THEN 'lang'
             WHEN ts.quality_score < {VERDICT_QUALITY_MIN} THEN 'quality'
             WHEN lm.bits_per_token > {VERDICT_BITS_MAX} THEN 'perplexity'
             WHEN coalesce(rp.dup_2gram_frac, 0.0) > {VERDICT_DUP2_MAX}
               THEN 'repetition'
             ELSE 'keep'
           END AS verdict,
           ts.quality_score, lm.bits_per_token
    FROM (SELECT doc_id::BIGINT AS doc_id FROM documents) d
    JOIN ({dedup.SQL_EXACT_DUPS}) ex USING (doc_id)
    LEFT JOIN ({dedup.SQL_DEDUP_GROUPS}) dg USING (doc_id)
    JOIN ({textstats.SQL_LANG_ID}) lg USING (doc_id)
    JOIN ({textstats.SQL_TEXT_STATS}) ts USING (doc_id)
    JOIN ({corpus_stats.SQL_LM_SCORE}) lm USING (doc_id)
    LEFT JOIN ({textstats.SQL_REPETITION_STATS}) rp USING (doc_id)
)
SELECT doc_id, verdict = 'keep' AS keep, verdict,
       quality_score, bits_per_token
FROM verdicts
"""


SQL_CURATION_VERDICT = _sql_curation_verdict()


# --- deterministic stratified sampling ------------------------------------

# Frozen per-source keep rates (per mille) over the driver corpus's
# source ids — the standard source-mixing shape (some sources kept
# whole, some downsampled hard); sources not in the map fall back to
# DEFAULT_RATE.
SAMPLE_RATES: dict[str, int] = {
    "src0": 1000,
    "src1": 900,
    "src5": 700,
    "src7": 400,
}
DEFAULT_RATE = 500


def stratified_sample(docs: DataFrame) -> DataFrame:
    """(doc_id, source, sample_bucket, kept) — deterministic per-source
    subsampling: keep iff pmod(hash60('sample|' || doc_id), 1000) <
    rate(source).

    The hash-based coin is the only sampling that survives re-runs,
    late-arriving data, and multi-team reproduction (same property as
    ``dataset_splits``, same salt-prefix decorrelation). Zero shuffle:
    a pure per-row projection against a literal rate map, so a 100 TB
    corpus samples in one scan. Every doc is emitted with its verdict
    (filtering is the caller's one-liner) so the gate hashes the full
    decision, not just the survivors.
    """
    bucket = F.pmod(
        hash60_col(F.concat(F.lit("sample|"), F.col("doc_id").cast("string"))),
        F.lit(1000),
    )
    rate = F.lit(DEFAULT_RATE)
    for src, r in sorted(SAMPLE_RATES.items()):
        rate = F.when(F.col("source") == src, F.lit(r)).otherwise(rate)
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "source",
        bucket.cast("long").alias("sample_bucket"),
        (bucket < rate).alias("kept"),
    )


SQL_STRATIFIED_SAMPLE = f"""
SELECT doc_id::BIGINT AS doc_id,
       source,
       b AS sample_bucket,
       b < CASE source
             {" ".join(f"WHEN '{s}' THEN {r}" for s, r in sorted(SAMPLE_RATES.items()))}
             ELSE {DEFAULT_RATE} END AS kept
FROM (
    SELECT doc_id, source,
           {sql_hash60("'sample|' || doc_id::VARCHAR")} % 1000 AS b
    FROM documents
)
"""


# --- sequence packing (concat-and-chunk) ------------------------------------

SEQ_LEN = 2048  # tokens per packed training sequence


def _sequence_pack_ranged(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, pid) range-partitioned and sorted by doc_id —
    the pre-checkpoint lineage of :func:`sequence_pack`, factored so
    tests can assert the plan shape of the PRODUCTION prefix (the
    checkpoint hides it from the final plan): no Window anywhere, one
    range Exchange."""
    counts = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(words_col("text")).cast("long").alias("n_tokens"),
    )
    nparts = max(2, docs.sparkSession.sparkContext.defaultParallelism)
    return (
        counts.repartitionByRange(nparts, "doc_id")
        .sortWithinPartitions("doc_id")
        .withColumn("pid", F.spark_partition_id())
    )


def sequence_pack(
    docs: DataFrame,
    seq_len: int = SEQ_LEN,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(doc_id, n_tokens, seq_id, offset_in_seq, n_seqs_spanned) — the
    concat-and-chunk packing every LLM pretraining export runs: the
    corpus is one token stream in ``doc_id`` order, cut into
    ``seq_len``-token training sequences; each document lands at a
    global token offset, i.e. sequence ``offset // seq_len`` at
    position ``offset % seq_len``, spanning one or more sequences.

    Semantics (the oracle's declarative spec): a running sum of
    ``n_tokens`` over ``ORDER BY doc_id``. The Spark plan does NOT use
    that global-order window — a single unbounded window serializes
    the whole corpus through one task — but the classic **distributed
    prefix-sum**: range-partition by doc_id (so partition order ==
    doc_id order), collect the per-partition token subtotals (one tiny
    job, n_partitions rows), broadcast the exclusive partition offsets
    back, and let each partition compute its local cumulative sum in
    one Arrow pass. Two corpus scans, zero corpus-sized shuffle beyond
    the range partitioning; 10^9 docs cost the same two scans.

    All arithmetic is exact integers (token counts, offsets), so the
    gate hashes; the div/mod pair is floor(double)-based identically in
    both engines (values << 2^53).
    """
    import pandas as pd

    from .dedup import _cut

    # Pin the partitioning so the subtotal job and the offset pass see
    # IDENTICAL partitions — here checkpointing is load-bearing, not a
    # double-execution guard: the broadcast offsets are keyed by
    # partition id, so a recomputed partition with different contents
    # would silently corrupt every offset. Fault-tolerance trade
    # (ADVICE r4): the default localCheckpoint pins blocks to executors
    # (an executor loss fails the job — rerun from the parquet input);
    # pass checkpoint_dir for a reliable checkpoint that survives
    # executor loss on a long 100 TB export.
    ranged = _cut(_sequence_pack_ranged(docs), checkpoint_dir)
    subtotals = {
        int(r.pid): int(r.s)
        for r in ranged.groupBy("pid").agg(F.sum("n_tokens").alias("s")).collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(subtotals):
        offsets[pid] = acc
        acc += subtotals[pid]

    def pack(batches):
        local = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if local is None:
                # fail LOUDLY if the pinned-partitioning invariant ever
                # breaks (a silent 0 would corrupt every offset in the
                # partition instead of raising)
                local = offsets[int(pdf["pid"].iloc[0])]
            starts = pdf["n_tokens"].cumsum() - pdf["n_tokens"] + local
            local += int(pdf["n_tokens"].sum())
            seq_id = starts // seq_len
            ends = starts + pdf["n_tokens"]
            spanned = ((ends - 1) // seq_len - seq_id + 1).where(
                pdf["n_tokens"] > 0, 0
            )
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_tokens": pdf["n_tokens"],
                "seq_id": seq_id.astype("int64"),
                "offset_in_seq": (starts % seq_len).astype("int64"),
                "n_seqs_spanned": spanned.astype("int64"),
            })

    return ranged.mapInPandas(
        pack,
        schema=(
            "doc_id long, n_tokens long, seq_id long, "
            "offset_in_seq long, n_seqs_spanned long"
        ),
    )


SQL_SEQUENCE_PACK = f"""
WITH counts AS (
    SELECT doc_id::BIGINT AS doc_id,
           len({sql_words('text')})::BIGINT AS n_tokens
    FROM documents
),
offs AS (
    SELECT doc_id, n_tokens,
           (sum(n_tokens) OVER (ORDER BY doc_id
                                ROWS UNBOUNDED PRECEDING)
            - n_tokens)::BIGINT AS start
    FROM counts
)
SELECT doc_id, n_tokens,
       (start // {SEQ_LEN})::BIGINT AS seq_id,
       (start % {SEQ_LEN})::BIGINT AS offset_in_seq,
       CASE WHEN n_tokens = 0 THEN 0
            ELSE ((start + n_tokens - 1) // {SEQ_LEN})
                 - (start // {SEQ_LEN}) + 1
       END::BIGINT AS n_seqs_spanned
FROM offs
"""
