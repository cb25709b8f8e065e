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


def curation_verdict(docs: DataFrame) -> DataFrame:
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
    composition as the cheap final pass; the signal operators themselves
    carry the scale analysis (see their docstrings).
    """
    from . import corpus_stats, dedup, textstats

    base = docs.select(F.col("doc_id").cast("long").alias("doc_id"))
    exact = dedup.exact_dups(docs).select("doc_id", "is_duplicate")
    near = dedup.dedup_groups(docs).select(
        "doc_id", (F.col("doc_id") != F.col("group_id")).alias("near_loser")
    )
    lang = textstats.lang_id(docs).select("doc_id", "lang_pred")
    quality = textstats.text_stats(docs).select("doc_id", "quality_score")
    lm = corpus_stats.lm_score(docs).select("doc_id", "bits_per_token")
    rep = textstats.repetition_stats(docs).select("doc_id", "dup_2gram_frac")

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
