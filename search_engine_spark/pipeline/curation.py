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
