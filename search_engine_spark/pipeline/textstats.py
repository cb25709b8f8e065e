"""Text analysis over the documents corpus: token counting, quality
scoring, language identification, winnowing fingerprints.

These are the per-document text-metrics a training-data pipeline runs
before filtering/dedup (C4/Gopher-style quality heuristics, re-expressed
as deterministic DataFrame columns). Every formula is frozen here and
mirrored exactly in the DuckDB oracle SQL in ``api_pipeline.py``.

Scale notes (100 TB): all of this is per-row column arithmetic + one
``groupBy(doc_id)`` whose input was just exploded from the same row —
Catalyst plans a partial aggregate before the shuffle, and the shuffle
key (doc_id) is unique per input row, so there is no skew by
construction. No Python runs anywhere (regexp/md5/array higher-order
functions are JVM expressions inside whole-stage codegen).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .common import (
    hash60_col,
    positional_grams,
    positional_ngrams,
    round6_col,
    sql_hash60,
    sql_words,
    words_col,
)

# Frozen marker-word profiles for the n-gram/stopword language-ID
# heuristic. Overlaps across languages are deliberate (real function
# words collide); scoring counts per-language hits.
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "a"],
    "de": ["der", "die", "das", "und", "nicht", "ist", "ich", "mit", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "des", "est", "une", "que", "dans", "pour"],
    "es": ["el", "los", "las", "una", "que", "de", "por", "con", "para", "es"],
}

STOPWORDS_EN = LANG_PROFILES["en"] + ["on", "as", "with", "at", "by"]

WINNOW_WINDOW = 4  # winnowing window (in grams)


def quality_parts():
    """(w, n_tokens, n_types, ttr, stop_ratio, quality) — the frozen
    quality blend and the sub-expressions it is built from, over
    ``words_col("text")``. The SINGLE definition shared by
    :func:`text_stats` and :func:`quality_quantiles` (its SQL mirror is
    ``_SQL_QUALITY``, likewise shared by both oracles) so the 'frozen'
    heuristic literally cannot drift between gates."""
    w = words_col("text")
    n_tokens = F.size(w)
    n_types = F.size(F.array_distinct(w))
    n_stop = F.size(
        F.filter(w, lambda t: t.isin(*[F.lit(s) for s in STOPWORDS_EN]))
    )
    ttr = round6_col(n_types / F.greatest(n_tokens, F.lit(1)))
    stop_ratio = round6_col(n_stop / F.greatest(n_tokens, F.lit(1)))
    quality = round6_col(
        F.lit(0.4) * F.least(stop_ratio * 4.0, F.lit(1.0))
        + F.lit(0.3) * F.least(n_tokens / F.lit(200.0), F.lit(1.0))
        + F.lit(0.3) * ttr
    )
    return w, n_tokens, n_types, ttr, stop_ratio, quality


def text_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, n_chars, n_tokens, n_ws_tokens, n_bpe_pieces, n_types,
    ttr, avg_token_len, punct_ratio, stopword_ratio, quality_score)

    - ``n_tokens``: ``\\w+`` word count; ``n_ws_tokens``: whitespace-run
      count; ``n_bpe_pieces``: a BPE-pre-tokenizer-like segmentation
      (letter runs | digit runs | single punctuation marks).
    - ``ttr``: type/token ratio; ``punct_ratio``: non-word, non-space
      chars per char; ``stopword_ratio``: EN stopword share.
    - ``quality_score``: frozen heuristic blend in [0, 1] —
      0.4*stopword_presence + 0.3*length_term + 0.3*ttr_band
      (single definition: :func:`quality_parts`).
    All ratios rounded to 6dp (cross-engine float stability).
    """
    w, n_tokens, n_types, ttr, stop_ratio, quality = quality_parts()
    lower = F.lower(F.col("text"))
    n_chars = F.length("text")
    sum_len = F.aggregate(
        F.transform(w, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    n_punct = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[^\w\s]"), 0))
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        F.size(F.regexp_extract_all(lower, F.lit(r"[^\s]+"), 0))
        .cast("long")
        .alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(lower, F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0))
        .cast("long")
        .alias("n_bpe_pieces"),
        n_types.cast("long").alias("n_types"),
        ttr.alias("ttr"),
        round6_col(sum_len / F.greatest(n_tokens, F.lit(1))).alias("avg_token_len"),
        round6_col(n_punct / F.greatest(n_chars, F.lit(1))).alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        quality.alias("quality_score"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """(doc_id, lang_pred, lang_score) — argmax of per-language marker-word
    hit ratio; ties break language ASC; zero hits -> 'und'/0.0.

    Scale note: the profile table is a literal array expression evaluated
    per row — no join, no shuffle; a 100 TB corpus scans once.
    """
    w = words_col("text")
    n_tokens = F.greatest(F.size(w), F.lit(1))
    scores = [
        (
            lang,
            round6_col(
                F.size(F.filter(w, lambda t: t.isin(*[F.lit(m) for m in marks])))
                / n_tokens
            ),
        )
        for lang, marks in sorted(LANG_PROFILES.items())
    ]
    # argmax with lang-ASC tie-break: fold over (score, lang) pairs.
    best_score = F.greatest(*[s for _, s in scores])
    pred = F.lit("und")
    for lang, s in reversed(scores):  # earlier langs win ties -> apply last
        pred = F.when(s == best_score, F.lit(lang)).otherwise(pred)
    pred = F.when(best_score > 0, pred).otherwise(F.lit("und"))
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        pred.alias("lang_pred"),
        F.when(best_score > 0, best_score).otherwise(F.lit(0.0)).alias("lang_score"),
    )


def fingerprints(docs: DataFrame) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., MOSS):
    hash word 3-grams, slide a 4-gram window, keep each window's min.

    Output: (doc_id, n_fingerprints, fp_min, fp_xor) — a compact sketch
    row per document (fp_xor = XOR of the distinct selected hashes, an
    order-insensitive digest).

    Scale note: winnowing is a per-document computation, so it is
    expressed entirely as array expressions over the gram array —
    ZERO shuffle (the plan contains no Exchange; asserted in
    tests/test_pipeline_units.py). The earlier posexplode + window
    formulation paid a corpus-sized shuffle+sort for what is bounded
    per-row state; a 100 TB corpus scans once instead. Docs shorter
    than 3 words yield no grams and are absent from the output (same
    on the oracle side).
    """
    w = words_col("text")
    grams = positional_grams(w)
    h = F.transform(grams, lambda g: hash60_col(g))
    # Sliding min over each window start i (window clipped at the array
    # end — identical to ROWS BETWEEN CURRENT ROW AND W-1 FOLLOWING),
    # computed by sparse-table doubling: level k holds
    # m_k[i] = min(h[i .. i+2^k-1]); zip_with against the 2^k-shifted
    # array doubles the window per level, and zip_with's null padding +
    # least's null-skipping give the clipped tail for free. Doubling
    # matters because Catalyst inlines (not materializes) array columns
    # into downstream lambdas: a naive per-position
    # array_min(slice(h, i, W)) re-evaluates the md5 gram hashing for
    # EVERY position — O(n^2) hashing per document (a measured 438 s at
    # sf0.1 vs ~4 s for this form).
    #
    # Each stage below is fenced behind explode(array(expr)) — a
    # one-row Generate whose output attribute is computed ONCE per row.
    # Without the fence, CollapseProject inlines the whole upstream
    # expression tree into every downstream reference, and because
    # higher-order functions are CodegenFallback (no codegen
    # common-subexpression elimination) the md5 gram hashing really
    # re-executes per reference: 2 refs per doubling level x 4 final
    # consumers = 16x per row, measured 6.3 s -> 1.2 s at sf0.1 from
    # this change alone. No shuffle is introduced (Generate is a
    # narrow operator; the zero-Exchange plan assertion still holds).
    hdf = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.explode(F.array(h)).alias("h"),
    )
    hc = F.col("h")
    m1 = F.zip_with(
        hc,
        F.slice(hc, 2, F.greatest(F.size(hc) - 1, F.lit(0))),
        lambda x, y: F.least(x, y),
    )
    m1df = hdf.select("doc_id", F.explode(F.array(m1)).alias("m1"))
    m1c = F.col("m1")
    mins = F.zip_with(
        m1c,
        F.slice(m1c, 3, F.greatest(F.size(m1c) - 2, F.lit(0))),
        lambda x, y: F.least(x, y),
    )
    picked = m1df.select(
        "doc_id", F.explode(F.array(F.array_distinct(mins))).alias("sel")
    ).filter(F.size("sel") > 0)
    return picked.select(
        "doc_id",
        F.size("sel").cast("long").alias("n_fingerprints"),
        F.array_min("sel").alias("fp_min"),
        F.aggregate(
            "sel", F.lit(0).cast("long"), lambda a, x: a.bitwiseXOR(x)
        ).alias("fp_xor"),
    )


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Gopher-style within-document repetition signals (Rae et al. 2021,
    §A1.1 "repetitious text" filters), re-expressed over word n-grams
    (the driver corpus has no line structure):

    Output: (doc_id, n_2grams, top_2gram_frac, dup_2gram_frac,
    dup_3gram_frac, dup_5gram_frac)

    - ``top_2gram_frac``: occurrences of the most frequent word 2-gram /
      total 2-gram occurrences (Gopher's "top n-gram fraction").
    - ``dup_Ngram_frac``: 1 - distinct/total word N-grams (Gopher's
      "duplicate n-gram fraction"); 0.0 when the doc has no N-grams.
    Docs with fewer than 2 words have no 2-grams and are absent from the
    output (same on the oracle side).

    Scale notes (100 TB): the 3/5-gram fractions are pure array
    arithmetic — zero shuffle. The top-2-gram mode needs a per-(doc,
    gram) count: explode -> groupBy(doc_id, gram) -> groupBy(doc_id).
    Both aggregations get map-side partials, the first key is
    high-cardinality/uniform (doc_id is unique per row), and the second
    runs over the already-collapsed per-gram counts, so the second
    Exchange moves ~distinct-grams-per-doc rows, not corpus tokens.
    The token array and each gram array are fenced behind a one-row
    Generate (explode(array(...))) so Catalyst computes them once per
    row instead of inlining the tokenizer regex into every consumer
    (CollapseProject re-evaluates CodegenFallback higher-order
    expressions per reference; see fingerprints() above).
    """
    wdf = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.explode(F.array(words_col("text"))).alias("w"),
    )
    w = F.col("w")
    gdf = wdf.select(
        "doc_id",
        F.explode(
            F.array(
                F.struct(
                    positional_ngrams(w, 2).alias("g2"),
                    positional_ngrams(w, 3).alias("g3"),
                    positional_ngrams(w, 5).alias("g5"),
                )
            )
        ).alias("g"),
    )

    def dup_frac(garr):
        return (
            F.when(
                F.size(garr) > 0,
                round6_col(
                    F.lit(1.0) - F.size(F.array_distinct(garr)) / F.size(garr)
                ),
            )
            .otherwise(F.lit(0.0))
            .cast("double")
        )

    pre = gdf.select(
        "doc_id",
        dup_frac(F.col("g.g3")).alias("d3"),
        dup_frac(F.col("g.g5")).alias("d5"),
        F.explode("g.g2").alias("g2"),
    )
    counts = pre.groupBy("doc_id", "g2").agg(
        F.count(F.lit(1)).alias("c"),
        F.first("d3").alias("d3"),
        F.first("d5").alias("d5"),
    )
    return (
        counts.groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_2grams"),
            F.max("c").alias("top_c"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.first("d3").alias("dup_3gram_frac"),
            F.first("d5").alias("dup_5gram_frac"),
        )
        .select(
            "doc_id",
            "n_2grams",
            round6_col(F.col("top_c") / F.col("n_2grams")).alias("top_2gram_frac"),
            round6_col(
                F.lit(1.0) - F.col("n_distinct") / F.col("n_2grams")
            ).alias("dup_2gram_frac"),
            "dup_3gram_frac",
            "dup_5gram_frac",
        )
    )


# --- DuckDB oracle fragments ----------------------------------------------

_STOP_LIST = ", ".join(f"'{s}'" for s in STOPWORDS_EN)

# SQL mirror of quality_parts()'s blend over a CTE exposing w — the one
# definition both SQL_TEXT_STATS and SQL_QUALITY_QUANTILES embed.
_SQL_QUALITY = rf"""round(
    0.4::DOUBLE * least(round(len(list_filter(w, t -> t IN ({_STOP_LIST})))
        / greatest(len(w), 1)::DOUBLE + 1e-9, 6) * 4.0::DOUBLE, 1.0::DOUBLE)
    + 0.3::DOUBLE * least(len(w) / 200.0::DOUBLE, 1.0::DOUBLE)
    + 0.3::DOUBLE * round(len(list_distinct(w))
        / greatest(len(w), 1)::DOUBLE + 1e-9, 6)
    + 1e-9, 6)"""

SQL_TEXT_STATS = rf"""
WITH base AS (
    SELECT doc_id::BIGINT AS doc_id, text,
           {sql_words('text')} AS w,
           length(text) AS n_chars
    FROM documents
)
SELECT doc_id,
       n_chars::BIGINT AS n_chars,
       len(w)::BIGINT AS n_tokens,
       len(regexp_extract_all(lower(text), '[^\s]+'))::BIGINT AS n_ws_tokens,
       len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]'))::BIGINT
           AS n_bpe_pieces,
       len(list_distinct(w))::BIGINT AS n_types,
       round(len(list_distinct(w)) / greatest(len(w), 1)::DOUBLE + 1e-9, 6) AS ttr,
       round(list_reduce(list_prepend(0, list_transform(w, t -> length(t))),
                         (a, x) -> a + x) / greatest(len(w), 1)::DOUBLE + 1e-9, 6)
           AS avg_token_len,
       round(len(regexp_extract_all(text, '[^\w\s]'))
             / greatest(n_chars, 1)::DOUBLE + 1e-9, 6) AS punct_ratio,
       round(len(list_filter(w, t -> t IN ({_STOP_LIST})))
             / greatest(len(w), 1)::DOUBLE + 1e-9, 6) AS stopword_ratio,
       {_SQL_QUALITY} AS quality_score
FROM base
"""

_LANG_SCORE_SQL = {
    lang: (
        "round(len(list_filter(w, t -> t IN ({marks}))) "
        "/ greatest(len(w), 1)::DOUBLE + 1e-9, 6)"
    ).format(marks=", ".join(f"'{m}'" for m in marks))
    for lang, marks in sorted(LANG_PROFILES.items())
}

_BEST = "greatest(" + ", ".join(f"s_{lang}" for lang in _LANG_SCORE_SQL) + ")"
_PRED_CASE = (
    "CASE WHEN " + _BEST + " = 0 THEN 'und' "
    + " ".join(
        f"WHEN s_{lang} = {_BEST} THEN '{lang}'" for lang in _LANG_SCORE_SQL
    )
    + " END"
)

SQL_LANG_ID = rf"""
WITH base AS (
    SELECT doc_id::BIGINT AS doc_id, {sql_words('text')} AS w FROM documents
),
scored AS (
    SELECT doc_id,
           {", ".join(f"{expr} AS s_{lang}" for lang, expr in _LANG_SCORE_SQL.items())}
    FROM base
)
SELECT doc_id, {_PRED_CASE} AS lang_pred,
       CASE WHEN {_BEST} > 0 THEN {_BEST} ELSE 0.0 END AS lang_score
FROM scored
"""

def _sql_ngrams(w: str, n: int) -> str:
    """DuckDB positional word n-grams of a token-list expression (1-based)."""
    joined = " || ' ' || ".join(f"{w}[i+{k}]" if k else f"{w}[i]" for k in range(n))
    return (
        f"list_transform(range(1, greatest(len({w}) - {n - 2}, 1)), "
        f"i -> {joined})"
    )


def _sql_dup_frac(g: str) -> str:
    return (
        f"CASE WHEN len({g}) = 0 THEN 0.0 ELSE "
        f"round(1.0 - len(list_distinct({g})) / len({g})::DOUBLE + 1e-9, 6) END"
    )


SQL_REPETITION_STATS = rf"""
WITH base AS (
    SELECT doc_id::BIGINT AS doc_id, {sql_words('text')} AS w FROM documents
),
grams AS (
    SELECT doc_id,
           {_sql_ngrams('w', 2)} AS g2,
           {_sql_dup_frac(_sql_ngrams('w', 3))} AS d3,
           {_sql_dup_frac(_sql_ngrams('w', 5))} AS d5
    FROM base
),
ex AS (
    SELECT doc_id, d3, d5, unnest(g2) AS g
    FROM grams WHERE len(g2) > 0
),
counts AS (
    SELECT doc_id, g, count(*) AS c,
           any_value(d3) AS d3, any_value(d5) AS d5
    FROM ex GROUP BY 1, 2
)
SELECT doc_id,
       sum(c)::BIGINT AS n_2grams,
       round(max(c) / sum(c)::DOUBLE + 1e-9, 6) AS top_2gram_frac,
       round(1.0 - count(*) / sum(c)::DOUBLE + 1e-9, 6) AS dup_2gram_frac,
       any_value(d3) AS dup_3gram_frac,
       any_value(d5) AS dup_5gram_frac
FROM counts GROUP BY doc_id
"""

SQL_FINGERPRINTS = rf"""
WITH base AS (
    SELECT doc_id::BIGINT AS doc_id, {sql_words('text')} AS w FROM documents
),
grams AS (
    SELECT doc_id, i AS pos,
           {sql_hash60("w[i] || ' ' || w[i+1] || ' ' || w[i+2]")} AS h
    FROM base, unnest(range(1, greatest(len(w) - 1, 1))) AS t(i)
),
winmin AS (
    SELECT DISTINCT doc_id,
           min(h) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN CURRENT ROW AND {WINNOW_WINDOW - 1} FOLLOWING)
               AS fp
    FROM grams
)
SELECT doc_id, count(*)::BIGINT AS n_fingerprints,
       min(fp) AS fp_min, bit_xor(fp) AS fp_xor
FROM winmin GROUP BY doc_id
"""


# --- grouped quantiles (binned histogram — the scale path) ------------------

QUANTILE_BINS = 10_000                 # fixed-width bins over [0, 1]
QUANTILE_QS = (0.25, 0.5, 0.75, 0.9)   # reported quantiles


def quality_quantiles(docs: DataFrame) -> DataFrame:
    """(lang, q, quantile_score, n_docs) — per-language quantiles of
    ``quality_score`` via a fixed-width binned histogram.

    Why not the built-ins: exact ``percentile`` buffers/sorts every
    group's values (a per-group sort that dies on a hot language at
    10^9 docs), and ``percentile_approx``'s GK sketch is
    implementation-defined (not reproducible against another engine,
    so it can't hash-gate). Binned quantiles are the production middle
    ground: error is bounded by the bin width (1e-4 here), the plan is
    one bounded-cardinality aggregate — ``groupBy(lang, bin)`` has at
    most ``langs x (BINS+1)`` groups, so map-side partial aggregation
    collapses each task to that bound no matter how many rows it scans
    — plus window arithmetic over the tiny histogram relation. This is
    also exactly how a 100 TB quality-filter sweep picks per-language
    thresholds ("drop the bottom quartile per lang").

    Semantics: quantile q = the lower edge of the first bin whose
    cumulative count reaches ``ceil(q * n)`` (type-1/inverse-CDF on the
    binned distribution; the rank is computed as ``ceil(q*n - 1e-9)``
    so IEEE slop on 0.9*n can't bump an integral rank up by one). The quality expression reproduces
    :func:`text_stats`'s frozen blend operation-for-operation (same
    round6/epsilon discipline), so both engines bin identically.
    """
    *_, quality = quality_parts()
    # The quality blend is interpreted higher-order-function work, so
    # its cost is per-row CPU in the SCAN stage. A real corpus scan has
    # one split per ~128 MB and parallelizes for free; the test files
    # are single-split, which would serialize the whole evaluation on
    # one core — so only when the input has fewer splits than the
    # cluster has slots, spread the narrow (lang, text) projection
    # first. At scale the guard never fires (splits >> slots) and the
    # plan stays shuffle-free up to the bounded-cardinality aggregate.
    narrow = docs.select("lang", "text")
    slots = docs.sparkSession.sparkContext.defaultParallelism
    if narrow.rdd.getNumPartitions() < slots:
        narrow = narrow.repartition(slots)
    binned = (
        narrow.select(
            F.col("lang"),
            F.floor(quality * QUANTILE_BINS + 1e-9).cast("int").alias("bin"),
        )
        .groupBy("lang", "bin")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )

    from pyspark.sql import Window

    wcum = (
        Window.partitionBy("lang")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("lang")
    hist = binned.withColumn("cum", F.sum("cnt").over(wcum)).withColumn(
        "n_docs", F.sum("cnt").over(wall)
    )
    qs = F.array(*[F.lit(float(q)) for q in QUANTILE_QS])
    return (
        hist.select(
            "lang", "bin", "cnt", "cum", "n_docs", F.explode(qs).alias("q")
        )
        # -1e-9 before ceil: 0.9*n is not exact in IEEE (0.9 has no
        # binary representation), so e.g. 0.9*10 = 9.000000000000002
        # would ceil to 10 — the MAX instead of the type-1 rank 9. The
        # epsilon restores ceil's mathematical value for every q*n whose
        # true value is integral, and never moves a genuinely fractional
        # rank (gaps are >= 0.1 for these q).
        .withColumn("rank", F.ceil(F.col("q") * F.col("n_docs") - 1e-9))
        .filter(
            (F.col("cum") >= F.col("rank"))
            & (F.col("cum") - F.col("cnt") < F.col("rank"))
        )
        .select(
            "lang",
            "q",
            round6_col(F.col("bin") / F.lit(float(QUANTILE_BINS))).alias(
                "quantile_score"
            ),
            "n_docs",
        )
    )


SQL_QUALITY_QUANTILES = rf"""
WITH base AS (
    SELECT lang, {sql_words('text')} AS w FROM documents
),
binned AS (
    SELECT lang,
           CAST(floor({_SQL_QUALITY} * {QUANTILE_BINS} + 1e-9) AS INTEGER)
               AS bin,
           count(*)::BIGINT AS cnt
    FROM base GROUP BY lang, bin
),
hist AS (
    SELECT lang, bin, cnt,
           sum(cnt) OVER (PARTITION BY lang ORDER BY bin
                          ROWS UNBOUNDED PRECEDING)::BIGINT AS cum,
           sum(cnt) OVER (PARTITION BY lang)::BIGINT AS n_docs
    FROM binned
),
q AS (SELECT unnest([{", ".join(f"{x}::DOUBLE" for x in QUANTILE_QS)}]) AS q)
SELECT lang, q,
       round(bin / {float(QUANTILE_BINS)} + 1e-9, 6) AS quantile_score,
       n_docs
FROM hist CROSS JOIN q
WHERE cum >= ceil(q * n_docs - 1e-9) AND cum - cnt < ceil(q * n_docs - 1e-9)
"""
