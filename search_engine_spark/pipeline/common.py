"""Shared kernels for the training-data pipeline operators.

Everything here exists twice — once as a Spark Column expression and once
as a DuckDB SQL fragment — and the two must be value-identical, because
the driver's correctness gate hashes both sides' outputs. The portable
primitives:

- **word tokens**: ``regexp_extract_all(lower(text), '\\w+')``. Java and
  DuckDB (RE2) ``\\w`` agree on ASCII; the driver corpus is ASCII.
- **hash60**: first 15 hex chars of md5, read as a base-16 integer —
  a 60-bit deterministic hash available in both engines (md5 is
  bit-identical everywhere; 15 hex chars always fit in a signed int64).
  Verified equal across engines in tests/test_pipeline_units.py.
- **word shingles**: positional 3-gram join of the token array.

Scale notes (100 TB): every operator built on these stays in Spark
whole-stage codegen (regexp/md5/conv/higher-order array functions are all
JVM expressions — no Python in the hot path). Hash-based operators need
no global state, so they partition trivially by document.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SHINGLE_W = 3  # word n-gram width for near-dup shingling


def words_col(c: Column | str) -> Column:
    """``\\w+`` tokens of lower(text) — the pipeline-side word tokenizer."""
    c = F.col(c) if isinstance(c, str) else c
    return F.regexp_extract_all(F.lower(c), F.lit(r"\w+"), 0)


def hash60_col(c: Column) -> Column:
    """60-bit integer hash: int(md5(x)[:15], 16). Portable across engines."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def positional_ngrams(words: Column, n: int) -> Column:
    """Positional word n-grams (space-joined), length max(len - n + 1, 0).

    Built with zip_with over k-shifted slices so ``words`` only ever
    appears in ARGUMENT position. This matters enormously: a
    ``transform(sequence(1, len-n+1), i -> element_at(words, i) ...)``
    formulation references ``words`` inside the lambda body, and
    Catalyst inlines (never materializes) the referenced expression —
    the tokenizer regex would re-run for every gram, O(len^2) per
    document (measured as the dominant cost of every shingle-based
    operator). Arguments are evaluated once per row. zip_with pads the
    shorter side with null and concat_ws skips nulls, so the last n-1
    entries are partial grams — sliced off.
    """
    if n < 1:
        raise ValueError("n-gram width must be >= 1")
    sz = F.size(words)
    acc = words
    for k in range(1, n):
        acc = F.zip_with(
            acc,
            F.slice(words, k + 1, F.greatest(sz - k, F.lit(0))),
            lambda x, y: F.concat_ws(" ", x, y),
        )
    return F.slice(acc, 1, F.greatest(sz - (n - 1), F.lit(0)))


def positional_grams(words: Column) -> Column:
    """Positional word 3-grams (space-joined) — the near-dup shingle width."""
    return positional_ngrams(words, SHINGLE_W)


def shingles_col(words: Column) -> Column:
    """Distinct word 3-grams of a token array (space-joined).

    Empty when the document has fewer than 3 tokens — same convention on
    the SQL side (range() yields no positions).
    """
    return F.array_distinct(positional_grams(words))


def round6_col(c: Column) -> Column:
    """Round to 6dp with a pre-round epsilon.

    Spark's round() on double goes through the shortest decimal repr with
    HALF_UP; DuckDB rounds the binary value — they disagree exactly on
    half-way decimals (e.g. 0.2541825). Nudging by 1e-9 on BOTH sides
    moves every value off the tie, making the engines agree bit-for-bit.
    """
    return F.round(c + F.lit(1e-9), 6)


def sql_round6(x: str) -> str:
    return f"round(({x}) + 1e-9, 6)"


# --- DuckDB SQL fragments (oracle side) -----------------------------------

SQL_HASH60 = "(('0x' || substr(md5({x}), 1, 15))::BIGINT)"


def sql_hash60(x: str) -> str:
    return SQL_HASH60.format(x=x)


SQL_WORDS = r"regexp_extract_all(lower({x}), '\w+')"


def sql_words(x: str) -> str:
    return SQL_WORDS.format(x=x)


def sql_shingles(w: str) -> str:
    """Distinct word 3-grams of a token-list expression ``w`` (1-based)."""
    return (
        f"list_distinct(list_transform(range(1, greatest(len({w}) - 1, 1)), "
        f"i -> {w}[i] || ' ' || {w}[i+1] || ' ' || {w}[i+2]))"
    )
