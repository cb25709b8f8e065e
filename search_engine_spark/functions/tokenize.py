"""Tokenization kernels.

The reference engine uses two *different* tokenizers, and the asymmetry is
load-bearing for scores (SURVEY.md §1.4):

- **Document side** (reference ``src/lib.rs:70-74``): Unicode-whitespace
  split + lowercase; punctuation is retained inside tokens
  (``"chips,"``, ``"halt."``).
- **Query side** (reference ``src/lib.rs:151-157``): regex ``\\w+`` matches
  + lowercase, so punctuation is stripped and ``It's`` -> ``["it", "s"]``.

Each tokenizer has two implementations:

1. A pure-Python kernel (``doc_tokens_py`` / ``query_tokens_py``) with
   exact reference semantics including Unicode whitespace / word chars
   (Python ``str.split()`` == Rust ``split_whitespace`` == split on the
   Unicode White_Space property, dropping empties). These back the
   Arrow-vectorized pandas UDFs and the pytest parity goldens.
2. A JVM-side column expression (``doc_tokens_col`` / ``query_tokens_col``)
   using ``regexp_extract_all`` — byte-identical to the Python kernels on
   ASCII text (Java regex ``\\s``/``\\w`` are ASCII-only by default, Rust's
   are Unicode) and preferred in hot paths because it stays inside
   whole-stage codegen. The engine uses the JVM path for corpus processing
   and the pandas-UDF path only where exact Unicode parity is required.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

# Rust `regex` crate's \w is Unicode-aware; Python re's \w with str is too.
_WORD_RE = re.compile(r"\w+", re.UNICODE)


def doc_tokens_py(text: str | None) -> list[str]:
    """Document tokenizer: Unicode-whitespace split + lowercase.

    Mirrors reference ``src/lib.rs:70-74`` (``split_whitespace`` +
    ``to_lowercase``). Punctuation is retained.
    """
    if text is None:
        return []
    return [t.lower() for t in text.split()]


def query_tokens_py(query: str | None) -> list[str]:
    """Query tokenizer: ``\\w+`` findall + lowercase.

    Mirrors reference ``src/lib.rs:151-157``. Token multiplicity is
    preserved (the reference iterates tokens with multiplicity when
    scoring, ``src/lib.rs:379``).
    """
    if query is None:
        return []
    return [m.group(0).lower() for m in _WORD_RE.finditer(query)]


@F.pandas_udf(ArrayType(StringType()))
def doc_tokens_udf(texts: pd.Series) -> pd.Series:
    """Arrow-vectorized document tokenizer (exact Unicode semantics)."""
    return texts.map(doc_tokens_py)


@F.pandas_udf(ArrayType(StringType()))
def query_tokens_udf(queries: pd.Series) -> pd.Series:
    """Arrow-vectorized query tokenizer (exact Unicode semantics)."""
    return queries.map(query_tokens_py)


def doc_tokens_col(text: Column | str) -> Column:
    """JVM-side document tokenizer: non-whitespace runs of lower(text).

    ``(?U)`` makes Java's ``\\s`` match Unicode whitespace, so this is
    identical to ``doc_tokens_py`` (Python ``str.split`` == Rust
    ``split_whitespace``) on all inputs, not just ASCII — and identical
    to the Arrow kernel's ``utf8_split_whitespace`` used by the map-side
    index build. Stays in whole-stage codegen.
    """
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(F.lower(c), F.lit(r"(?U)[^\s]+"), 0)


def query_tokens_col(query: Column | str) -> Column:
    """JVM-side query tokenizer: ``\\w+`` matches of lower(query)
    (``(?U)``: Unicode word chars, matching Rust's regex ``\\w``)."""
    c = F.col(query) if isinstance(query, str) else query
    return F.regexp_extract_all(F.lower(c), F.lit(r"(?U)\w+"), 0)
