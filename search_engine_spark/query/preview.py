"""Document retrieval and result previews.

Reference surfaces re-expressed (the two "missing user features" a
reference user would reach for first):

- ``get_document_by_id`` (``/root/reference/src/lib.rs:368-371``): the
  global DOCUMENTS HashMap lookup becomes a filter on the pages table —
  the table IS the document store (SURVEY.md §1.1).
- The top-10 display with each document's first 5 lines
  (``/root/reference/src/lib.rs:229-268``, Display for QueryResult):
  a broadcast join of the (tiny) result set back to pages plus a
  line-slice expression. The reference prints ``\\t<line>`` per line and
  ``(Showing first 5 lines of document)``; here the preview is returned
  as a column so any sink can render it.

Scale note: results are k rows per query — the join back to pages is a
broadcast of the results side into the pages scan; with the pages table
partitioned/bucketed by url this is a pruned point-lookup scan, never a
full-corpus join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PREVIEW_LINES = 5  # reference shows the first 5 lines (src/lib.rs:249-256)


def get_document(pages: DataFrame, url: str) -> DataFrame:
    """Point lookup of one document by url — the reference's
    ``get_document_by_id``. Returns (url, text) with 0 or 1 rows."""
    return pages.select("url", "text").filter(F.col("url") == url)


def preview_column(text: F.Column | str, n_lines: int = PREVIEW_LINES) -> F.Column:
    """First ``n_lines`` lines of ``text``, newline-joined."""
    c = F.col(text) if isinstance(text, str) else text
    return F.concat_ws("\n", F.slice(F.split(c, "\n"), 1, n_lines))


def preview_results(
    results: DataFrame, pages: DataFrame, n_lines: int = PREVIEW_LINES
) -> DataFrame:
    """(query_id, rank, url, score, preview) — ranked results joined back
    to the corpus for display, reference Display-format semantics."""
    joined = F.broadcast(results).join(
        pages.select("url", "text"), "url", "left"
    )
    return joined.select(
        "query_id",
        "rank",
        "url",
        "score",
        preview_column("text", n_lines).alias("preview"),
    ).orderBy("query_id", "rank")
