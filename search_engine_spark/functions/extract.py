"""Content extraction kernels: HTML body text and JSON flattening.

Reference behavior being reproduced (PUBLIC reference, observed only):

- **HTML** (``src/lib.rs:76-93``): parse the document, select ``body``,
  and for each match concatenate the descendant *text nodes* joined by a
  single space; the resulting string is then tokenized like plain text.
  Notable consequences replicated here:

  * ``<script>``/``<style>`` text under body IS included (the reference's
    ``.text()`` walk does not skip them).
  * Comments are excluded (not text nodes).
  * Entities are decoded (``&amp;`` -> ``&``).
  * Documents without an explicit ``<body>`` still yield their content
    (WHATWG tree construction synthesizes a body); we approximate that
    with a head/body state machine: text outside ``<head>`` (and outside
    head-only elements like ``<title>``) counts as body text.
  * Text nodes are joined by ``" "`` — including whitespace-only nodes —
    so the join is invisible post-tokenization but part of the pinned
    byte-identical ``text`` invariant.

  The parser here is the stdlib ``html.parser`` (no external deps in the
  sandbox); it is not a full WHATWG tree builder, so grotesquely misnested
  markup may diverge from html5ever. The supported envelope is pinned by
  golden tests in ``tests/test_extract.py``.

- **JSON** (``src/lib.rs:95-137``): recursive walk; string values and
  object *keys* are whitespace-split + lowercased into tokens; numbers,
  booleans and null are dropped; malformed JSON yields ``[]``. The
  reference's ``serde_json::Map`` is a BTreeMap, so object keys iterate in
  *sorted* order — replicated via ``sorted(obj.items())``.
"""

from __future__ import annotations

import json
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from .tokenize import doc_tokens_py

# Elements whose text content never becomes body text when they appear in
# <head>. (In body, script/style text IS included, matching the reference.)
_HEAD_ONLY = {"title", "base", "link", "meta"}


class _BodyTextParser(HTMLParser):
    """Collect text nodes that belong to the (possibly implicit) body."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self._in_head = False
        self._saw_body = False
        self._head_closed = False

    def handle_starttag(self, tag, attrs):
        if tag == "head":
            self._in_head = True
        elif tag == "body":
            self._saw_body = True
            self._in_head = False
        elif self._in_head and tag not in _HEAD_ONLY and tag not in (
            "script",
            "style",
            "noscript",
            "template",
        ):
            # A non-head element implicitly closes head (WHATWG "after head").
            self._in_head = False

    def handle_endtag(self, tag):
        if tag == "head":
            self._in_head = False
            self._head_closed = True
        # Text after </body> is reparented into body by spec; keep collecting.

    def handle_data(self, data):
        if self._in_head:
            return
        self.parts.append(data)


def extract_html_text(html: str | bytes | None) -> str:
    """Body text of an HTML document: text nodes joined by a single space.

    Mirrors reference ``src/lib.rs:81-87`` (``Html::parse_document`` +
    ``Selector::parse("body")`` + ``node.text().join(" ")``).
    """
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    p = _BodyTextParser()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass
    return " ".join(p.parts)


def _walk_json(value, out: list[str]) -> None:
    if isinstance(value, str):
        out.extend(t.lower() for t in value.split())
    elif isinstance(value, dict):
        # serde_json::Map is a BTreeMap -> sorted key iteration order.
        for key in sorted(value):
            out.extend(t.lower() for t in key.split())
            _walk_json(value[key], out)
    elif isinstance(value, list):
        for v in value:
            _walk_json(v, out)
    # numbers / booleans / null dropped (src/lib.rs:134-135)


def json_tokens_py(doc: str | None) -> list[str]:
    """Flatten+tokenize a JSON document per reference ``src/lib.rs:95-137``."""
    if doc is None:
        return []
    try:
        parsed = json.loads(doc)
    except Exception:
        return []
    out: list[str] = []
    _walk_json(parsed, out)
    return out


def extract_text_py(content: str | bytes | None, fmt: str | None) -> str:
    """Format-dispatched extraction to a flat text string.

    ``txt`` passes through verbatim; ``html`` extracts body text;
    ``json`` re-joins its token walk with single spaces (the reference
    tokenizes JSON directly — the joined form tokenizes identically).
    Unknown formats yield "" (reference skips unsupported extensions,
    ``src/main.rs:336-344``).
    """
    if content is None:
        return ""
    if isinstance(content, (bytes, bytearray)):
        content = bytes(content).decode("utf-8", errors="replace")
    f = (fmt or "txt").lower()
    if f in ("txt", "text", "plain"):
        return content
    if f in ("html", "htm"):
        return extract_html_text(content)
    if f == "json":
        return " ".join(json_tokens_py(content))
    return ""


@F.pandas_udf(StringType())
def extract_text_udf(content: pd.Series, fmt: pd.Series) -> pd.Series:
    """Arrow-vectorized extraction: (html/text/json content, format) -> text."""
    return pd.Series(
        [extract_text_py(c, f) for c, f in zip(content, fmt)], dtype=object
    )


@F.pandas_udf(ArrayType(StringType()))
def doc_tokens_dispatch_udf(content: pd.Series, fmt: pd.Series) -> pd.Series:
    """Extraction + document tokenization in one kernel (reference
    ``Document::tokenize`` dispatch, ``src/lib.rs:62-68``)."""
    out = []
    for c, f in zip(content, fmt):
        if (f or "txt").lower() == "json":
            out.append(json_tokens_py(c if not isinstance(c, (bytes, bytearray)) else bytes(c).decode("utf-8", "replace")))
        else:
            out.append(doc_tokens_py(extract_text_py(c, f)))
    return pd.Series(out, dtype=object)
