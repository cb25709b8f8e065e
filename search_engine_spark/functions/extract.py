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

# Elements allowed in <head>; any other start tag while in head implies
# </head> + <body> (WHATWG "in head" anything-else -> "after head" ->
# "in body"). In body, script/style text IS included, matching the
# reference's .text() walk.
_HEAD_ELEMENTS = {
    "title", "base", "link", "meta", "script", "style", "noscript", "template",
}
# Raw/RCDATA head elements: when one appears between </head> and <body>,
# the spec reprocesses it "using the rules for in head" — its content
# lands in HEAD, not body (html5ever does exactly this).
_HEAD_RAW = {"title", "script", "style", "noscript", "template"}
_WS = " \t\n\f\r"  # WHATWG whitespace


class _BodyTextParser(HTMLParser):
    """Collect text nodes that belong to the (possibly implicit) body,
    following WHATWG tree construction (what html5ever implements) for
    the placements that change .text() output:

    - whitespace before <html>/<head> is ignored; whitespace between
      </head> and <body> goes into the html element — neither is body
      text ("before html"/"before head"/"after head" whitespace rules);
    - a non-whitespace character in "after head" creates the body; only
      the characters FROM the first non-whitespace one land in body;
    - head-ish elements (script/style/title/...) between </head> and
      <body> are reprocessed into head — excluded;
    - non-whitespace text directly inside table context (not in a
      cell/caption) is FOSTER-PARENTED before the table element, which
      reorders it ahead of the table's cell text in .text() order;
      whitespace-only table text stays put ("in table text" rules);
    - text after </body> / </html> is reparented into body — included.

    Adversarial placements are pinned by goldens in
    tests/test_extract.py (derived from the WHATWG algorithm; the
    sandbox cannot build the reference's html5ever to probe directly —
    no network for cargo — so the spec html5ever implements is the
    authority used).
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self._in_head = False
        self._body_started = False
        self._suppress_raw: str | None = None  # head-ish elt before body
        # open tables: [foster_insert_idx | None] — None marks "in cell"
        self._table_stack: list[list] = []

    # -- helpers -----------------------------------------------------------

    def _start_body(self) -> None:
        self._body_started = True
        self._in_head = False

    def _in_table_context(self) -> bool:
        return bool(self._table_stack) and self._table_stack[-1][0] == "table"

    # -- HTMLParser hooks --------------------------------------------------

    def handle_starttag(self, tag, attrs):
        if self._suppress_raw is not None:
            return
        if tag == "html":
            return
        if tag == "head":
            self._in_head = True
            return
        if tag == "body":
            self._start_body()
            return
        if self._in_head:
            if tag not in _HEAD_ELEMENTS:
                # non-head element implies </head><body> ("after head")
                self._start_body()
            else:
                return
        elif not self._body_started:
            if tag in _HEAD_ELEMENTS:
                # reprocessed into head ("after head" head-element rule)
                if tag in _HEAD_RAW:
                    self._suppress_raw = tag
                return
            self._start_body()
        # table bookkeeping (affects text ORDER via foster parenting)
        if tag == "table":
            self._table_stack.append(["table", len(self.parts)])
        elif tag in ("td", "th", "caption"):
            if self._table_stack:
                if self._table_stack[-1][0] == "cell":
                    self._table_stack.pop()  # implied </td>
                self._table_stack.append(["cell", None])
        elif tag == "tr" and self._table_stack:
            if self._table_stack[-1][0] == "cell":
                self._table_stack.pop()  # implied cell close at new row

    def handle_endtag(self, tag):
        if self._suppress_raw is not None:
            if tag == self._suppress_raw:
                self._suppress_raw = None
            return
        if tag == "head":
            self._in_head = False
        elif tag == "table":
            while self._table_stack:
                kind = self._table_stack.pop()[0]
                if kind == "table":
                    break
        elif tag in ("td", "th", "caption"):
            if self._table_stack and self._table_stack[-1][0] == "cell":
                self._table_stack.pop()
        # Text after </body>/</html> is reparented into body; keep collecting.

    def handle_data(self, data):
        if self._suppress_raw is not None or self._in_head:
            return
        if not self._body_started:
            stripped = data.lstrip(_WS)
            if not stripped:
                # pure whitespace before body -> html element / ignored
                return
            # only the chars from the first non-ws one enter the body
            data = stripped
            self._start_body()
        if self._in_table_context() and data.strip(_WS):
            # foster-parent: non-ws table text is inserted BEFORE the table
            entry = self._table_stack[-1]
            pos = entry[1]
            self.parts.insert(pos, data)
            for e in self._table_stack:
                if e[0] == "table" and e[1] >= pos:
                    e[1] += 1
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
