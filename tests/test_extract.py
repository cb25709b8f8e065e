"""HTML body-text extraction goldens (FIXTURES.md §3.1).

The contract is the reference's scraper walk (src/lib.rs:76-93): body text
nodes joined by a single space; script/style text under body included;
comments excluded; entities decoded; implicit body handled.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.functions.extract import (
    extract_html_text,
    extract_text_py,
    extract_text_udf,
)

HTML_CASES = [
    # (case_id, html, expected extracted text)
    ("simple", "<html><body>hello world</body></html>", "hello world"),
    ("no_body_tag", "<html>implicit body text</html>", "implicit body text"),
    ("bare_text", "just plain words", "just plain words"),
    (
        "nested",
        "<body><div>a<p>b</p>c</div><span>d</span></body>",
        "a b c d",
    ),
    (
        "script_in_body_included",
        "<body>pre<script>var x = 1;</script>post</body>",
        "pre var x = 1; post",
    ),
    (
        "style_in_body_included",
        "<body><style>.c{}</style>txt</body>",
        ".c{} txt",
    ),
    ("comment_excluded", "<body>a<!-- hidden -->b</body>", "a b"),
    ("entities", "<body>fish &amp; chips &lt;3</body>", "fish & chips <3"),
    ("empty_body", "<html><body></body></html>", ""),
    (
        "head_excluded",
        "<html><head><title>T</title><style>h{}</style></head><body>B</body></html>",
        "B",
    ),
    (
        "head_excluded_implicit_body",
        "<html><head><title>T</title></head>after head</html>",
        "after head",
    ),
    (
        "text_after_body_close",
        "<html><body>in</body>after</html>",
        "in after",
    ),
    ("unclosed", "<body><div>a<p>b", "a b"),
    (
        "whitespace_nodes_joined",
        "<body>\n  <p>a</p>\n  <p>b</p>\n</body>",
        "\n   a \n   b \n",
    ),
    # --- adversarial goldens, WHATWG tree-construction derived (the
    # algorithm html5ever implements; see _BodyTextParser docstring) ---
    (
        "ws_before_html_ignored",
        "\n  <html><body>x</body></html>",
        "x",
    ),
    (
        "ws_between_head_and_body_not_body",
        "<html><head><title>t</title></head>\n  <body>x</body></html>",
        "x",
    ),
    (
        "implicit_body_strips_leading_ws_of_trigger_text",
        "<html><head></head>\n\nreal text</html>",
        "real text",
    ),
    (
        "script_after_head_goes_to_head",
        "<html><head></head><script>var a=1;</script><body>x</body></html>",
        "x",
    ),
    (
        "style_after_head_goes_to_head",
        "<head></head><style>.c{}</style><body>x</body>",
        "x",
    ),
    (
        "title_after_head_goes_to_head",
        "<head></head><title>T</title><body>x</body>",
        "x",
    ),
    (
        "div_after_head_starts_body_then_ws_kept",
        "<head></head><div>x</div>\n",
        "x \n",
    ),
    (
        "table_foster_parenting_reorders_text",
        "<body>pre<table>mid<tr><td>c</td></tr></table>post</body>",
        "pre mid c post",
    ),
    (
        "table_stray_after_rows_fostered",
        "<body><table><tr><td>cell</td></tr>stray</table>tail</body>",
        "stray cell tail",
    ),
    (
        "table_ws_stays_in_place",
        "<body><table><tr><td>a</td></tr>\n</table></body>",
        "a \n",
    ),
    (
        "misnested_formatting_flat_order",
        "<body><b>a<i>b</b>c</i>d</body>",
        "a b c d",
    ),
    (
        "numeric_charrefs",
        "<body>&#65;&#x42;c</body>",
        "ABc",
    ),
    (
        "legacy_entity_without_semicolon",
        "<body>&copy 2024</body>",
        "© 2024",
    ),
    (
        "unknown_entity_kept_literal",
        "<body>&nosuchentity; here</body>",
        "&nosuchentity; here",
    ),
    (
        "entities_in_script_not_decoded",
        "<body><script>a &amp; b</script></body>",
        "a &amp; b",
    ),
    (
        "text_after_html_close_reparented",
        "<html><body>in</body></html>tail",
        "in tail",
    ),
]


@pytest.mark.parametrize("case_id,html,expected", HTML_CASES)
def test_extract_html(case_id, html, expected):
    assert extract_html_text(html) == expected, case_id


def test_dispatch_txt_verbatim():
    s = "Line one.\nLine two with  double space."
    assert extract_text_py(s, "txt") == s
    assert extract_text_py(s.encode(), "txt") == s


def test_dispatch_unknown_format_skipped():
    # reference skips unsupported extensions (src/main.rs:336-344)
    assert extract_text_py("content", "xml") == ""


def test_extract_udf_matches_kernel(spark):
    rows = [(h.encode(), "html") for _, h, _ in HTML_CASES]
    df = spark.createDataFrame(rows, ["html", "lang"])
    got = [
        r.t
        for r in df.select(
            extract_text_udf(F.col("html"), F.col("lang")).alias("t")
        ).collect()
    ]
    assert got == [e for _, _, e in HTML_CASES]
