"""Web-crawl consolidation + PII scrubbing over the canonical pages shape.

The north-rule input is a Common-Crawl-style pages table
``(url, warc_ts, html, text, lang)`` where the same url is captured many
times across crawls. Two operators a web-text pipeline runs before
anything else touch exactly that shape:

- **latest_capture**: collapse the multi-capture history to one row per
  url — the newest snapshot wins — plus capture-history stats. This is
  the crawl-merge every Common-Crawl consumer performs (CC-MAIN dumps
  overlap ~30-60% url-wise between monthly crawls).
- **pii_scrub**: redact emails / phone numbers / IPv4 addresses with
  typed placeholder tokens and count what was removed — the standard
  pre-training scrub pass.

Both are oracle-gated against DuckDB on a deterministic multi-capture /
PII-injected corpus derived from the driver's ``documents`` table (the
driver corpus is synthetic word soup with no real urls or PII, so the
gate synthesizes both IN THE QUERY, identically on the Spark and SQL
sides — the same convention the multimodal and contamination gates use).

Scale notes (100 TB):

- ``latest_capture`` is ONE hash aggregate on url: ``max_by`` carries a
  constant-width (ts, hash, length) struct through map-side partial
  aggregation, so the Exchange moves one small row per distinct url per
  map partition — never the page bodies themselves. No window, no sort,
  no join. At 10^12 captures / ~10^11 distinct urls this is the minimal
  crawl-merge shape (bodies are pruned before the shuffle because only
  hash/length are aggregated; a variant that must keep the winning body
  shuffles (url, ts, body) once, still one Exchange).
- ``pii_scrub`` is a pure per-row projection — zero Exchange
  (plan-asserted in tests/test_pipeline_units.py), all JVM ``regexp_*``
  expressions inside whole-stage codegen. No Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# --- deterministic multi-capture synthesis --------------------------------
# Capture 0: every document, at us = doc_id * 1e6 (microseconds since the
# synthetic crawl epoch). Re-crawls at +1e12 us (every 3rd url, body
# appended with ' updated') and +2e12 us (every 9th url, ' updated twice').
# Pure integer-microsecond arithmetic: both engines compute identical
# values with no timezone in sight (timestamps materialize Spark-side only
# for the pages-shaped intermediate).

_RECRAWL_1_US = 1_000_000_000_000
_RECRAWL_2_US = 2_000_000_000_000


def multi_capture_pages(docs: DataFrame) -> DataFrame:
    """(url, warc_us, warc_ts, text) — deterministic multi-capture crawl
    derived from the documents table; ~1.44 captures per url."""
    did = F.col("doc_id").cast("long")
    base_us = did * 1_000_000

    def cap(filter_mod: int | None, extra_us: int, suffix: str) -> DataFrame:
        d = docs if filter_mod is None else docs.filter(did % filter_mod == 0)
        us = (base_us + F.lit(extra_us)).cast("long")
        return d.select(
            F.concat(F.lit("doc://"), did.cast("string")).alias("url"),
            us.alias("warc_us"),
            F.timestamp_micros(us).alias("warc_ts"),
            F.concat(F.col("text"), F.lit(suffix)).alias("text"),
        )

    return (
        cap(None, 0, "")
        .unionAll(cap(3, _RECRAWL_1_US, " updated"))
        .unionAll(cap(9, _RECRAWL_2_US, " updated twice"))
    )


def latest_capture(captures: DataFrame) -> DataFrame:
    """(url, n_captures, first_us, latest_us, latest_chars,
    latest_text_hash) — one row per url, newest capture wins.

    One hash aggregate: ``max_by`` over (hash, length) keyed on warc_us.
    Capture timestamps are unique per url by construction (real crawls
    guarantee this per WARC record), so ``max_by`` is deterministic.
    """
    return captures.groupBy("url").agg(
        F.count(F.lit(1)).cast("long").alias("n_captures"),
        F.min("warc_us").cast("long").alias("first_us"),
        F.max("warc_us").cast("long").alias("latest_us"),
        F.max_by(F.length("text"), F.col("warc_us"))
        .cast("long")
        .alias("latest_chars"),
        F.max_by(F.md5(F.encode(F.col("text"), "utf-8")), F.col("warc_us")).alias(
            "latest_text_hash"
        ),
    )


SQL_LATEST_CAPTURE = f"""
WITH captures AS (
    SELECT 'doc://' || doc_id::VARCHAR AS url,
           (doc_id * 1000000)::BIGINT AS warc_us, text
    FROM documents
    UNION ALL
    SELECT 'doc://' || doc_id::VARCHAR,
           (doc_id * 1000000 + {_RECRAWL_1_US})::BIGINT, text || ' updated'
    FROM documents WHERE doc_id % 3 = 0
    UNION ALL
    SELECT 'doc://' || doc_id::VARCHAR,
           (doc_id * 1000000 + {_RECRAWL_2_US})::BIGINT,
           text || ' updated twice'
    FROM documents WHERE doc_id % 9 = 0
)
SELECT url,
       count(*)::BIGINT AS n_captures,
       min(warc_us)::BIGINT AS first_us,
       max(warc_us)::BIGINT AS latest_us,
       length(arg_max(text, warc_us))::BIGINT AS latest_chars,
       md5(arg_max(text, warc_us)) AS latest_text_hash
FROM captures
GROUP BY url
"""


# --- PII scrubbing ---------------------------------------------------------
# Regexes restricted to the RE2 ∩ java.util.regex common subset (no
# backrefs, no lookaround) so both engines match byte-identically.

EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PHONE_RE = r"\+1-555-[0-9]{4}"
IP_RE = r"10\.0\.[0-9]{1,3}\.[0-9]{1,3}"


def inject_pii(docs: DataFrame) -> DataFrame:
    """(doc_id, text) with deterministic synthetic PII appended: every
    7th doc gains an email + phone, every 11th an internal IPv4."""
    did = F.col("doc_id").cast("long")
    with_contact = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        did.cast("string"),
        F.lit("@example.com or +1-555-"),
        F.lpad((did % 10_000).cast("string"), 4, "0"),
    )
    with_ip = F.concat(
        F.lit(" host 10.0."),
        (did % 256).cast("string"),
        F.lit("."),
        (did % 100).cast("string"),
    )
    text = F.when(did % 7 == 0, with_contact).otherwise(F.col("text"))
    text = F.when(did % 11 == 0, F.concat(text, with_ip)).otherwise(text)
    return docs.select(did.alias("doc_id"), text.alias("text"))


def pii_scrub(docs_with_pii: DataFrame) -> DataFrame:
    """(doc_id, n_emails, n_phones, n_ips, scrubbed_chars, scrubbed_hash)
    — redaction counts + a hash of the scrubbed body.

    Replacement order matters only in theory (the three patterns are
    disjoint by construction of valid emails/phones/IPs); fixed as
    email -> phone -> ip on both sides.
    """
    t = F.col("text")
    n_emails = F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), 0))
    n_phones = F.size(F.regexp_extract_all(t, F.lit(PHONE_RE), 0))
    n_ips = F.size(F.regexp_extract_all(t, F.lit(IP_RE), 0))
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
        ),
        IP_RE,
        "<IP>",
    )
    return docs_with_pii.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        n_emails.cast("long").alias("n_emails"),
        n_phones.cast("long").alias("n_phones"),
        n_ips.cast("long").alias("n_ips"),
        F.length(scrubbed).cast("long").alias("scrubbed_chars"),
        F.md5(F.encode(scrubbed, "utf-8")).alias("scrubbed_hash"),
    )


SQL_PII_SCRUB = f"""
WITH injected AS (
    SELECT doc_id::BIGINT AS doc_id,
           CASE WHEN doc_id % 7 = 0 THEN
               text || ' contact user' || doc_id::VARCHAR
                    || '@example.com or +1-555-'
                    || lpad((doc_id % 10000)::VARCHAR, 4, '0')
           ELSE text END
           || CASE WHEN doc_id % 11 = 0 THEN
               ' host 10.0.' || (doc_id % 256)::VARCHAR
                    || '.' || (doc_id % 100)::VARCHAR
           ELSE '' END AS text
    FROM documents
)
SELECT doc_id,
       len(regexp_extract_all(text, '{EMAIL_RE}'))::BIGINT AS n_emails,
       len(regexp_extract_all(text, '{PHONE_RE}'))::BIGINT AS n_phones,
       len(regexp_extract_all(text, '{IP_RE}'))::BIGINT AS n_ips,
       length(regexp_replace(regexp_replace(regexp_replace(
           text, '{EMAIL_RE}', '<EMAIL>', 'g'),
           '{PHONE_RE}', '<PHONE>', 'g'),
           '{IP_RE}', '<IP>', 'g'))::BIGINT AS scrubbed_chars,
       md5(regexp_replace(regexp_replace(regexp_replace(
           text, '{EMAIL_RE}', '<EMAIL>', 'g'),
           '{PHONE_RE}', '<PHONE>', 'g'),
           '{IP_RE}', '<IP>', 'g')) AS scrubbed_hash
FROM injected
"""


# --- canonical URL normalization -------------------------------------------
# Every pattern below is in the RE2 / java.util.regex common subset and
# every regexp_replace uses a LITERAL replacement (no capture refs — Spark
# spells them $1, DuckDB \1, so the shared-SQL discipline forbids them).

_FRAGMENT_RE = r"#.*$"
_BASE_RE = r"^([^?]*)"                   # everything before the first '?'
_QUERY_RE = r"^[^?]*\?(.*)$"             # everything after it
# The query string is cleaned with a literal '&' PREPENDED first, so
# every parameter — including the leading one — is '&'-anchored and a
# non-tracking param that merely ends in "utm_..." (myutm_x=2) can
# never match. '&' in the PATH is untouched because only the extracted
# query part is rewritten (RFC 3986 allows '&' as a path sub-delim).
_UTM_PARAM_RE = r"&utm_[a-z]+=[^&]*"
_LEAD_AMP_RE = r"^&"
_SPLIT_RE = r"^([a-zA-Z]+)://([^/?#]+)(.*)$"


def url_normalize(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """Adds ``url_norm``: the canonical form of ``url_col`` —
    fragment stripped, ``utm_*`` tracking params removed (dangling
    ``?``/``&`` cleaned), scheme and host lowercased, default ports
    (``:80`` for http, ``:443`` for https) dropped, empty path
    normalized to ``/``.

    This is the aliasing collapse every crawl consolidation runs
    BEFORE :func:`latest_capture` — without it the same page appears
    under mixed-case hosts / tracking-tagged links and the per-url
    merge under-counts captures.

    Scale shape: a pure per-row projection of JVM ``regexp_*`` /
    ``lower`` / ``concat`` expressions — zero Exchange, whole-stage
    codegen, no Python. The identical operation sequence is expressed
    in shared-syntax SQL (no capture-group replacements), so the
    DuckDB oracle reproduces it byte-for-byte.
    """
    u = F.regexp_replace(F.col(url_col), _FRAGMENT_RE, "")
    # split base / query at the first '?', clean ONLY the query part
    base = F.regexp_extract(u, _BASE_RE, 1)
    query = F.regexp_extract(u, _QUERY_RE, 1)
    qclean = F.regexp_replace(
        F.regexp_replace(
            F.concat(F.lit("&"), query), _UTM_PARAM_RE, ""
        ),
        _LEAD_AMP_RE,
        "",
    )
    u = F.when(qclean == "", base).otherwise(
        F.concat(base, F.lit("?"), qclean)
    )
    scheme = F.lower(F.regexp_extract(u, _SPLIT_RE, 1))
    auth = F.lower(F.regexp_extract(u, _SPLIT_RE, 2))
    rest = F.regexp_extract(u, _SPLIT_RE, 3)
    auth = F.when(scheme == "http", F.regexp_replace(auth, r":80$", "")) \
        .when(scheme == "https", F.regexp_replace(auth, r":443$", "")) \
        .otherwise(auth)
    rest = F.when(rest == "", F.lit("/")).otherwise(rest)
    # URLs that don't match scheme://authority (scheme-less
    # 'example.com/x', protocol-relative '//host/path', mailto:, data:)
    # pass through with only fragment/utm cleaning — re-assembling them
    # from empty extracts would collapse all of them to ':///'.
    return pages.withColumn(
        "url_norm",
        F.when(scheme == "", u).otherwise(
            F.concat(scheme, F.lit("://"), auth, rest)
        ),
    )


def synth_messy_urls(docs: DataFrame) -> DataFrame:
    """(url,) — deterministic alias soup derived from doc_ids: every doc
    yields its canonical url; every even doc an upper-cased
    default-port tracking-tagged variant; every 3rd doc a
    middle-position-utm variant. All aliases of one doc normalize to
    the same canonical form (the gate's invariant)."""
    did = F.col("doc_id").cast("long")
    host = F.concat(F.lit("www.example"), (did % 100).cast("string"),
                    F.lit(".com"))
    path = F.concat(F.lit("/p/"), did.cast("string"))
    qid = F.concat(F.lit("?id="), did.cast("string"))
    canonical = F.concat(F.lit("http://"), host, path, qid)
    v1 = F.concat(
        F.lit("HTTP://"), F.upper(host), F.lit(":80"), path, qid,
        F.lit("&utm_source=feed#frag"),
    )
    v2 = F.concat(
        F.lit("http://"), host, F.lit(":80"), path,
        F.lit("?utm_campaign=x&id="), did.cast("string"),
    )
    return (
        docs.select(canonical.alias("url"))
        .unionAll(docs.filter(did % 2 == 0).select(v1.alias("url")))
        .unionAll(docs.filter(did % 3 == 0).select(v2.alias("url")))
    )


def url_canonical(docs: DataFrame) -> DataFrame:
    """(url_norm, n_aliases, sample_url) — the consolidation measure:
    how many raw crawl urls collapse onto each canonical form (one
    bounded hash aggregate after the per-row normalization)."""
    normed = url_normalize(synth_messy_urls(docs))
    return normed.groupBy("url_norm").agg(
        F.count(F.lit(1)).cast("long").alias("n_aliases"),
        F.min("url").alias("sample_url"),
    )


_SQL_URL_NORM = f"""
defrag AS (
    SELECT url, regexp_replace(url, '{_FRAGMENT_RE}', '') AS u FROM raw
),
qsplit AS (
    SELECT url,
           regexp_extract(u, '{_BASE_RE}', 1) AS base,
           regexp_replace(
               regexp_replace('&' || regexp_extract(u, '{_QUERY_RE}', 1),
                              '{_UTM_PARAM_RE}', '', 'g'),
               '{_LEAD_AMP_RE}', '') AS qclean
    FROM defrag
),
norm0 AS (
    SELECT url,
           CASE WHEN qclean = '' THEN base
                ELSE base || '?' || qclean END AS u
    FROM qsplit
),
parts AS (
    SELECT url, u,
           lower(regexp_extract(u, '{_SPLIT_RE}', 1)) AS scheme,
           lower(regexp_extract(u, '{_SPLIT_RE}', 2)) AS auth,
           regexp_extract(u, '{_SPLIT_RE}', 3) AS rest
    FROM norm0
),
normed AS (
    SELECT url,
           CASE WHEN scheme = '' THEN u
                ELSE scheme || '://'
                     || CASE WHEN scheme = 'http'
                             THEN regexp_replace(auth, ':80$', '')
                             WHEN scheme = 'https'
                             THEN regexp_replace(auth, ':443$', '')
                             ELSE auth END
                     || CASE WHEN rest = '' THEN '/' ELSE rest END
           END AS url_norm
    FROM parts
)"""

SQL_URL_CANONICAL = f"""
WITH raw AS (
    SELECT 'http://www.example' || (doc_id % 100)::VARCHAR || '.com/p/'
           || doc_id::VARCHAR || '?id=' || doc_id::VARCHAR AS url
    FROM documents
    UNION ALL
    SELECT 'HTTP://' || upper('www.example' || (doc_id % 100)::VARCHAR
           || '.com') || ':80/p/' || doc_id::VARCHAR || '?id='
           || doc_id::VARCHAR || '&utm_source=feed#frag'
    FROM documents WHERE doc_id % 2 = 0
    UNION ALL
    SELECT 'http://www.example' || (doc_id % 100)::VARCHAR || '.com:80/p/'
           || doc_id::VARCHAR || '?utm_campaign=x&id=' || doc_id::VARCHAR
    FROM documents WHERE doc_id % 3 = 0
),
{_SQL_URL_NORM}
SELECT url_norm, count(*)::BIGINT AS n_aliases, min(url) AS sample_url
FROM normed
GROUP BY url_norm
"""
