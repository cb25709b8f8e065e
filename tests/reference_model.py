"""Pure-Python executable model of the reference engine's semantics.

Used as the oracle for e2e parity tests: an independent, direct
transliteration of the *observed behavior* (not the code) of
``SearchLibrary`` (reference src/lib.rs:341-411) — per-occurrence posting
lists, tf-sum scoring with query-token multiplicity — plus the BM25 spec
pinned in SURVEY.md §7.3. Deterministic tie-break (score DESC, url ASC)
is imposed on both model and engine, replacing the reference's
HashMap-nondeterministic tie order (SURVEY.md §1.4.6).
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from search_engine_spark.functions.tokenize import doc_tokens_py, query_tokens_py


def build_model_index(docs: dict[str, str]):
    """docs: url -> text. Returns (postings, doc_lengths).

    postings: term -> {url: tf}; mirrors the reference's per-occurrence
    Vec<doc_id> with counts instead of duplicates.
    """
    postings: dict[str, dict[str, int]] = defaultdict(lambda: defaultdict(int))
    dl: dict[str, int] = {}
    for url, text in docs.items():
        toks = doc_tokens_py(text)
        dl[url] = len(toks)
        for t in toks:
            postings[t][url] += 1
    return postings, dl


def tfsum_search(postings, query: str, k: int = 10):
    """Reference search(): sum tf over query-token occurrences; top-k."""
    scores: Counter = Counter()
    for tok in query_tokens_py(query):  # multiplicity preserved
        for url, tf in postings.get(tok, {}).items():
            scores[url] += tf
    ranked = sorted(scores.items(), key=lambda x: (-x[1], x[0]))
    return ranked[:k]


def bm25_search(postings, dl, query: str, k: int = 10, k1: float = 1.2, b: float = 0.75):
    n = len(dl)
    avgdl = sum(dl.values()) / n if n else 1.0
    qtf = Counter(query_tokens_py(query))
    scores: dict[str, float] = defaultdict(float)
    for tok, qn in qtf.items():
        plist = postings.get(tok)
        if not plist:
            continue
        df = len(plist)
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        for url, tf in plist.items():
            norm = tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl[url] / avgdl))
            scores[url] += qn * idf * norm
    # Engine convention: rank on the 6dp-rounded score (see query/scoring.py)
    ranked = sorted(
        ((u, round(s, 6)) for u, s in scores.items()),
        key=lambda x: (-x[1], x[0]),
    )
    return ranked[:k]
