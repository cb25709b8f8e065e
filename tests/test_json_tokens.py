"""JSON flatten+tokenize goldens (reference src/lib.rs:95-137; FIXTURES.md §3.3).

String values and object keys tokenized; numbers/bools/null dropped;
malformed -> []; object keys iterate in sorted order (serde_json's default
Map is a BTreeMap).
"""

from __future__ import annotations

import pytest

from search_engine_spark.functions.extract import json_tokens_py

CASES = [
    ("flat_string", '"Hello World"', ["hello", "world"]),
    (
        "object_keys_tokenized",
        '{"First Key": "a value", "second": "b"}',
        ["first", "key", "a", "value", "second", "b"],
    ),
    (
        "sorted_key_order",
        '{"zeta": "z", "alpha": "a"}',
        ["alpha", "a", "zeta", "z"],
    ),
    (
        "nested",
        '{"outer": {"inner key": "deep value"}}',
        ["outer", "inner", "key", "deep", "value"],
    ),
    ("array", '["one two", "three"]', ["one", "two", "three"]),
    (
        "scalars_dropped",
        '{"n": 42, "b": true, "x": null, "s": "kept"}',
        ["b", "n", "s", "kept", "x"],
    ),
    ("malformed", '{"unterminated": ', []),
    ("number_root", "17", []),
    (
        "mixed_array",
        '[1, "word", false, {"k v": 2}]',
        ["word", "k", "v"],
    ),
]


@pytest.mark.parametrize("case_id,doc,expected", CASES)
def test_json_tokens(case_id, doc, expected):
    assert json_tokens_py(doc) == expected, case_id
