"""Vectorized rolling hash == scalar reference, bit-exact, including
the awkward shapes (empty docs, repeated/leading/trailing separators,
multi-byte UTF-8, batch-position effects from empty docs between real
ones)."""

from __future__ import annotations

import random

from rse_spark.functions.textstats import (
    rolling_hash_batch,
    rolling_hash_ref,
)

EDGE = [
    "", None, "a", "hello world", "the  double  space", " lead",
    "trail ", "  ", " ", "üñïçødé tøkens here", "x" * 500,
    "a b", "ab", " a  b  c ",
]

# golden values pin the hash function itself (any change to base/mod/
# token rules must be deliberate — stored fingerprints depend on it)
GOLDEN = {
    "hello world": 30857044489749168,
    "a b": 97000389,
    "": 0,
}


def test_golden_values():
    for text, want in GOLDEN.items():
        assert rolling_hash_ref(text) == want
    got = rolling_hash_batch(list(GOLDEN))
    assert [int(g) for g in got] == list(GOLDEN.values())


def test_edge_cases_match_ref():
    got = rolling_hash_batch(EDGE)
    for text, g in zip(EDGE, got):
        assert int(g) == rolling_hash_ref(text), repr(text)


def test_random_parity():
    rng = random.Random(7)
    cases = []
    for _ in range(400):
        n = rng.randint(0, 50)
        cases.append(
            " ".join(
                "".join(
                    rng.choices("abcdefghijklmnopqrstuvwxyz0123456789",
                                k=rng.randint(0, 15))
                )
                for _ in range(n)
            )
        )
    # sprinkle empties between real docs: duplicate doc-start positions
    cases = cases[:3] + ["", ""] + cases[3:] + [""]
    got = rolling_hash_batch(cases)
    for text, g in zip(cases, got):
        assert int(g) == rolling_hash_ref(text), repr(text)[:60]
