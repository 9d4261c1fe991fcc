"""Adversarial generations through the SPARK plumbing (not just pure fns):
unicode, junk, malformed literals, unknown types — two-stage ground() vs the
pure-python chain built from the reference's own functions."""

from __future__ import annotations

import pytest

from generative_ner_spark.operators import detect
from tests.reference_loop import NAMES2LABELS, REF

ADVERSARIAL = [
    # (text, generated_text)
    ("Alice met Bob", '[("alice", "person"), ("bob", "person")]'),
    ("Alice met Bob", 'preamble line\n[("alice", "person")]\n[]'),
    ("Alice met Bob", '[("alice", "widget")]'),                # unknown type
    ("Alice met Bob", '[("", "person"), ("alice",)]'),          # filtered
    ("Alice met Bob", '[("unterminated", '),                    # parse -> []
    ("東京 と 大阪", '[("東京", "location"), ("大阪", "location")]'),  # CJK
    ("crème brûlée time", '[("crème brûlée", "miscellaneous")]'),  # accents
    ("fun 🎉 party 🎉 here", '[("🎉", "miscellaneous")]'),        # emoji x2
    ("a:b ratio and a:b again", '[("a:b", "miscellaneous")]'),   # ':' survives
    ("nested [brackets] here", '[("brackets", "location")]'),
    ("Alice met Bob", '[1, 2, 3]'),                              # ints -> []
    ("Alice met Bob", '["alice", ("bob", "person")]'),           # mixed types
    ("repeat alice alice alice", '[("alice", "person")]'),       # multi-match
    ("", '[("ghost", "person")]'),                               # empty text
    ("Alice met Bob", ""),                                       # empty gen
]


def _pure_chain(text: str, gen: str) -> set[tuple]:
    """pred.py:43-55 via the reference's extracted functions."""
    spans = set()
    preds = REF.parse_output(gen)
    lowered = text.lower()
    for p in sorted(
        set(preds),
        key=lambda x: (isinstance(x, tuple), x if isinstance(x, tuple) else (x,)),
    ):
        if not isinstance(p, tuple) or len(p) != 2 or p[0] == "":
            continue
        mention, name = p
        label = NAMES2LABELS.get(name, name)
        for s, e in REF.regex(lowered, mention):
            spans.add((s, e, label))
    return spans


def test_adversarial_generations_through_spark(spark):
    rows = [
        (f"e{i}", "d", i, text, gen)
        for i, (text, gen) in enumerate(ADVERSARIAL)
    ]
    gens = spark.createDataFrame(
        rows,
        "example_id string, doc_id string, span_offset int, text string, "
        "generated_text string",
    )
    got: dict[str, set] = {}
    for r in detect.ground(gens).collect():
        got.setdefault(r.example_id, set()).add((r.start, r.end, r.label))
    for i, (text, gen) in enumerate(ADVERSARIAL):
        want = _pure_chain(text, gen)
        assert got.get(f"e{i}", set()) == want, (
            f"case {i}: text={text!r} gen={gen!r}: "
            f"{got.get(f'e{i}', set())} != {want}"
        )


def test_mention_norm_unicode_roundtrip(spark):
    """mention_norm stays consistent with normalize_answer for unicode."""
    rows = [("e0", "d", 0, "crème brûlée time", '[("crème brûlée", "miscellaneous")]')]
    gens = spark.createDataFrame(
        rows,
        "example_id string, doc_id string, span_offset int, text string, "
        "generated_text string",
    )
    out = detect.ground(gens).collect()
    assert len(out) == 1
    assert out[0].mention_norm == REF.normalize_answer("crème brûlée")
