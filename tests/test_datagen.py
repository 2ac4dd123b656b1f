"""Corpus generator invariants (FIXTURES.md §1)."""

from __future__ import annotations

import collections

from qalsh_spark.datagen import generate_corpus
from qalsh_spark.functions.signatures import extract_text_bytes


def test_deterministic():
    c1 = generate_corpus(200, seed=7)
    c2 = generate_corpus(200, seed=7)
    assert c1.urls == c2.urls and c1.text == c2.text and c1.html == c2.html


def test_extraction_byte_identical_per_url():
    """The input_hint per-row invariant: extracted text == stored text."""
    c = generate_corpus(300)
    for i in range(len(c.urls)):
        assert extract_text_bytes(c.html[i]) == c.text[i], c.urls[i]


def test_class_fractions():
    c = generate_corpus(3000)
    frac = collections.Counter(c.gold_class)
    n = len(c.gold_class)
    assert 0.50 <= frac["unique"] / n <= 0.70
    assert 0.05 <= frac["exact"] / n <= 0.15
    assert 0.10 <= frac["near_minhash"] / n <= 0.20
    assert frac["boilerplate"] / n >= 0.02
    assert frac["substring"] / n >= 0.02
    assert frac["near_simhash"] / n >= 0.02


def test_planted_structure():
    c = generate_corpus(500)
    # exact dups really are byte-identical; near dups are not
    by_cluster = collections.defaultdict(list)
    for i, g in enumerate(c.gold_cluster):
        by_cluster[int(g)].append(i)
    saw_exact = saw_near = False
    for mem in by_cluster.values():
        if len(mem) < 2:
            continue
        klass = c.gold_class[mem[1]]
        if klass == "exact":
            assert c.text[mem[0]] == c.text[mem[1]]
            saw_exact = True
        elif klass == "near_minhash":
            assert c.text[mem[0]] != c.text[mem[1]]
            saw_near = True
    assert saw_exact and saw_near
    # urls are unique (primary key)
    assert len(set(c.urls)) == len(c.urls)
