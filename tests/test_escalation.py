"""Multi-band escalation (virtual-rehashing analog,
/root/reference/methods/qalsh.h:844-871): pairs with Jaccard just above the
verify threshold sit where the first-pass banding S-curve still misses ~10%
of discoveries; the coarser-band second pass over unmatched docs must
recover them.  Truth is exact NumPy Jaccard over the shared kernels.
"""

from __future__ import annotations

import time

import numpy as np
import pytest

from qalsh_spark import kernels as K
from qalsh_spark.config import DedupConfig
from qalsh_spark.plans.pipeline import DedupPipeline

N_PAIRS = 120
SHARED, UNIQ = 200, 92  # J ~ (SHARED-2)/(SHARED + 2*UNIQ + 2) ~ 0.51


def _vocab(rng, n=60_000):
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    return [
        "".join(letters[rng.integers(0, 26, size=rng.integers(4, 10))])
        for _ in range(n)
    ]


@pytest.fixture(scope="module")
def borderline_corpus():
    """Isolated doc pairs at s ~ 0.50-0.56 (just above threshold 0.5)."""
    rng = np.random.default_rng(11)
    vocab = _vocab(rng)

    def words(n):
        return [vocab[i] for i in rng.integers(0, len(vocab), size=n)]

    urls, texts = [], []
    for p in range(N_PAIRS):
        shared = words(SHARED)
        uniq = UNIQ + int(rng.integers(-12, 12))
        a = " ".join(shared + words(uniq))
        b = " ".join(shared + words(uniq))
        urls += [f"https://esc.example/pair{p}/a", f"https://esc.example/pair{p}/b"]
        texts += [a, b]
    for f in range(150):  # unique fillers
        urls.append(f"https://esc.example/filler/{f}")
        texts.append(" ".join(words(250)))
    return urls, texts


def _truth_pairs(urls, texts, cfg):
    ids = [K.doc_id_from_url(u) for u in urls]
    sh = {
        i: K.shingle_hashes(K.hash_tokens(K.tokenize(t)), cfg.shingle_k)
        for i, t in zip(ids, texts)
    }
    truth = set()
    n = len(ids)
    for x in range(0, 2 * N_PAIRS, 2):  # only planted pairs can qualify
        a, b = ids[x], ids[x + 1]
        if K.jaccard_sorted(sh[a], sh[b]) >= cfg.jaccard_threshold:
            truth.add((min(a, b), max(a, b)))
    assert n == 2 * N_PAIRS + 150
    return truth


def _run(spark, urls, texts, escalate):
    df = spark.createDataFrame(list(zip(urls, texts)), "url string, text string")
    pipe = DedupPipeline(
        DedupConfig(),
        enable_suffix=False,
        enable_simhash=False,
        escalate=escalate,
    )
    res = pipe.run(df)
    edges = {(min(r["a"], r["b"]), max(r["a"], r["b"])) for r in res.edges.collect()}
    res.release()
    return edges


def test_escalation_recovers_borderline_pairs(spark, borderline_corpus):
    urls, texts = borderline_corpus
    cfg = DedupConfig()
    truth = _truth_pairs(urls, texts, cfg)
    assert len(truth) >= 60, f"fixture too weak: {len(truth)} truth pairs"

    t0 = time.time()
    base = _run(spark, urls, texts, escalate=False)
    wall_base = time.time() - t0
    t1 = time.time()
    esc = _run(spark, urls, texts, escalate=True)
    wall_esc = time.time() - t1

    r_base = len(base & truth) / len(truth)
    r_esc = len(esc & truth) / len(truth)
    # the point of the test: first pass measurably misses, escalation recovers
    assert r_base < 1.0, "fixture did not exercise the S-curve miss zone"
    assert r_esc > r_base, f"escalation did not improve recall ({r_base:.3f})"
    assert r_esc >= 0.97, f"escalated recall {r_esc:.3f}"
    # no false edges in either mode (verification is exact either way)
    assert not (base - truth) and not (esc - truth)
    # bounded extra cost: the second pass is over the unmatched subset only
    assert wall_esc < 4 * wall_base + 30, (wall_base, wall_esc)


def test_tune_bands_prefix_is_coarser():
    b1, r1 = DedupConfig.tune_bands(0.5)
    b2, r2 = DedupConfig.tune_bands_prefix(0.35)
    mid1 = (1.0 / b1) ** (1.0 / r1)
    mid2 = (1.0 / b2) ** (1.0 / r2)
    assert b2 * r2 <= 128
    assert mid2 < mid1, (mid1, mid2)


def test_band_hashes_matrix_parity():
    rng = np.random.default_rng(5)
    M = rng.integers(-(2**31), 2**31, size=(7, 128), dtype=np.int64).astype(np.int32)
    for bands, rows in [(32, 4), (42, 3), (64, 2)]:
        got = K.band_hashes_matrix(M[:, : bands * rows], bands, rows)
        for i in range(7):
            want = K.band_hashes(M[i, : bands * rows], bands, rows)
            assert list(got[i]) == list(want), (bands, rows, i)
