"""Exact-equality verification of the approximate-ANN golden oracles.

scripts/make_golden.build_ann_lanes freezes single-process NumPy replays of
the four deterministic ANN top-k lanes plus the recall/ratio sweep; the
driver's DuckDB oracle then just selects the frozen rows by embeddings
fingerprint.  These tests hold the live Spark output to the frozen tables
EXACTLY (every column, including the HALF_UP-rounded score) — if an
operator, kernel seed, or rounding path drifts, the golden goes stale and
this fails before the driver does.
"""

from __future__ import annotations

import importlib.util
import os

import pyarrow.parquet as pq
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"


def _mg():
    spec = importlib.util.spec_from_file_location(
        "make_golden", os.path.join(REPO, "scripts", "make_golden.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def emb_fp():
    mod = _mg()
    fp, _ids, _emb = mod.embeddings_fp(SF)
    return fp


def _golden_rows(name: str, fp: str, cols: list[str]) -> list:
    t = pq.read_table(os.path.join(REPO, "golden", f"{name}.parquet"))
    mask = [v == fp for v in t["emb_fp"].to_pylist()]
    rows = zip(*[[v for v, m in zip(t[c].to_pylist(), mask) if m] for c in cols])
    return sorted(tuple(r) for r in rows)


@pytest.mark.parametrize(
    "name,cols",
    [
        ("lsh_ann_topk", ["qid", "neighbor_id", "cos", "rank"]),
        ("ivf_ann_topk", ["qid", "neighbor_id", "cos", "rank"]),
        ("qalsh_plus_ann_topk", ["qid", "neighbor_id", "cos", "rank"]),
        ("pstable_ann_topk", ["qid", "neighbor_id", "l2", "rank"]),
        ("pstable_rehash_ann_topk", ["qid", "neighbor_id", "l2", "rank"]),
        ("pstable_auto_ann_topk", ["qid", "neighbor_id", "l2", "rank"]),
        ("ann_recall_eval", ["k", "n_queries", "avg_recall", "avg_ratio"]),
    ],
)
def test_spark_matches_frozen_golden(spark, emb_fp, name, cols):
    from qalsh_spark.queries import QUERIES

    # sorted-list (multiset) comparison, not sets: a set would collapse
    # duplicated result rows and let a wrong-multiplicity output pass
    got = sorted(
        tuple(getattr(row, c) for c in cols)
        for row in QUERIES[name](spark, SF).collect()
    )
    want = _golden_rows(name, emb_fp, cols)
    assert want, f"golden table {name} has no rows for this corpus"
    assert got == want
