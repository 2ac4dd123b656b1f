"""Smoke tests for the spark-submit entry points (jobs/*.py).

Each job runs in its own subprocess/JVM exactly as spark-submit would
launch it (the north-rule packaging shape), against the sf0.01 driver
testdata, and must print one parseable JSON metrics line.  These pin the
CLI glue (arg wiring, session construction, output contract) — operator
semantics are covered by the oracle/golden tests.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.01"


def _run(args: list[str]) -> dict:
    out = subprocess.run(
        [sys.executable, *args, "--cpus", "2", "--json"],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=420,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


@pytest.mark.skipif(not os.path.isdir(SF), reason="driver testdata absent")
def test_ann_job_qalsh_plus_lane():
    m = _run(
        [
            os.path.join(REPO, "jobs", "ann.py"),
            "--input", SF, "--algo", "qalsh_plus", "--k", "5",
        ]
    )
    assert m["n_queries"] == 10
    # every query must fill its top-k (500 vectors, nprobe cells cover k=5)
    assert m["result_rows"] == 50
    assert m["wall_sec"] > 0


@pytest.mark.skipif(not os.path.isdir(SF), reason="driver testdata absent")
def test_dedup_job_flagship(tmp_path):
    corpus = os.path.join(REPO, ".cache", "corpus_n300_s42")
    if not os.path.isdir(corpus):
        from qalsh_spark.datagen import cached_corpus

        corpus = cached_corpus(300)
    m = _run(
        [
            os.path.join(REPO, "jobs", "dedup.py"),
            "--input", corpus, "--output", str(tmp_path / "clusters"),
        ]
    )
    assert m["n_docs"] == 300
    assert 0 < m["n_clusters"] <= 300
    assert m["docs_per_hour"] > 0


@pytest.mark.skipif(not os.path.isdir(SF), reason="driver testdata absent")
def test_dedup_job_driver_testdata(tmp_path):
    """The job must accept the driver testdata shape (doc_id, text, lang,
    source, n_chars) — read_documents auto-adapts tables without the
    canonical url key.  Regression: this exact invocation failed with
    UNRESOLVED_COLUMN `url` when only queries.py adapted."""
    m = _run(
        [
            os.path.join(REPO, "jobs", "dedup.py"),
            "--input", SF, "--output", str(tmp_path / "clusters"),
        ]
    )
    assert m["n_docs"] == 500
    assert 0 < m["n_clusters"] <= 500
