"""Generate golden oracle parquets for the non-SQL-expressible driver rows
(minhash_signatures / simhash_hamming_pairs / substring_pairs /
minhash_dedup_clusters / embedding_near_dup).

The reference persists its exact ground truth as binary artifacts
(write_ground_truth, /root/reference/methods/util.cc:63-78) and every later
run is judged against the file; this script is the same move for the
signature lanes: a SINGLE-PROCESS NumPy computation (qalsh_spark.kernels —
no Spark anywhere) over each testdata corpus, frozen into
golden/<name>.parquet with a `corpus_fp` column = md5 of the corpus texts in
doc_id order.  The DuckDB oracle SQL selects the rows whose corpus_fp
matches the live `documents` view, so one static SQL string serves every sf
directory, and a corpus the goldens don't know yields 0 rows (a loud
mismatch, never a silent pass).

Run: python scripts/make_golden.py   (rewrites golden/*.parquet)
"""

from __future__ import annotations

import hashlib
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from qalsh_spark import kernels as K  # noqa: E402
from qalsh_spark.config import DedupConfig  # noqa: E402

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
GOLDEN = os.path.join(REPO, "golden")

FP_DELIM = "\x01"


def corpus_fp(texts_in_doc_id_order: list[str]) -> str:
    return hashlib.md5(FP_DELIM.join(texts_in_doc_id_order).encode()).hexdigest()


def load_docs(sf_dir: str):
    """documents.parquet -> (orig_ids, texts) sorted by doc_id — mirrors
    sources.catalog.adapt_documents + the engine's md5-of-url doc_id mint."""
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
    order = np.argsort(t["doc_id"].to_numpy(), kind="stable")
    orig = t["doc_id"].to_numpy()[order]
    texts = np.asarray(t["text"].to_pylist(), dtype=object)[order]
    return orig, [x or "" for x in texts]


def embeddings_fp(sf_dir: str) -> tuple[str, np.ndarray, np.ndarray]:
    """(fingerprint, vec_ids, float32 matrix) for the embeddings table.

    The fingerprint is md5 over `vec_id|<csv of elements>` rows joined by
    chr(1) in vec_id order; DuckDB's `array_to_string(embedding, ',')` and
    numpy's float32 repr both emit shortest-round-trip decimals, so the SQL
    twin `md5(string_agg(vec_id || '|' || array_to_string(embedding, ','),
    chr(1) ORDER BY vec_id))` is byte-identical (verified at every sf)."""
    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    ids = t["vec_id"].to_numpy()
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    emb = np.stack(
        [
            np.asarray(v, dtype=np.float32)
            for v in np.asarray(t["embedding"].to_pylist(), dtype=object)[order]
        ]
    )
    parts = [
        f"{int(i)}|" + ",".join(repr(np.float32(x)) for x in v)
        for i, v in zip(ids, emb)
    ]
    return hashlib.md5(FP_DELIM.join(parts).encode()).hexdigest(), ids, emb


def _spark_round(x: float, scale: int = 4) -> float:
    """Replicates Spark's F.round on a double: BigDecimal.valueOf(d) uses
    Double.toString's shortest round-trip repr (== Python repr), then
    setScale(scale, HALF_UP)."""
    import decimal

    return float(
        decimal.Decimal(repr(x)).quantize(
            decimal.Decimal(1).scaleb(-scale), rounding=decimal.ROUND_HALF_UP
        )
    )


def _dot_spark(a32: np.ndarray, b32: np.ndarray) -> float:
    """Replicates operators/ann._dot over array<float> columns bit-for-bit:
    zip_with's x*y multiplies in FLOAT (float32 rounding per product), then
    the aggregate fold accumulates left-to-right into a DOUBLE."""
    acc = 0.0
    for p in a32 * b32:  # float32 elementwise products
        acc += float(p)
    return acc


def build_neardup(sf_dir: str, threshold=0.4, m=24, bands=8, seed=6) -> pa.Table:
    """Golden for q_embedding_near_dup: same SRP kernel call as the Spark
    UDF (kernels.srp_band_keys_matrix on float64), same cap-free bucket
    pairing, and a bit-exact replication of the JVM cosine verify
    (float32 products + left-to-right double fold + HALF_UP round-4).
    Verified exact-equal to the live Spark output at every sf dir."""
    fp, ids, emb32 = embeddings_fp(sf_dir)
    X = emb32.astype(np.float64)
    planes = K.srp_planes(m, X.shape[1], seed)
    keys = K.srp_band_keys_matrix(X, planes, bands, m // bands)
    buckets: dict[int, list[int]] = {}
    for i, row in enumerate(keys):
        for key in row.tolist():
            buckets.setdefault(key, []).append(int(ids[i]))
    idx = {int(v): i for i, v in enumerate(ids)}
    cand: set[tuple[int, int]] = set()
    for members in buckets.values():
        ms = sorted(set(members))
        for x in range(len(ms)):
            for y in range(x + 1, len(ms)):
                cand.add((ms[x], ms[y]))
    rows = []
    for a, b in sorted(cand):
        va, vb = emb32[idx[a]], emb32[idx[b]]
        num = _dot_spark(va, vb)
        den = np.sqrt(_dot_spark(va, va)) * np.sqrt(_dot_spark(vb, vb))
        cos = num / den
        if cos >= threshold:
            rows.append((a, b, _spark_round(cos, 4)))
    return pa.table(
        {
            "emb_fp": [fp] * len(rows),
            "a": pa.array([r[0] for r in rows], pa.int64()),
            "b": pa.array([r[1] for r in rows], pa.int64()),
            "cos": pa.array([r[2] for r in rows], pa.float64()),
        }
    )


def build_clusters(sf_dir: str, cfg: DedupConfig) -> pa.Table:
    """Golden for the flagship q_minhash_dedup_clusters: the full
    single-process union-find oracle (tests/oracle.run_oracle — the same
    code the pipeline-parity pytest already holds the engine to exactly),
    frozen as (doc_id, cluster_id, cluster_size) keyed by corpus_fp."""
    import collections

    from tests.oracle import run_oracle

    orig, texts = load_docs(sf_dir)
    fp = corpus_fp(list(texts))
    urls = [f"synthetic://doc/{int(o)}" for o in orig]
    res = run_oracle(urls, texts, cfg)
    sizes = collections.Counter(res.clusters.values())
    doc_ids = sorted(res.clusters)
    return pa.table(
        {
            "corpus_fp": [fp] * len(doc_ids),
            "doc_id": pa.array(doc_ids, pa.int64()),
            "cluster_id": pa.array([res.clusters[d] for d in doc_ids], pa.int64()),
            "cluster_size": pa.array(
                [sizes[res.clusters[d]] for d in doc_ids], pa.int64()
            ),
        }
    )


def pairs_with_cap(buckets: dict, cap: int) -> set[tuple[int, int]]:
    """operators/pairs.py cap/star rule, single-process."""
    out: set[tuple[int, int]] = set()
    for members in buckets.values():
        ms = sorted(set(members))
        if len(ms) < 2:
            continue
        if len(ms) <= cap:
            for x in range(len(ms)):
                for y in range(x + 1, len(ms)):
                    out.add((ms[x], ms[y]))
        else:
            hub = ms[0]
            for m in ms[1:]:
                out.add((hub, m))
    return out


def build(sf_dir: str, cfg: DedupConfig):
    orig, texts = load_docs(sf_dir)
    fp = corpus_fp(list(texts))
    a, b = K.minhash_params(cfg.num_perm, cfg.minhash_seed)
    ids = np.array(
        [K.doc_id_from_url(f"synthetic://doc/{int(o)}") for o in orig], dtype=np.int64
    )

    sig_rows = {"doc_id": [], "n_tokens": [], "shingle_count": [], "simhash": []}
    sim_buckets: dict[int, list[int]] = {}
    suf_buckets: dict[int, list[int]] = {}
    fps: dict[int, int] = {}
    for d, text in zip(ids.tolist(), texts):
        s = K.sign_document(
            text, a, b, cfg.shingle_k, cfg.bands, cfg.rows,
            cfg.simhash_blocks, cfg.simhash_key_blocks,
        )
        sig_rows["doc_id"].append(d)
        sig_rows["n_tokens"].append(s["n_tokens"])
        sig_rows["shingle_count"].append(len(s["shingles"]))
        sig_rows["simhash"].append(s["simhash"])
        fps[d] = s["simhash"]
        for key in s["simhash_keys"].tolist():
            sim_buckets.setdefault(key, []).append(d)
        k1, _k2 = K.suffix_key_pairs_for_text(
            text, cfg.suffix_window, cfg.suffix_gap, cfg.lcp_min
        )
        for key in k1.tolist():
            suf_buckets.setdefault(key, []).append(d)

    # simhash lane: q_simhash_hamming_pairs = cap-64 bucket pairs, hamming<=3
    sim_pairs = []
    for x, y in sorted(pairs_with_cap(sim_buckets, 64)):
        ham = bin((fps[x] & 0xFFFFFFFFFFFFFFFF) ^ (fps[y] & 0xFFFFFFFFFFFFFFFF)).count("1")
        if ham <= cfg.hamming_max:
            sim_pairs.append((x, y, ham))

    # suffix lane: q_substring_pairs = cap-32 bucket pairs (pre-verified by
    # key equality), lane tag 'suffix'
    from qalsh_spark.operators.suffix import SUFFIX_BUCKET_CAP

    suf_pairs = sorted(pairs_with_cap(suf_buckets, SUFFIX_BUCKET_CAP))

    n = len(ids)
    return {
        "minhash_signatures": pa.table(
            {
                "corpus_fp": [fp] * n,
                "doc_id": pa.array(sig_rows["doc_id"], pa.int64()),
                "n_tokens": pa.array(sig_rows["n_tokens"], pa.int32()),
                "shingle_count": pa.array(sig_rows["shingle_count"], pa.int32()),
                "simhash": pa.array(sig_rows["simhash"], pa.int64()),
            }
        ),
        "simhash_hamming_pairs": pa.table(
            {
                "corpus_fp": [fp] * len(sim_pairs),
                "a": pa.array([p[0] for p in sim_pairs], pa.int64()),
                "b": pa.array([p[1] for p in sim_pairs], pa.int64()),
                "hamming": pa.array([p[2] for p in sim_pairs], pa.int32()),
            }
        ),
        "substring_pairs": pa.table(
            {
                "corpus_fp": [fp] * len(suf_pairs),
                "a": pa.array([p[0] for p in suf_pairs], pa.int64()),
                "b": pa.array([p[1] for p in suf_pairs], pa.int64()),
                "lane": ["suffix"] * len(suf_pairs),
            }
        ),
    }


def main() -> None:
    cfg = DedupConfig()
    acc: dict[str, list] = {}
    for sf in SF_DIRS:
        if not os.path.exists(os.path.join(sf, "documents.parquet")):
            print(f"skip {sf} (absent)")
            continue
        tables = build(sf, cfg)
        tables["minhash_dedup_clusters"] = build_clusters(sf, cfg)
        tables["embedding_near_dup"] = build_neardup(sf)
        for name, t in tables.items():
            acc.setdefault(name, []).append(t)
        print(f"{sf}: " + ", ".join(f"{k}={v.num_rows}" for k, v in tables.items()))
    os.makedirs(GOLDEN, exist_ok=True)
    for name, parts in acc.items():
        out = pa.concat_tables(parts)
        pq.write_table(out, os.path.join(GOLDEN, f"{name}.parquet"))
        print(f"wrote golden/{name}.parquet rows={out.num_rows}")


if __name__ == "__main__":
    main()
