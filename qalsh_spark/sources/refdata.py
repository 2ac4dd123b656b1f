"""Readers for the reference engine's binary artifacts (dataset / query set /
ground truth), so the Spark engine can be validated against the reference's
OWN shipped files rather than only this repo's synthetic oracle.

Format (all little-endian, no header — shape/dtype come from the sidecar
`.stat` file):
  - `<prefix>.ds`   : n*d values of `dtype`, row-major
                      (/root/reference/methods/util.h:69-92 read_data, sign=0)
  - `<prefix>.q`    : qn*d values of `dtype` (sign=1)
  - `<prefix>.gt<p>`: qn*MAXK Result records {float32 key; int32 id}
                      (/root/reference/methods/pri_queue.h:11-14,
                       written by util.cc:63-78 write_ground_truth)
  - `<prefix>.stat` : "n = ...\nqn = ...\nd = ...\ndtype = ..." sidecar

Ground-truth semantics (what a bit-exact reproduction must match,
/root/reference/methods/util.h:465-484 kNN_search + pri_queue.cc:66-79
MinK_List::insert):
  - distance = float32( sqrt( sum_j (a_j - b_j)^2 ) ), accumulated in
    float32.  For integer dtypes the sum of squares is an exact integer
    below 2^24, so float64 accumulation + a final float32 cast is
    bit-identical (and sqrt computed in float64 then rounded to float32
    equals the correctly-rounded float32 sqrt: 53 >= 2*24+2 makes the
    double rounding innocuous);
  - ranking = (float32 key ASC, id ASC): the scan runs in id order and
    MinK_List::insert shifts only on strict key <, so equal float32 keys
    keep insertion (= id) order — ties on the ROUNDED key, not the exact
    distance, which matters when two distinct integer sums round to the
    same float32.
"""

from __future__ import annotations

import os

import numpy as np

MAXK = 100  # last entry of the reference's TOPKs sweep
# (/root/reference/methods/def.h:43-44)

_DTYPES = {
    "uint8": np.uint8,
    "uint16": np.uint16,
    "int32": np.int32,
    "float32": np.float32,
}

_GT_DTYPE = np.dtype([("key", "<f4"), ("id", "<i4")])


def read_stat(prefix: str) -> dict:
    """Parse the `.stat` sidecar -> {n, qn, d, dtype}."""
    out: dict = {}
    with open(prefix + ".stat") as f:
        for line in f:
            if "=" not in line:
                continue
            k, v = (s.strip() for s in line.split("=", 1))
            out[k] = _DTYPES[v] if k == "dtype" else int(v)
    for key in ("n", "qn", "d", "dtype"):
        if key not in out:
            raise ValueError(f"{prefix}.stat missing '{key}'")
    return out


def read_points(path: str, n: int, d: int, dtype) -> np.ndarray:
    """Raw (n, d) matrix from a `.ds` / `.q` file."""
    a = np.fromfile(path, dtype=dtype)
    if a.size != n * d:
        raise ValueError(f"{path}: expected {n * d} values, got {a.size}")
    return a.reshape(n, d)


def read_ground_truth(path: str, qn: int, maxk: int = MAXK) -> np.ndarray:
    """(qn, maxk) structured array of {key: float32, id: int32}."""
    a = np.fromfile(path, dtype=_GT_DTYPE)
    if a.size != qn * maxk:
        raise ValueError(f"{path}: expected {qn * maxk} results, got {a.size}")
    return a.reshape(qn, maxk)


def load_reference_set(prefix: str, p: float = 2.0):
    """(data, queries, truth, stat) for a reference dataset prefix, e.g.
    '/root/reference/data/Mnist/Mnist'.  `truth` is None when the shipped
    ground-truth file for this p does not exist."""
    stat = read_stat(prefix)
    data = read_points(prefix + ".ds", stat["n"], stat["d"], stat["dtype"])
    queries = read_points(prefix + ".q", stat["qn"], stat["d"], stat["dtype"])
    gt_path = prefix + f".gt{p:3.1f}"
    truth = (
        read_ground_truth(gt_path, stat["qn"]) if os.path.exists(gt_path) else None
    )
    return data, queries, truth, stat


def knn_numpy(
    data: np.ndarray, query: np.ndarray, k: int, p: float = 2.0
) -> tuple[np.ndarray, np.ndarray]:
    """Single-process reproduction of the reference's kNN_search ordering
    for one query: returns (ids int32, keys float32) of the top-k under
    (float32 l_p distance ASC, id ASC).  The float32 rounding is applied
    BEFORE ranking — the reference compares rounded keys."""
    x = data.astype(np.float64)
    q = query.astype(np.float64)
    if p == 2.0:
        dist = np.sqrt(((x - q) ** 2).sum(axis=1).astype(np.float32))
    elif p == 1.0:
        dist = np.abs(x - q).sum(axis=1).astype(np.float32)
    else:
        dist = (np.abs(x - q) ** p).sum(axis=1).astype(np.float32) ** np.float32(
            1.0 / p
        )
    dist = dist.astype(np.float32)
    order = np.lexsort((np.arange(len(x)), dist))[:k]
    return order.astype(np.int32), dist[order]


def ground_truth_numpy(
    data: np.ndarray, queries: np.ndarray, k: int = MAXK, p: float = 2.0
) -> np.ndarray:
    """(qn, k) structured {key, id} array — the same thing the reference's
    `-alg 0` writes (/root/reference/methods/ann.h:17-48)."""
    out = np.empty((len(queries), k), dtype=_GT_DTYPE)
    for i, q in enumerate(queries):
        ids, keys = knn_numpy(data, q, k, p)
        out[i]["id"] = ids
        out[i]["key"] = keys
    return out


def points_to_pandas(X: np.ndarray, id_col: str = "vec_id", vec_col: str = "embedding"):
    """(n, d) matrix -> pandas frame (id, array<double>) for createDataFrame.
    Row index is the reference's 0-based point id (methods/util.h:480)."""
    import pandas as pd

    xf = X.astype(np.float64)
    return pd.DataFrame(
        {id_col: np.arange(len(X), dtype=np.int64), vec_col: list(xf)}
    )
