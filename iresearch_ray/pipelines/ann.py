"""Similarity search over an embedding column (list<float>).

- ``cosine_topk``  — brute-force baseline: one numpy matmul per batch
  against a broadcast query matrix (`ray.put` once, read per actor), then
  per-batch top-k partials merged by one tiny driver-side reduction.
- ``lsh_topk``     — scale path: sign-random-projection LSH buckets; only
  the query's bucket (plus optional multi-probe neighbors) is scanned.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
import pyarrow as pa

from iresearch_ray.util import pool_size


def _as_matrix(col, dtype=np.float32) -> np.ndarray:
    arr = col.combine_chunks() if hasattr(col, "combine_chunks") else col
    lst = arr.to_pylist()
    return np.asarray(lst, dtype=dtype)


class CosineTopKBatch:
    """Per-batch brute-force cosine top-k against broadcast queries."""

    def __init__(self, query_ref, id_column: str, vec_column: str, k: int,
                 dtype=np.float32):
        import ray

        self.dtype = np.dtype(dtype).type
        q = ray.get(query_ref) if not isinstance(query_ref, np.ndarray) else query_ref
        self.q = np.asarray(q, dtype=self.dtype)
        if self.q.ndim == 1:
            self.q = self.q[None, :]
        self.qn = self.q / np.maximum(np.linalg.norm(self.q, axis=1, keepdims=True), 1e-30)
        self.id_column = id_column
        self.vec_column = vec_column
        self.k = k

    def __call__(self, b: pa.Table) -> pa.Table:
        ids = b[self.id_column].to_numpy()
        m = _as_matrix(b[self.vec_column], self.dtype)
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        sims = mn @ self.qn.T  # (batch, n_queries)
        out_q, out_id, out_s = [], [], []
        for qi in range(sims.shape[1]):
            s = sims[:, qi]
            k = min(self.k, len(s))
            # tie-exact per-batch trim: keep ALL vectors tied with the k-th
            # similarity, cut by (cosine desc, id asc) — argpartition alone
            # keeps arbitrary ties (identical/duplicate embeddings)
            kth = np.partition(-s, k - 1)[k - 1]
            cand = np.flatnonzero(-s <= kth)
            sel = cand[np.lexsort((ids[cand], -s[cand]))[:k]]
            out_q.extend([qi] * len(sel))
            out_id.extend(ids[sel])
            out_s.extend(s[sel].astype(np.float64))
        return pa.table({"query_id": pa.array(out_q, type=pa.int64()),
                         self.id_column: pa.array(out_id),
                         "cosine": pa.array(out_s, type=pa.float64())})


def cosine_topk(ds, query: np.ndarray, k: int = 10, id_column: str = "vec_id",
                vec_column: str = "embedding", concurrency: int | None = None,
                dtype=np.float32) -> pd.DataFrame:
    """Exact cosine top-k (per query row in `query`): the per-batch partial
    top-k keeps the shuffle tiny (k rows per batch per query)."""
    import ray

    qref = ray.put(np.asarray(query, dtype=dtype))
    partials = ds.map_batches(
        CosineTopKBatch,
        fn_constructor_kwargs=dict(query_ref=qref, id_column=id_column,
                                   vec_column=vec_column, k=k, dtype=dtype),
        batch_format="pyarrow", concurrency=pool_size(concurrency))
    df = partials.to_pandas()  # tiny: k rows per (batch, query)
    out = []
    for qi, g in df.groupby("query_id"):
        top = heapq.nsmallest(k, g.itertuples(index=False),
                              key=lambda r: (-r.cosine, getattr(r, id_column)))
        out.extend(top)
    res = pd.DataFrame(out)
    return res.sort_values(["query_id", "cosine", id_column],
                           ascending=[True, False, True]).reset_index(drop=True)


def _projection_planes(dim: int, planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((dim, planes)).astype(np.float32)


def lsh_bucket_ids(vectors: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (vectors @ planes) > 0
    weights = (1 << np.arange(planes.shape[1], dtype=np.int64))
    return bits.astype(np.int64) @ weights


def lsh_topk(ds, query: np.ndarray, k: int = 10, planes: int = 8,
             id_column: str = "vec_id", vec_column: str = "embedding",
             seed: int = 42, multiprobe: int = 1, concurrency: int | None = None) -> pd.DataFrame:
    """Approximate cosine top-k: scan only sign-LSH buckets near the query.

    ``multiprobe`` additionally probes buckets at Hamming distance <= it,
    trading recall for scan volume (documented partitioning assumption:
    bucket skew is bounded because sign-projection splits are balanced for
    mean-centered data).
    """
    q = np.asarray(query, dtype=np.float32)
    if q.ndim == 1:
        q = q[None, :]
    P = _projection_planes(q.shape[1], planes, seed)
    target = set(lsh_bucket_ids(q, P).tolist())
    frontier = set(target)
    for _ in range(max(0, multiprobe)):  # probe all buckets within Hamming
        # distance <= multiprobe of the query's bucket
        nxt = {b ^ (1 << j) for b in frontier for j in range(planes)}
        frontier = nxt - target
        target |= nxt

    def filter_bucket(t: pa.Table) -> pa.Table:
        m = _as_matrix(t[vec_column])
        buckets = lsh_bucket_ids(m, P)
        mask = np.isin(buckets, list(target))
        return t.filter(pa.array(mask))

    pruned = ds.map_batches(filter_bucket, batch_format="pyarrow")
    return cosine_topk(pruned, q, k, id_column, vec_column, concurrency)


def _spherical_kmeans(sample: np.ndarray, n_cells: int, iters: int = 10,
                      seed: int = 42) -> np.ndarray:
    """Deterministic spherical k-means (cosine): seeded shuffled init,
    fixed Lloyd iterations; returns L2-normalized centroids."""
    rng = np.random.default_rng(seed)
    s = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-30)
    init = rng.permutation(len(s))[:n_cells]
    c = s[init].copy()
    for _ in range(iters):
        assign = np.argmax(s @ c.T, axis=1)
        for j in range(n_cells):
            members = s[assign == j]
            if len(members):
                c[j] = members.mean(axis=0)
        c /= np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-30)
    return c


def ivf_topk(ds, query: np.ndarray, k: int = 10, n_cells: int = 16,
             n_probe: int = 3, train_sample: int = 2048,
             id_column: str = "vec_id", vec_column: str = "embedding",
             seed: int = 42, concurrency: int | None = None) -> pd.DataFrame:
    """IVF-flavor approximate top-k: a coarse spherical-k-means quantizer
    trained on a bounded driver-side sample routes the scan to the query's
    ``n_probe`` nearest cells; only those cells' vectors are scored.

    Scale shape: training touches ``train_sample`` rows (bounded,
    deterministic); the cell filter is a broadcast-centroid map_batches;
    ``n_probe == n_cells`` degenerates to the exact brute-force scan.
    """
    import ray

    q = np.asarray(query, dtype=np.float32)
    if q.ndim == 1:
        q = q[None, :]
    sample = _as_matrix(
        pa.concat_tables(list(ds.limit(train_sample)
                              .iter_batches(batch_format="pyarrow")))
        [vec_column])
    centroids = _spherical_kmeans(sample, min(n_cells, len(sample)),
                                  seed=seed)
    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-30)
    probe = np.argsort(-(qn @ centroids.T), axis=1)[:, :n_probe]
    cells = set(probe.reshape(-1).tolist())
    cref = ray.put(centroids)

    def keep_cells(t: pa.Table) -> pa.Table:
        c = ray.get(cref)
        m = _as_matrix(t[vec_column])
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        assign = np.argmax(mn @ c.T, axis=1)
        return t.filter(pa.array(np.isin(assign, list(cells))))

    pruned = ds.map_batches(keep_cells, batch_format="pyarrow")
    return cosine_topk(pruned, q, k, id_column, vec_column, concurrency)
