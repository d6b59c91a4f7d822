"""Deduplication pipelines over a Ray Dataset of documents.

Scale notes (designed for 100 TB corpora):
- exact/fingerprint dedup shuffle only (hash, doc_id) pairs — one small
  groupby per corpus, never the document payloads;
- MinHash-LSH: one count-only shuffle of light (band, band_hash) keys
  finds colliding buckets; a broadcast membership filter then keeps only
  the colliding sketch rows (volume = candidate set, not corpus) for
  vectorized signature-Jaccard verification — no per-bucket UDF calls and
  no second pass over text;
- SimHash groups by the 64-bit sketch (exact-bucket flavor).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from iresearch_ray.analysis import get_analyzer
from iresearch_ray.util import StatelessBatchFn, nul_safe_factorize, pool_size
from iresearch_ray.analysis.minhash import (
    band_hashes,
    minhash_signatures,
    shingles,
    simhash,
    stable_hash_strings,
)


def _md5_hex(values: list[str]) -> list[str]:
    return [hashlib.md5(v.encode()).hexdigest() for v in values]


def _shingle_hashes_per_doc(texts, analyzer, k: int, hasher):
    """Concatenated uint64 token-k-shingle hashes for a batch of texts,
    plus per-doc offsets (len(texts)+1) — the shared front half of every
    shingle-sketch batch stage (minhash, Jaccard, contamination)."""
    all_sh: list[str] = []
    offsets = np.zeros(len(texts) + 1, dtype=np.int64)
    for i, t in enumerate(texts):
        all_sh.extend(shingles(analyzer.tokens(t), k))
        offsets[i + 1] = len(all_sh)
    hashes = hasher(all_sh) if all_sh else np.empty(0, np.uint64)
    return hashes, offsets


def _csr_intersect_counts(flat: np.ndarray, offs: np.ndarray,
                          sizes: np.ndarray, lo: np.ndarray,
                          hi: np.ndarray) -> np.ndarray:
    """|set(lo_i) ∩ set(hi_i)| per pair over a CSR of sorted uint64 sets.

    Groups pairs by the LEFT doc (callers pass lo-major-sorted pairs, but
    any clustering works) and runs ONE searchsorted of all partners'
    concatenated sets against that doc's small cache-hot set, then a
    reduceat sums per-pair hit counts.  One C call per left doc beats a
    fully-flattened segmented binary search, whose random gathers into
    the whole CSR are cache-miss-bound (measured)."""
    if not len(lo):  # empty Ray batch
        return np.empty(0, dtype=np.int64)
    inter = np.empty(len(lo), dtype=np.int64)
    a_starts = np.flatnonzero(np.r_[True, lo[1:] != lo[:-1]])
    a_bounds = np.r_[a_starts, len(lo)]
    for s, e in zip(a_bounds[:-1], a_bounds[1:]):
        A = flat[offs[lo[s]]:offs[lo[s] + 1]]
        part = hi[s:e]
        ln = sizes[part]
        csum = np.zeros(len(part) + 1, dtype=np.int64)
        np.cumsum(ln, out=csum[1:])
        gidx = (np.arange(int(csum[-1]), dtype=np.int64)
                - np.repeat(csum[:-1], ln) + np.repeat(offs[part], ln))
        concat = flat[gidx]
        pos = np.searchsorted(A, concat)
        pos[pos == len(A)] = 0
        hit = (A[pos] == concat).astype(np.int64)
        inter[s:e] = np.add.reduceat(hit, csum[:-1])
    return inter


# --- boundary-run repair for sort+combine aggregation -----------------
#
# Ray's sort emits GLOBALLY ORDERED blocks (documented), so a run of equal
# keys is contiguous across the block sequence — but under heavy key skew
# the sample-based range partitioner draws several boundaries equal to the
# hot key and the run STRADDLES blocks (observed: a 2.4M-row hot node at a
# 5M-row sort; at 100 TB a hot key — an empty-doc hash, a boilerplate
# span, a converged dup-cluster hub — is a certainty, not an edge case).
# Round 3 pinned the no-straddle assumption with a runtime guard actor
# that turned the silent undercount into a loud failure; round 4 removes
# the assumption entirely:
#
# - INTERIOR runs (neither first nor last in their block) can never
#   straddle — by global ordering, a straddling run is the LAST run of
#   one block and the FIRST run of the next — so each block combines its
#   interior runs locally and exactly;
# - the first and last run of every block are emitted as per-piece
#   PARTIALS (<= 2 rows per block at any block count) and merged by key
#   on the driver, which is exact for any aggregate with a partial form
#   (count, min, max — everything this module needs).
#
# Combines that need a whole group's ROWS together (the embedding-LSH
# within-bucket pairing) use the partials only to DETECT straddled
# groups (a key with >= 2 partial rows) and route those through the
# bounded per-group fan-out instead.


def _run_starts_arrow(col, n: int) -> np.ndarray:
    """Run-start indices of a block-sorted Arrow array.  Arrow-side
    compare (``pc.not_equal`` on offset slices), so string keys never
    convert to Python objects."""
    import pyarrow.compute as pc

    neq = pc.not_equal(col.slice(1), col.slice(0, n - 1))
    return np.r_[0, np.flatnonzero(neq.to_numpy(zero_copy_only=False)) + 1]


def _collect_small(ds) -> pa.Table | None:
    """Materialize a small Dataset (a few rows per block — boundary
    partials) on the driver as ONE Arrow table, types preserved (a pandas
    round-trip would mangle large_string/dictionary keys).  None when the
    dataset has no rows."""
    import ray

    tbls = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    if not tbls:
        return None
    return pa.concat_tables(tbls, promote_options="default")


def _grouped_count_min(rows, key_column: str, id_column: str | None,
                       count_alias: str = "dup_count",
                       keep_alias: str = "keep_id",
                       min_count: int | None = None,
                       sum_column: str | None = None,
                       sum_alias: str = "total",
                       _presorted: bool = False):
    """(key -> row count[, min id]) for a Dataset of (key[, id]) rows via
    ONE range sort + a per-block reduceat combine — the aggregation shape
    shared by every hash-bucket dedup operator.  ``id_column=None`` emits
    counts only (the LSH hot-bucket shape).

    ``sum_column`` adds a per-group int64 sum under ``sum_alias`` (sum
    has a partial form, so the same boundary repair stays exact) — the
    (domain -> docs, tokens) stats shape.

    4x faster than ``groupby().aggregate(Count, Min)`` at probe scale
    (the aggregate path pays per-group overhead materializing every
    singleton group; this is one vector sweep per block) and, with
    ``min_count``, the filter fuses into the combine AND the driver
    merge, so non-duplicated groups never leave their task.

    Exact at ANY key skew via boundary-run repair (see the module
    comment above :func:`_run_starts_arrow`): each block combines only
    its INTERIOR runs — which by global sort ordering can never straddle
    blocks — while the first/last run of every block routes through
    <=2-rows-per-block driver partials, merged by key and unioned back.
    Hot keys wider than a whole block (the 100-TB certainty the round-3
    guard actor could only fail loudly on) now aggregate exactly.
    ``batch_size=None`` keeps map_batches from splitting a block, and
    the sorted output is materialized so both passes see the SAME block
    boundaries (a re-executed sort may sample different ones — that
    re-sampling is exactly what false-tripped the retired round-3 guard
    actor when a caller consumed the lazy result twice).

    ``_presorted`` skips the sort and treats the input's existing
    blocks as the sorted blocking.  Two callers: tests inject
    adversarial splits (runs straddling hand-built blocks — Ray's
    partitioner is a pure key function and never produces them), and
    ``pagerank`` feeds per-iteration contributions that ride a ONE-TIME
    target-sorted edge table (order-preserving map), so ten iterations
    pay one sort total.  Callers must guarantee global key order across
    blocks; straddling runs are fine (boundary repair owns them)."""
    import ray
    import ray.data

    sorted_rows = (rows if _presorted
                   else rows.sort(key_column)).materialize()

    def _empty(t: pa.Table) -> pa.Table:
        key_type = t.schema.field(key_column).type
        cols = {key_column: pa.array([], key_type),
                count_alias: pa.array([], pa.int64())}
        if id_column is not None:
            cols[keep_alias] = pa.array(
                [], t.schema.field(id_column).type)
        if sum_column is not None:
            cols[sum_alias] = pa.array([], pa.int64())
        return pa.table(cols)

    def edge_partials(t: pa.Table) -> pa.Table:
        n = len(t)
        if n == 0:
            return _empty(t)
        col = t[key_column].combine_chunks()
        starts = _run_starts_arrow(col, n)
        bounds = [(0, int(starts[1]) if len(starts) > 1 else n)]
        if len(starts) > 1:
            bounds.append((int(starts[-1]), n))
        take, cnts, mins, sums = [], [], [], []
        ids = (t[id_column].to_numpy(zero_copy_only=False)
               if id_column is not None else None)
        svals = (t[sum_column].to_numpy(zero_copy_only=False)
                 if sum_column is not None else None)
        for s, e in bounds:
            take.append(s)
            cnts.append(e - s)
            if ids is not None:
                mins.append(ids[s:e].min())
            if svals is not None:
                sums.append(int(svals[s:e].sum()))
        cols = {key_column: col.take(pa.array(take)),
                count_alias: pa.array(cnts, type=pa.int64())}
        if ids is not None:
            cols[keep_alias] = pa.array(
                mins, type=t.schema.field(id_column).type)
        if svals is not None:
            cols[sum_alias] = pa.array(sums, type=pa.int64())
        return pa.table(cols)

    def combine_interior(t: pa.Table) -> pa.Table:
        n = len(t)
        if n == 0:
            return _empty(t)
        col = t[key_column].combine_chunks()
        starts = _run_starts_arrow(col, n)
        if len(starts) <= 2:
            return _empty(t)  # 1-2 runs: all boundary, driver owns them
        lo, hi = int(starts[1]), int(starts[-1])
        starts_i = starts[1:-1]
        cnt = np.diff(np.r_[starts_i, hi]).astype(np.int64)
        mins = None
        if id_column is not None:
            ids = t[id_column].to_numpy(zero_copy_only=False)
            # object dtype (string ids) reduces via Python < — still one
            # sweep; numeric ids stay a C loop
            mins = np.minimum.reduceat(ids[lo:hi], starts_i - lo)
        sums = None
        if sum_column is not None:
            svals = t[sum_column].to_numpy(
                zero_copy_only=False).astype(np.int64)
            sums = np.add.reduceat(svals[lo:hi], starts_i - lo)
        if min_count is not None:
            keep = cnt >= min_count
            starts_i, cnt = starts_i[keep], cnt[keep]
            mins = mins[keep] if mins is not None else None
            sums = sums[keep] if sums is not None else None
        cols = {key_column: col.take(pa.array(starts_i)),
                count_alias: pa.array(cnt)}
        if mins is not None:
            cols[keep_alias] = pa.array(
                mins, type=t.schema.field(id_column).type)
        if sums is not None:
            cols[sum_alias] = pa.array(sums, type=pa.int64())
        return pa.table(cols)

    parts = _collect_small(sorted_rows.map_batches(
        edge_partials, batch_format="pyarrow", batch_size=None))
    interior = sorted_rows.map_batches(
        combine_interior, batch_format="pyarrow", batch_size=None)
    if parts is None:
        return interior
    # NUL-safe driver merge: pandas groupby hashes object strings like C
    # strings and WRONGLY COLLAPSES keys that differ only past an embedded
    # '\x00' (the packed-pair key idiom — domain_links — produces exactly
    # those); numpy argsort + reduceat compares full values
    keys = parts[key_column].to_numpy(zero_copy_only=False)
    order = np.argsort(keys, kind="stable")
    k_s = keys[order]
    g_starts = np.r_[0, np.flatnonzero(k_s[1:] != k_s[:-1]) + 1]
    cnt_m = np.add.reduceat(
        parts[count_alias].to_numpy(zero_copy_only=False)[order], g_starts)
    cols_m = {key_column: pa.array(
        k_s[g_starts].tolist(), type=parts.schema.field(key_column).type),
        count_alias: pa.array(cnt_m, type=pa.int64())}
    if id_column is not None:
        cols_m[keep_alias] = pa.array(
            np.minimum.reduceat(
                parts[keep_alias].to_numpy(zero_copy_only=False)[order],
                g_starts).tolist(),
            type=parts.schema.field(keep_alias).type)
    if sum_column is not None:
        cols_m[sum_alias] = pa.array(np.add.reduceat(
            parts[sum_alias].to_numpy(zero_copy_only=False)[order],
            g_starts), type=pa.int64())
    boundary = pa.table(cols_m)
    if min_count is not None:
        import pyarrow.compute as pc

        boundary = boundary.filter(
            pc.greater_equal(boundary[count_alias], min_count))
    if not boundary.num_rows:
        return interior
    return interior.union(
        ray.data.from_arrow(boundary.select(parts.column_names)
                            .cast(parts.schema)))


def grouped_rank_drop_ids(rows, key_column: str, id_column: str,
                          cap: int, _presorted: bool = False):
    """Ids whose 0-based rank within their ``key_column`` group, ordered
    by ascending id, is ``>= cap`` -> Dataset(id_column) — the drop side
    of a keep-at-most-``cap``-per-group policy (per-domain corpus caps).

    One range sort by (key, id) + a per-block positional-rank sweep.
    Exact at ANY key skew via the edge-piece OFFSET repair (the rank
    sibling of the count repair in :func:`_grouped_count_min`): interior
    runs never straddle globally ordered blocks, so their local ranks
    are global; the first/last run of every block emits a
    (key, piece_min_id, piece_count) partial (<= 2 rows per block), the
    driver orders each straddling key's pieces by ``piece_min_id``
    (well-defined: the blocks are globally (key, id)-ordered) and
    broadcasts each piece's cumulative prior count, which the rank sweep
    adds back.  A hot domain wider than a whole block ranks exactly.

    Ids must be UNIQUE (doc ids) — duplicate ids across blocks would
    make the piece order ambiguous; exact-dedup first."""
    import ray
    import ray.data

    sorted_rows = (rows if _presorted
                   else rows.sort([key_column, id_column])).materialize()

    def _edge_empty(t: pa.Table) -> pa.Table:
        return pa.table({
            key_column: pa.array([], t.schema.field(key_column).type),
            "_piece_min": pa.array([], t.schema.field(id_column).type),
            "_piece_cnt": pa.array([], pa.int64())})

    def edge_pieces(t: pa.Table) -> pa.Table:
        n = len(t)
        if n == 0:
            return _edge_empty(t)
        col = t[key_column].combine_chunks()
        starts = _run_starts_arrow(col, n)
        bounds = [(0, int(starts[1]) if len(starts) > 1 else n)]
        if len(starts) > 1:
            bounds.append((int(starts[-1]), n))
        ids = t[id_column].combine_chunks()
        take = [s for s, _ in bounds]
        return pa.table({
            key_column: col.take(pa.array(take)),
            "_piece_min": ids.take(pa.array(take)),  # block is id-sorted
            "_piece_cnt": pa.array([e - s for s, e in bounds],
                                   type=pa.int64())})

    parts = _collect_small(sorted_rows.map_batches(
        edge_pieces, batch_format="pyarrow", batch_size=None))
    offsets: dict = {}
    if parts is not None and parts.num_rows:
        # pieces of one key, ordered by their min id (disjoint id ranges
        # under the global (key, id) sort) -> cumulative prior counts.
        # numpy two-pass stable sort, NOT pandas groupby (which compares
        # object strings like C strings and collapses keys differing only
        # past an embedded '\x00').  Single-piece keys need no repair; a
        # key appearing as both first and last run of a single-run block
        # emitted one combined row, so no double count.
        keys = parts[key_column].to_numpy(zero_copy_only=False)
        pmin = parts["_piece_min"].to_numpy(zero_copy_only=False)
        pcnt = parts["_piece_cnt"].to_numpy(zero_copy_only=False)
        o1 = np.argsort(pmin, kind="stable")
        order = o1[np.argsort(keys[o1], kind="stable")]
        k_s, m_s, c_s = keys[order], pmin[order], pcnt[order]
        g_starts = np.r_[0, np.flatnonzero(k_s[1:] != k_s[:-1]) + 1]
        g_lens = np.diff(np.r_[g_starts, len(k_s)])
        cs = np.cumsum(c_s)
        run_base = np.repeat(cs[g_starts] - c_s[g_starts], g_lens)
        off = cs - c_s - run_base
        multi = np.repeat(g_lens > 1, g_lens)
        take = multi & (off > 0)
        offsets = {(k, m): int(o) for k, m, o in zip(
            k_s[take], m_s[take], off[take])}
    oref = ray.put(offsets)

    def drop_rows(t: pa.Table) -> pa.Table:
        n = len(t)
        id_type = t.schema.field(id_column).type
        if n == 0:
            return pa.table({id_column: pa.array([], id_type)})
        col = t[key_column].combine_chunks()
        starts = _run_starts_arrow(col, n)
        ends = np.r_[starts[1:], n]
        lens = ends - starts
        rank = np.arange(n, dtype=np.int64) - np.repeat(starts, lens)
        off_map = ray.get(oref)
        if off_map:
            ids_arrow = t[id_column].combine_chunks()
            run_off = np.zeros(len(starts), dtype=np.int64)
            for ri in {0, len(starts) - 1}:
                s = int(starts[ri])
                key = (col[s].as_py(), ids_arrow[s].as_py())
                run_off[ri] = off_map.get(key, 0)
            rank += np.repeat(run_off, lens)
        drop = rank >= cap
        return pa.table(
            {id_column: t[id_column].filter(pa.array(drop))})

    return sorted_rows.map_batches(
        drop_rows, batch_format="pyarrow", batch_size=None)


def _sorted_member(sorted_arr: np.ndarray, values: np.ndarray) -> np.ndarray:
    """Boolean membership of ``values`` in a SORTED array via clamped
    searchsorted — the broadcast-filter idiom used across this module."""
    if not len(sorted_arr):
        return np.zeros(len(values), dtype=bool)
    pos = np.searchsorted(sorted_arr, values)
    pos[pos == len(sorted_arr)] = 0
    return sorted_arr[pos] == values


def _input_fingerprint(ds) -> str:
    from iresearch_ray.util import input_fingerprint

    return input_fingerprint(ds)


def _sketch_checkpoint(sk, ckpt: str, params: dict):
    """Write the sketch Dataset to ``ckpt`` as Parquet ONCE and re-read it,
    so downstream passes read files instead of pinning the object store or
    re-running the upstream pipeline.  Resumes when the marker matches
    ``params`` exactly (callers include an input fingerprint); a matching
    dir built by US with stale params is rebuilt; parquet we did not write
    (no marker) is REFUSED rather than appended-to or deleted."""
    import json as _json
    import os
    import shutil

    import ray.data

    marker = os.path.join(ckpt, "_sketch_done.json")
    resume = False
    if os.path.exists(marker):
        with open(marker) as f:
            recorded = _json.load(f)
        if recorded == params:
            resume = True  # sketches on disk match config + input
        else:
            shutil.rmtree(ckpt)
            os.makedirs(ckpt, exist_ok=True)
    elif os.path.isdir(ckpt) and any(
            f.endswith(".parquet") for f in os.listdir(ckpt)):
        raise ValueError(
            f"checkpoint_dir {ckpt!r} contains parquet files not written "
            "by this sketch pipeline; point it at an empty or dedicated "
            "directory")
    if not resume:
        sk.write_parquet(ckpt)
        with open(marker, "w") as f:
            _json.dump(params, f)
    return ray.data.read_parquet(ckpt)


def exact_dedup_groups(ds, text_column: str = "text",
                       id_column: str = "doc_id", hash: str = "md5"):
    """Group exact duplicates: -> (text_hash, dup_count, keep_id=min id).

    Hash inside map_batches (only hash+id leave the node), then one
    sort+combine aggregation on the 128-bit content hash
    (:func:`_grouped_count_min`).

    ``hash='md5'`` emits the 32-char hex digest — the SQL-oracle twin
    (DuckDB ``md5(text)``), a per-row C md5 over the full document.
    ``hash='stable'`` is the at-scale fast path: a vectorized 128-bit
    siphash pair as fixed_size_binary[16] (half the shuffle payload of
    the hex string).  Both are exact — identical texts always collide,
    and 128 bits keeps accidental collisions negligible at 10^12 docs;
    they just aren't the SAME key space."""
    from iresearch_ray.analysis.minhash import stable_hash_strings128

    if hash not in ("md5", "stable"):
        raise ValueError(f"hash must be 'md5' or 'stable', got {hash!r}")

    def hash_batch(b: pa.Table) -> pa.Table:
        if hash == "stable":
            # the Arrow column goes straight to the vectorized hasher
            key = stable_hash_strings128(b[text_column])
        else:
            # explicit type: an empty block would infer null and break
            # schema unification under the downstream range sort
            key = pa.array(_md5_hex(b[text_column].to_pylist()),
                           type=pa.string())
        return pa.table({"text_hash": key, id_column: b[id_column]})

    hashed = ds.map_batches(hash_batch, batch_format="pyarrow")
    return _grouped_count_min(hashed, "text_hash", id_column)


def fingerprint_dedup_groups(ds, text_column: str = "text",
                             id_column: str = "doc_id", analyzer: str = "ascii"):
    """Bag-of-words fingerprint dedup: identical token multisets collide
    regardless of word order: -> (fingerprint, dup_count, keep_id)."""

    class FpBatch:
        def __init__(self):
            self.analyzer = get_analyzer(analyzer)

        def __call__(self, b: pa.Table) -> pa.Table:
            fps = [hashlib.md5(" ".join(sorted(self.analyzer.tokens(t))).encode()).hexdigest()
                   for t in b[text_column].to_pylist()]
            return pa.table({"fingerprint": pa.array(fps, type=pa.string()),
                             id_column: b[id_column]})

    hashed = ds.map_batches(StatelessBatchFn(FpBatch), batch_format="pyarrow")
    return _grouped_count_min(hashed, "fingerprint", id_column)


class MinHashBatch:
    """Batch stage: text -> (doc_id, band, band_hash, signature).
    Run via StatelessBatchFn (cheap analyzer state, once per worker)."""

    def __init__(self, text_column, id_column, analyzer, num_hashes, bands,
                 shingle_k, hash="stable"):
        self.text_column = text_column
        self.id_column = id_column
        self.analyzer = get_analyzer(analyzer)
        self.num_hashes = num_hashes
        self.bands = bands
        self.shingle_k = shingle_k
        self.hasher = _term_hasher(hash)

    def __call__(self, b: pa.Table) -> pa.Table:
        texts = b[self.text_column].to_pylist()
        ids = b[self.id_column].to_numpy()

        def empty() -> pa.Table:
            return pa.table({
                self.id_column: pa.array([], type=b[self.id_column].type),
                "band": pa.array([], type=pa.int64()),
                "band_hash": pa.array([], type=pa.int64()),
                "signature": pa.array([], type=pa.binary()),
            })

        if not texts:  # empty block (empty row group / upstream filter)
            return empty()
        hashes, offsets = _shingle_hashes_per_doc(
            texts, self.analyzer, self.shingle_k, self.hasher)
        sigs = minhash_signatures(hashes, offsets, self.num_hashes)
        bh = band_hashes(sigs, self.bands)
        # token-less docs have an EMPTY shingle set: Jaccard with anything
        # is undefined, and their untouched all-max signatures would
        # otherwise collide with every other empty doc at est 1.0
        keep = np.diff(offsets) > 0
        if not keep.all():
            ids, sigs, bh = ids[keep], sigs[keep], bh[keep]
        n, B = int(keep.sum()), self.bands
        if n == 0:
            return empty()
        sig_bytes = np.ascontiguousarray(sigs).view(np.uint8).reshape(n, -1)
        # fixed-width binary signatures (one blob per band row): no Python
        # list rows, shuffle-friendly
        width = sig_bytes.shape[1]
        flat = np.repeat(sig_bytes, B, axis=0).reshape(-1)
        offs = np.arange(0, (n * B + 1) * width, width, dtype=np.int32)
        sig_col = pa.BinaryArray.from_buffers(
            pa.binary(), n * B, [None, pa.py_buffer(offs.tobytes()),
                                 pa.py_buffer(flat.tobytes())])
        return pa.table({
            self.id_column: pa.array(np.repeat(ids, B)),
            "band": pa.array(np.tile(np.arange(B, dtype=np.int64), n)),
            "band_hash": pa.array(bh.reshape(-1).view(np.int64)),
            "signature": sig_col,
        })


def _combined_bucket_key(band: np.ndarray, band_hash: np.ndarray) -> np.ndarray:
    """One uint64 key per (band, band_hash) row: hash XOR band<<56.
    Cross-band collisions need the low 56 hash bits to match exactly, and a
    spurious collision only adds a candidate row that the per-(band,
    band_hash) pairwise verification below discards — never a miss."""
    return (band_hash.astype(np.int64, copy=False).view(np.uint64)
            ^ (band.astype(np.uint64) << np.uint64(56)))


def minhash_lsh_pairs(ds, text_column: str = "text", id_column: str = "doc_id",
                      analyzer: str = "ascii", num_hashes: int = 64,
                      bands: int = 16, shingle_k: int = 3,
                      threshold: float = 0.8, concurrency: int | None = None,
                      checkpoint_dir: str | None = None, hash: str = "stable"):
    """Near-duplicate candidate pairs via MinHash + LSH banding.

    map_batches(sketch) -> count-only groupby finds buckets with >= 2
    docs -> broadcast membership filter keeps only colliding rows ->
    pairwise signature-Jaccard estimate per bucket -> pairs with
    est >= threshold, max-deduped across bands.
    Returns Dataset(id_a, id_b, est_jaccard) with id_a < id_b.

    ``checkpoint_dir``: where the sketch dataset is checkpointed as
    Parquet between the count pass and the membership filter (so neither
    re-tokenizes the corpus and nothing pins the object store); defaults
    to a scratch dir removed on return — at scale pass a shared
    filesystem path to make the sketch pass resumable.
    """
    import shutil
    import tempfile

    import pyarrow.compute as pc
    import ray
    import ray.data

    sk = ds.map_batches(
        StatelessBatchFn(MinHashBatch, dict(
            text_column=text_column, id_column=id_column, analyzer=analyzer,
            num_hashes=num_hashes, bands=bands, shingle_k=shingle_k,
            hash=hash)),
        batch_format="pyarrow",
        concurrency=pool_size(concurrency) if concurrency else None)
    # checkpoint the (corpus-small, but not driver-small) sketches to
    # Parquet so the two downstream passes re-read files instead of either
    # re-tokenizing the corpus or pinning every sketch in the object store
    own_ckpt = checkpoint_dir is None
    ckpt = checkpoint_dir or tempfile.mkdtemp(prefix="iresearch_minhash_")
    try:
        params = {"num_hashes": num_hashes, "bands": bands,
                  "shingle_k": shingle_k, "analyzer": analyzer,
                  "text_column": text_column, "id_column": id_column,
                  # fingerprinting may fall back to ds.count() (a full
                  # pipeline execution); a mkdtemp checkpoint can never
                  # be resumed, so skip it there
                  "hash": hash,
                  "input": _input_fingerprint(ds) if not own_ckpt else ""}
        sk = _sketch_checkpoint(sk, ckpt, params)

        # per-group map_groups over ~n_docs*bands tiny buckets pays Ray's
        # per-group UDF cost on EVERY bucket; near-dup collisions are rare,
        # so instead: (1) a count-only shuffle of the light (band,
        # band_hash) projection finds hot buckets, (2) a broadcast
        # membership filter keeps only colliding rows — data volume =
        # candidate set, not corpus — (3) vectorized pairing on the
        # (output-sized) survivors.
        def bucket_keys(b: pa.Table) -> pa.Table:
            return pa.table({"bkey": pa.array(_combined_bucket_key(
                b["band"].to_numpy(),
                b["band_hash"].to_numpy()).view(np.int64))})

        # count-only sort+combine with the >=2 filter fused in, so
        # singleton buckets never leave the combine task
        counts = _grouped_count_min(
            sk.map_batches(bucket_keys, batch_format="pyarrow"),
            "bkey", None, count_alias="n", min_count=2)
        sch = sk.schema()  # ray Schema wrapper: parallel names/types lists
        id_dtype = dict(zip(sch.names, sch.types))[id_column].to_pandas_dtype()
        hot = counts.to_pandas()  # bounded by colliding buckets, not corpus
        if not len(hot):
            return ray.data.from_pandas(
                pd.DataFrame({"id_a": pd.Series([], dtype=id_dtype),
                              "id_b": pd.Series([], dtype=id_dtype),
                              "est_jaccard": pd.Series([], dtype=np.float64)}))
        hot_keys = np.sort(hot["bkey"].to_numpy().view(np.uint64))
        hot_ref = ray.put(hot_keys)

        def keep_hot(b: pa.Table) -> pa.Table:
            keys = ray.get(hot_ref)
            k = _combined_bucket_key(b["band"].to_numpy(),
                                     b["band_hash"].to_numpy())
            return b.filter(pa.array(_sorted_member(keys, k)))

        cand = sk.map_batches(keep_hot, batch_format="pyarrow").to_pandas()
    finally:
        if own_ckpt:
            shutil.rmtree(ckpt, ignore_errors=True)
    out_a, out_b, out_j = [], [], []
    for (_, _), g in cand.groupby(["band", "band_hash"], sort=True):
        if len(g) < 2:
            continue
        g = g.sort_values(id_column)
        ids = g[id_column].to_numpy()
        sigs = np.stack([np.frombuffer(s, dtype=np.uint64)
                         for s in g["signature"]])
        for i in range(len(ids)):
            eq = (sigs[i + 1:] == sigs[i]).mean(axis=1)
            hit = np.flatnonzero(eq >= threshold)
            out_a.extend([ids[i]] * len(hit))
            out_b.extend(ids[i + 1 + hit])
            out_j.extend(eq[hit])
    pairs = pd.DataFrame({  # id dtype follows the INPUT id column on
        # every path, including zero-pair results
        "id_a": pd.Series(out_a, dtype=id_dtype),
        "id_b": pd.Series(out_b, dtype=id_dtype),
        "est_jaccard": pd.Series(out_j, dtype=np.float64)})
    if len(pairs):
        pairs = (pairs.groupby(["id_a", "id_b"], as_index=False)
                 ["est_jaccard"].max())
    return ray.data.from_pandas(pairs)


class ShingleSetBatch:
    """Batch stage: text -> (doc_id, n, set) where ``set`` is the doc's
    DISTINCT token-k-shingle hashes as a sorted uint64 blob.  Zero-shingle
    docs are dropped (empty set: Jaccard undefined).  Run via
    StatelessBatchFn (cheap analyzer state, once per worker)."""

    def __init__(self, text_column, id_column, analyzer, shingle_k,
                 hash="stable"):
        self.text_column = text_column
        self.id_column = id_column
        self.analyzer = get_analyzer(analyzer)
        self.shingle_k = shingle_k
        self.hasher = _term_hasher(hash)

    def __call__(self, b: pa.Table) -> pa.Table:
        texts = b[self.text_column].to_pylist()
        ids = b[self.id_column].to_numpy(zero_copy_only=False)
        hashes, offsets = _shingle_hashes_per_doc(
            texts, self.analyzer, self.shingle_k, self.hasher)
        keep_ids, ns, blobs = [], [], []
        for i in range(len(texts)):
            arr = np.unique(hashes[offsets[i]:offsets[i + 1]])
            if len(arr):
                keep_ids.append(ids[i])
                ns.append(len(arr))
                blobs.append(arr.tobytes())
        return pa.table({
            self.id_column: pa.array(keep_ids, type=b[self.id_column].type),
            "n": pa.array(np.asarray(ns, dtype=np.int64)),
            "set": pa.array(blobs, type=pa.binary()),
        })


def _jaccard_prefix_len(n: np.ndarray, threshold: float) -> np.ndarray:
    """Prefix-filter length per set size: p = n - ceil(t*n) + 1.  Any pair
    with J >= t has overlap >= ceil(t*|A|) (J >= t -> |A∩B| >= t|A∪B| >=
    t|A|), and by the prefix lemma (Bayardo et al., "Scaling Up All Pairs
    Similarity Search", WWW'07 — public) the smallest common element then
    falls inside both docs' first p elements under ANY shared total
    order.  ceil(t*n) is computed EXACTLY over the rational value of the
    float threshold (per unique size, Python bigints) — float ceil can
    overestimate t*n past any absolute epsilon once n is large, which
    would shorten the prefix and silently drop qualifying pairs."""
    from fractions import Fraction

    t = Fraction(float(threshold))
    un = np.unique(n)
    alphas = np.array(
        [(t.numerator * int(v) + t.denominator - 1) // t.denominator
         for v in un], dtype=np.int64)
    a = alphas[np.searchsorted(un, n)]
    return (n - a + 1).clip(min=1)


def ngram_jaccard_pairs(ds, text_column: str = "text",
                        id_column: str = "doc_id", analyzer: str = "ascii",
                        shingle_k: int = 3, threshold: float = 0.8,
                        concurrency: int | None = None,
                        checkpoint_dir: str | None = None,
                        hash: str = "stable", hot_df_min: int = 16,
                        distributed_verify_min: int = 200_000):
    """EXACT n-gram (token-shingle set) Jaccard near-duplicate pairs:
    every pair with J(A, B) >= threshold, verified with true set
    intersections — unlike minhash_lsh_pairs there is no estimation, so
    the output is candidate-order-independent and admits an exact SQL
    oracle.  Returns Dataset(id_a, id_b, jaccard) with id_a < id_b.

    Scale shape (prefix filtering, PPJoin family):
    1. one map_batches pass tokenizes and checkpoints each doc's sorted
       distinct shingle-hash set to Parquet (resumable, object store
       never pins the corpus);
    2. a count-only shuffle finds GLOBALLY HOT shingles (df >=
       ``hot_df_min``); the bounded hot map is broadcast and each doc's
       shingles are re-ordered rarest-first (df, hash) — the canonical
       PPJoin ordering that keeps stopword shingles OUT of prefixes, so
       candidate groups stay tiny on skewed corpora;
    3. each doc emits only its first n - ceil(t*n) + 1 shingles as
       candidate keys (complete by the prefix lemma, see
       _jaccard_prefix_len); colliding keys are found with the same
       count-groupby + broadcast-membership shape as minhash_lsh_pairs;
    4. candidate pairs (output-sized after the prefix + |A|/|B| size
       filters) are verified on the driver with exact sorted-array
       intersections read back from the checkpoint.
    Reference parity: the reference estimates Jaccard via its minhash
    analyzer (core/analysis/minhash_token_stream.cpp); this operator is
    the exact-verification sibling the training-data brief asks for.
    """
    import shutil
    import tempfile

    import pyarrow.compute as pc
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    if not (0.0 < threshold <= 1.0):
        raise ValueError("threshold must be in (0, 1]")
    sk = ds.map_batches(
        StatelessBatchFn(ShingleSetBatch, dict(
            text_column=text_column, id_column=id_column, analyzer=analyzer,
            shingle_k=shingle_k, hash=hash)),
        batch_format="pyarrow",
        concurrency=pool_size(concurrency) if concurrency else None)
    sch = ds.schema()
    id_dtype = dict(zip(sch.names, sch.types))[id_column].to_pandas_dtype()

    def empty_pairs():
        return ray.data.from_pandas(pd.DataFrame({
            "id_a": pd.Series([], dtype=id_dtype),
            "id_b": pd.Series([], dtype=id_dtype),
            "jaccard": pd.Series([], dtype=np.float64)}))

    own_ckpt = checkpoint_dir is None
    ckpt = checkpoint_dir or tempfile.mkdtemp(prefix="iresearch_ngjac_")
    try:
        params = {"shingle_k": shingle_k, "analyzer": analyzer,
                  "text_column": text_column, "id_column": id_column,
                  "hash": hash,
                  "input": _input_fingerprint(ds) if not own_ckpt else ""}
        sk = _sketch_checkpoint(sk, ckpt, params)

        # ---- pass 1: globally hot shingles (bounded by hot_df_min) ----
        def partial_counts(b: pa.Table) -> pa.Table:
            # shuffle keys ship as int64 BIT VIEWS of the uint64 hashes
            # (same convention as band_hash) — Ray's sort-based groupby
            # pickles uint64 columns on some paths
            if not len(b):
                return pa.table({"sh": pa.array([], type=pa.int64()),
                                 "c": pa.array([], type=pa.int64())})
            cat = np.concatenate([np.frombuffer(s, dtype=np.uint64)
                                  for s in b["set"].to_pylist()])
            u, c = np.unique(cat, return_counts=True)
            return pa.table({"sh": pa.array(u.view(np.int64)),
                             "c": pa.array(c.astype(np.int64))})

        hot = (sk.map_batches(partial_counts, batch_format="pyarrow")
               .groupby("sh").aggregate(Sum("c", alias_name="df"))
               .map_batches(lambda t: t.filter(
                   pc.greater_equal(t["df"], hot_df_min)),
                   batch_format="pyarrow")
               .to_pandas())  # bounded: only shingles with df>=hot_df_min
        if len(hot):
            sh_u = hot["sh"].to_numpy().astype(np.int64).view(np.uint64)
            order = np.argsort(sh_u)
            hot_sh = sh_u[order]
            hot_df = hot["df"].to_numpy().astype(np.uint64)[order]
        else:  # empty results can arrive with no columns at all
            hot_sh = np.empty(0, np.uint64)
            hot_df = np.empty(0, np.uint64)
        hot_ref = ray.put((hot_sh, hot_df))

        # ---- pass 2: prefix-key emission under the (df, hash) order ----
        def emit_prefix(b: pa.Table) -> pa.Table:
            hs, hd = ray.get(hot_ref)
            keys, docs, sizes = [], [], []
            ns = b["n"].to_numpy()
            plen = _jaccard_prefix_len(ns, threshold)
            for i, blob in enumerate(b["set"].to_pylist()):
                arr = np.frombuffer(blob, dtype=np.uint64)
                df = np.ones(len(arr), dtype=np.uint64)
                if len(hs):
                    pos = np.searchsorted(hs, arr)
                    pos[pos == len(hs)] = 0
                    m = hs[pos] == arr
                    df[m] = hd[pos[m]]
                # rarest-first total order, hash tie-break: ANY shared
                # total order preserves completeness
                order = np.lexsort((arr, df))
                pfx = arr[order[:plen[i]]]
                keys.append(pfx)
                docs.append(np.full(len(pfx), i, dtype=np.int64))
                sizes.append(np.full(len(pfx), ns[i], dtype=np.int64))
            if not keys:
                return pa.table({
                    "key": pa.array([], type=pa.int64()),
                    id_column: pa.array([], type=b[id_column].type),
                    "n": pa.array([], type=pa.int64())})
            rows = np.concatenate(docs)
            return pa.table({
                "key": pa.array(np.concatenate(keys).view(np.int64)),
                id_column: b[id_column].take(pa.array(rows)),
                "n": pa.array(np.concatenate(sizes))})

        pfx = sk.map_batches(emit_prefix, batch_format="pyarrow")

        # count-only sort+combine, >=2 filter fused (singleton prefix
        # keys — the vast majority — never leave the combine task)
        hotk = _grouped_count_min(
            pfx.select_columns(["key"]), "key", None,
            count_alias="c", min_count=2).to_pandas()
        if not len(hotk):
            return empty_pairs()
        hot_keys = np.sort(hotk["key"].to_numpy().astype(np.int64))
        hk_ref = ray.put(hot_keys)

        def keep_colliding(b: pa.Table) -> pa.Table:
            hk = ray.get(hk_ref)
            k = b["key"].to_numpy().astype(np.int64, copy=False)
            return b.filter(pa.array(_sorted_member(hk, k)))

        cand = pfx.map_batches(keep_colliding,
                               batch_format="pyarrow").to_pandas()

        # ---- candidate pairs (driver-side, candidate-set-sized; every
        # step below is vectorized — a dense-shingle corpus can hit tens
        # of millions of candidates before the exact filter) ----
        keys_c = cand["key"].to_numpy()
        ids_c, id_codes = np.unique(cand[id_column].to_numpy(),
                                    return_inverse=True)
        if len(ids_c) >= 1 << 32:  # pair codes pack into one uint64
            raise ValueError(
                "more than 2^32 candidate docs — the driver-side pairing "
                "assumes an output-sized candidate set; raise threshold "
                "or hot_df_min")
        ns_by_code = np.empty(len(ids_c), dtype=np.int64)
        ns_by_code[id_codes] = cand["n"].to_numpy()

        # ---- all pairs within each key group, no Python per group:
        # sort rows by (key, code), dedupe, then pair every row with its
        # r predecessors in the same segment via repeat/arange algebra
        o = np.lexsort((id_codes, keys_c))
        k_s, c_s = keys_c[o], id_codes[o]
        first = np.r_[True, (k_s[1:] != k_s[:-1]) | (c_s[1:] != c_s[:-1])]
        k_u, c_u = k_s[first], c_s[first]
        seg_first = np.r_[True, k_u[1:] != k_u[:-1]]
        seg_start = np.flatnonzero(seg_first)
        seg_id = np.cumsum(seg_first) - 1
        row = np.arange(len(k_u), dtype=np.int64)
        r = row - seg_start[seg_id]          # rank within segment
        n_pairs = int(r.sum())
        if n_pairs == 0:
            return empty_pairs()
        hi_rows = np.repeat(row, r)
        before = np.zeros(len(r), dtype=np.int64)
        np.cumsum(r[:-1], out=before[1:])
        off_in_block = np.arange(n_pairs, dtype=np.int64) - np.repeat(
            before, r)
        lo_rows = np.repeat(seg_start[seg_id], r) + off_in_block
        lo, hi = c_u[lo_rows], c_u[hi_rows]   # lo < hi (codes ascend)
        # dedup across keys + size filter (J >= t needs t <= |A|/|B| <=
        # 1/t), all on packed int codes
        packed = np.unique(lo.astype(np.uint64) << np.uint64(32)
                           | hi.astype(np.uint64))
        lo = (packed >> np.uint64(32)).astype(np.int64)
        hi = (packed & np.uint64(0xFFFFFFFF)).astype(np.int64)
        na, nb = ns_by_code[lo], ns_by_code[hi]
        # size PRUNE (J >= t needs t <= |A|/|B| <= 1/t): relative epsilon
        # keeps float rounding from ever making it over-strict — being
        # slightly permissive only adds candidates the exact verification
        # below discards
        slack = threshold * (1.0 - 1e-12)
        okm = ((nb * slack - 1e-9 <= na)
               & (na * slack - 1e-9 <= nb))
        lo, hi = lo[okm], hi[okm]
        if not len(lo):
            return empty_pairs()

        # ---- exact verification from the checkpointed sets ----
        need_arr = pa.array(ids_c)

        def keep_needed(b: pa.Table) -> pa.Table:
            return b.filter(pc.is_in(b[id_column], value_set=need_arr))

        sets_df = sk.map_batches(keep_needed,
                                 batch_format="pyarrow").to_pandas()
        # CSR of the candidate docs' sorted shingle sets, indexed by the
        # same codes as lo/hi (one C-speed join, no per-doc copies)
        code_of = {v: i for i, v in enumerate(ids_c)}
        blob_by_code = [b""] * len(ids_c)
        for v, s in zip(sets_df[id_column].to_numpy(),
                        sets_df["set"].to_numpy()):
            blob_by_code[code_of[v]] = s
        flat = np.frombuffer(b"".join(blob_by_code), dtype=np.uint64)
        sizes = np.fromiter((len(s) >> 3 for s in blob_by_code),
                            dtype=np.int64, count=len(ids_c))
        offs = np.zeros(len(ids_c) + 1, dtype=np.int64)
        np.cumsum(sizes, out=offs[1:])
        # per-pair |A ∩ B| via _csr_intersect_counts: small candidate
        # sets verify on the driver; large ones fan out as a Ray stage
        # over pair batches with the CSR shipped ONCE via ray.put (the
        # verification compute then scales with the cluster instead of
        # one driver core)
        if len(lo) <= distributed_verify_min:
            inter = _csr_intersect_counts(flat, offs, sizes, lo, hi)
        else:
            csr_ref = ray.put((flat, offs, sizes))

            def verify(b: pa.Table) -> pa.Table:
                f, of, sz = ray.get(csr_ref)
                lo_b = b["lo"].to_numpy()
                hi_b = b["hi"].to_numpy()
                return pa.table({
                    "lo": b["lo"], "hi": b["hi"],
                    "inter": pa.array(_csr_intersect_counts(
                        f, of, sz, lo_b, hi_b))})

            # from_arrow(one_table) is ONE block = one task; slice into
            # real blocks so verification actually fans out (slices keep
            # the lo-major order, so per-block grouping stays effective)
            tbl = pa.table({"lo": pa.array(lo), "hi": pa.array(hi)})
            n_blocks = int(min(256, max(8, len(lo) // 100_000)))
            step = -(-len(lo) // n_blocks)
            ver = (ray.data.from_arrow(
                       [tbl.slice(i, step)
                        for i in range(0, len(lo), step)])
                   .map_batches(verify, batch_format="pyarrow")
                   .to_pandas())
            lo = ver["lo"].to_numpy()
            hi = ver["hi"].to_numpy()
            inter = ver["inter"].to_numpy()
        na, nb = sizes[lo], sizes[hi]
        j = inter / (na + nb - inter)
        keep = j >= threshold
        a_ids = ids_c[lo[keep]]
        b_ids = ids_c[hi[keep]]
        swap = a_ids > b_ids  # id order, not code order
        a_out = np.where(swap, b_ids, a_ids)
        b_out = np.where(swap, a_ids, b_ids)
        out_j = j[keep]
    finally:
        if own_ckpt:
            shutil.rmtree(ckpt, ignore_errors=True)
    return ray.data.from_pandas(pd.DataFrame({
        "id_a": pd.Series(a_out, dtype=id_dtype),
        "id_b": pd.Series(b_out, dtype=id_dtype),
        "jaccard": pd.Series(out_j, dtype=np.float64)}))


def _term_hasher(name: str):
    """Token-hash family: 'stable' (fast pandas hash) or 'md5'
    (reproducible in SQL as DuckDB md5_number_lower, enabling exact
    oracles for sketch pipelines)."""
    if name == "md5":
        from iresearch_ray.analysis.minhash import md5_hash_strings

        return md5_hash_strings
    return stable_hash_strings


def rolling_doc_fingerprints(ds, text_column: str = "text",
                             id_column: str = "doc_id",
                             analyzer: str = "ascii", k: int = 5,
                             sample_mod: int = 8,
                             concurrency: int | None = None,
                             hash: str = "stable"):
    """Distributed document fingerprinting: Rabin-Karp rolling hash over
    k-token windows, 0-mod-q sampled -> Dataset(id, fingerprint).

    Pure map_batches (no shuffle): each batch tokenizes via the coded
    Arrow fast path, hashes the small batch DICTIONARY once and gathers
    per-occurrence hashes, then runs the vectorized rolling kernel."""
    from iresearch_ray.analysis.minhash import rolling_fingerprints
    from iresearch_ray.pipelines.textstats import _coded_tokens

    hasher = _term_hasher(hash)

    class FpBatch:
        def __init__(self):
            self.analyzer = get_analyzer(analyzer)

        def __call__(self, b: pa.Table) -> pa.Table:
            codes, dict_np, _, doc_len = _coded_tokens(
                self.analyzer, b[text_column])
            offs = np.zeros(len(doc_len) + 1, dtype=np.int64)
            np.cumsum(doc_len, out=offs[1:])
            th = (hasher(dict_np)[codes] if len(dict_np)
                  else np.empty(0, np.uint64))
            d, f = rolling_fingerprints(th, offs, k=k, sample_mod=sample_mod)
            ids = b[id_column].to_numpy(zero_copy_only=False)
            # explicit id type: an all-tokenless batch yields an empty
            # slice that pa.array would otherwise infer as null-typed
            return pa.table({
                id_column: pa.array(ids[d], type=b[id_column].type),
                "fingerprint": pa.array(f.view(np.int64))})

    return ds.map_batches(
        StatelessBatchFn(FpBatch), batch_format="pyarrow",
        concurrency=pool_size(concurrency) if concurrency else None)


def contamination_check(ds, probe_texts, text_column: str = "text",
                        id_column: str = "doc_id", analyzer: str = "ascii",
                        shingle_k: int = 8,
                        concurrency: int | None = None,
                        hash: str = "stable"):
    """Benchmark decontamination: per corpus doc, how many of its token
    k-shingles appear ANYWHERE in the probe (benchmark/eval) set.

    Returns Dataset(doc_id, matched, total, frac) for every doc with at
    least one shingle (frac = matched/total; docs with frac > 0 overlap
    the benchmark and are decontamination candidates).

    Scale shape: the probe side is small by nature (eval sets are KBs–MBs
    against a 100-TB corpus), so its distinct shingle hashes are computed
    driver-side, sorted, and broadcast ONCE via ray.put; the corpus side
    is a pure map_batches sweep — per batch one concatenated hash pass
    and one vectorized searchsorted membership per doc slice.  No
    shuffle, no second pass, nothing corpus-sized in the object store.

    ``probe_texts``: iterable of probe document strings (or a small
    Dataset with ``text_column``, pulled to the driver — bounded by the
    eval-set size, not the corpus).
    """
    import ray
    import ray.data

    ana = get_analyzer(analyzer)
    hasher = _term_hasher(hash)
    if hasattr(probe_texts, "to_pandas"):  # small Dataset probe side
        probe_texts = probe_texts.to_pandas()[text_column].tolist()
    probe_shingles: list[str] = []
    for t in probe_texts:
        probe_shingles.extend(shingles(ana.tokens(t), shingle_k))
    probe_hashes = (np.unique(hasher(probe_shingles)) if probe_shingles
                    else np.empty(0, np.uint64))
    probe_ref = ray.put(probe_hashes)

    class ContaminationBatch:
        def __init__(self):
            self.analyzer = get_analyzer(analyzer)
            self.hasher = _term_hasher(hash)

        def __call__(self, b: pa.Table) -> pa.Table:
            texts = b[text_column].to_pylist()
            ids = b[id_column].to_numpy(zero_copy_only=False)
            hashes, offsets = _shingle_hashes_per_doc(
                texts, self.analyzer, shingle_k, self.hasher)
            hit = _sorted_member(ray.get(probe_ref), hashes)
            # distinct-shingle accounting per doc (matches the set
            # semantics of the SQL oracle)
            keep, matched, total = [], [], []
            for i in range(len(texts)):
                seg = hashes[offsets[i]:offsets[i + 1]]
                if not len(seg):
                    continue
                u, first = np.unique(seg, return_index=True)
                keep.append(i)
                total.append(len(u))
                matched.append(int(hit[offsets[i] + first].sum()))
            keep_idx = pa.array(np.asarray(keep, dtype=np.int64))
            m = np.asarray(matched, dtype=np.int64)
            t_ = np.asarray(total, dtype=np.int64)
            return pa.table({
                id_column: b[id_column].take(keep_idx),
                "matched": pa.array(m),
                "total": pa.array(t_),
                "frac": pa.array(m / np.maximum(t_, 1)),
            })

    return ds.map_batches(
        StatelessBatchFn(ContaminationBatch, {}),
        batch_format="pyarrow",
        concurrency=pool_size(concurrency) if concurrency else None)


def simhash_groups(ds, text_column: str = "text", id_column: str = "doc_id",
                   analyzer: str = "ascii", concurrency: int | None = None,
                   hash: str = "stable"):
    """Exact-bucket SimHash dedup: -> (simhash, dup_count, keep_id)."""
    from iresearch_ray.pipelines.textstats import _coded_tokens

    hasher = _term_hasher(hash)

    class SimBatch:
        def __init__(self):
            self.analyzer = get_analyzer(analyzer)

        def __call__(self, b: pa.Table) -> pa.Table:
            codes, dict_np, _, doc_len = _coded_tokens(
                self.analyzer, b[text_column])
            offs = np.zeros(len(doc_len) + 1, dtype=np.int64)
            np.cumsum(doc_len, out=offs[1:])
            th = (hasher(dict_np)[codes] if len(dict_np)
                  else np.empty(0, np.uint64))
            sh = simhash(th, offs)
            return pa.table({"simhash": pa.array(sh.view(np.int64)),
                             id_column: b[id_column]})

    hashed = ds.map_batches(
        StatelessBatchFn(SimBatch), batch_format="pyarrow",
        concurrency=pool_size(concurrency) if concurrency else None)
    return _grouped_count_min(hashed, "simhash", id_column)


def dedup_drop_set(pairs_df: pd.DataFrame) -> set:
    """Ids to DROP from the near-duplicate pair set: union-find over the
    (output-sized) pairs, keep each component's min id.  Ids appearing in
    no pair are implicitly kept — unlike ``dedup_keep_first`` this never
    needs the corpus id list on the driver, so it is the 100 TB shape."""
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(pairs_df["id_a"], pairs_df["id_b"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {x for x in parent if find(x) != x}


def dedup_keep_first(pairs_df: pd.DataFrame, all_ids: np.ndarray) -> np.ndarray:
    """Driver-side union-find over the (small) candidate-pair set -> ids to
    KEEP (min id per duplicate component).  Candidate pairs are the output
    of `minhash_lsh_pairs` — bounded by true near-dup volume, not corpus
    size, so driver-side is safe (documented assumption)."""
    drop = dedup_drop_set(pairs_df)
    return np.array([i for i in all_ids if i not in drop], dtype=all_ids.dtype)


def _int_ids(col) -> np.ndarray:
    """Embedding-pair ids must be integers (the pair tables and the
    id_a < id_b ordering are int64 by contract): validate loudly instead
    of letting astype crash confusingly on 'doc_0001' or silently turn
    digit STRINGS into ints that no longer join back to the corpus."""
    ids = col.to_numpy(zero_copy_only=False)
    if len(ids) and ids.dtype.kind not in "iu":
        raise ValueError(
            f"embedding near-dup requires an integer id column, got "
            f"{col.type}; map string ids to int64 (e.g. a dense index "
            "or stable_hash_strings) before pairing")
    return ids.astype(np.int64, copy=False)


def _exact_pairs_blocked(ds, threshold: float, id_column: str,
                         vec_column: str, dtype,
                         concurrency: int | None = None):
    """Exact all-pairs cosine >= threshold over ``ds`` via (batch, block)
    matmul tiles: the corpus is held as PER-BLOCK normalized matrices in
    the object store (one ref per input block — never concatenated on the
    driver, spillable individually) and every batch matmuls against each
    block ref in turn.  Plasma caches each block once per NODE, so a ref
    ships per node, not per batch."""
    import ray
    import ray.data

    from iresearch_ray.pipelines.ann import _as_matrix

    @ray.remote
    def _norm_block(t: pa.Table):
        ids = _int_ids(t[id_column])
        M = _as_matrix(t[vec_column], dtype)
        Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-30)
        return ids, Mn

    refs = ds.select_columns([id_column, vec_column]).to_arrow_refs()
    if not refs:
        return ray.data.from_arrow(_empty_pairs_table())
    block_refs = [_norm_block.remote(r) for r in refs]

    def batch_pairs(t: pa.Table) -> pa.Table:
        ids = _int_ids(t[id_column])
        out_a = [np.empty(0, np.int64)]
        out_b = [np.empty(0, np.int64)]
        out_c = [np.empty(0, np.float64)]
        if len(ids):
            m = _as_matrix(t[vec_column], dtype)
            mn = m / np.maximum(
                np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
            for br in block_refs:
                ids_all_, Mn_ = ray.get(br)  # node-cached
                if not len(ids_all_):
                    continue
                sims = mn @ Mn_.T  # (batch, block)
                r, c = np.nonzero(sims >= threshold)
                keep = ids[r] < ids_all_[c]  # id_a < id_b, each once
                out_a.append(ids[r][keep].astype(np.int64))
                out_b.append(ids_all_[c][keep].astype(np.int64))
                out_c.append(sims[r, c][keep].astype(np.float64))
        return pa.table({
            "id_a": pa.array(np.concatenate(out_a)),
            "id_b": pa.array(np.concatenate(out_b)),
            "cosine": pa.array(np.concatenate(out_c)),
        })

    # reuse the already-materialized block refs as the streaming side too
    # — no second read of the source
    return ray.data.from_arrow_refs(refs).map_batches(
        batch_pairs, batch_format="pyarrow",
        concurrency=pool_size(concurrency))


def _empty_pairs_table() -> pa.Table:
    return pa.table({"id_a": pa.array([], pa.int64()),
                     "id_b": pa.array([], pa.int64()),
                     "cosine": pa.array([], pa.float64())})


def embedding_neardup_pairs(ds, threshold: float = 0.9,
                            id_column: str = "vec_id",
                            vec_column: str = "embedding",
                            planes: int = 0, seed: int = 42,
                            concurrency: int | None = None,
                            dtype=np.float32,
                            checkpoint_dir: str | None = None,
                            max_bucket: int = 16384):
    """Embedding-cosine near-duplicate pairs -> Dataset(id_a, id_b, cosine)
    with id_a < id_b and cosine >= threshold.

    ``planes=0`` (exact): the corpus is held as PER-BLOCK normalized
    matrices in the object store (one ref per input block — never
    concatenated on the driver, spillable individually) and every batch
    matmuls against each block ref in turn — exact all-pairs semantics
    with O(n^2) compute spread across (batch, block) tiles.  Plasma
    caches each block once per node, so a ref is shipped per NODE, not
    per batch.

    ``planes>0`` (scale path): sign-LSH bucketing first — only same-bucket
    pairs are scored (the MinHash-LSH shape over vectors).  The bucketed
    sketch is CHECKPOINTED to Parquet (``checkpoint_dir``; scratch dir by
    default) exactly like the MinHash path, so neither the count pass nor
    the membership filter pins corpus-sized objects in the object store.
    Pairing is DISTRIBUTED: hot-bucket survivors range-sort on bucket and
    each block pairs its contiguous bucket runs (the sort+combine idiom;
    buckets whose run STRADDLES block boundaries are detected via the
    boundary-partial scan and routed through the per-bucket fan-out, so
    no pair is missed at any key skew); each bucket wider than
    ``max_bucket`` (degenerate: near-zero vectors, templated embeddings)
    instead gets its OWN (batch, block)-tiled sub-pipeline — total
    degenerate work is sum(w_i^2), never (sum w_i)^2, with no driver-side
    concat at any bucket skew.  Run pairing is row-tiled, so task MEMORY
    is bounded at any width; ``max_bucket`` bounds per-task COMPUTE (a
    16384-wide run is ~17 Gflop — a few seconds; wider fans out).  It
    must sit above the typical corpus/2^planes bucket width (guarded:
    >64 oversized buckets raise).
    Approximate: recall follows bucket collision probability; use as the
    100 TB route where O(n^2) tiles are unaffordable."""
    import ray

    from iresearch_ray.pipelines.ann import (
        _as_matrix,
        _projection_planes,
        lsh_bucket_ids,
    )

    if planes <= 0:
        return _exact_pairs_blocked(ds, threshold, id_column, vec_column,
                                    dtype, concurrency)

    # LSH-bucketed candidates: bucket assign in map_batches, Parquet sketch
    # checkpoint (shared machinery with MinHash-LSH), hot-bucket broadcast
    # filter, then distributed within-bucket pairing
    import shutil
    import tempfile

    import ray.data

    P = None

    def assign(t: pa.Table) -> pa.Table:
        nonlocal P
        m = _as_matrix(t[vec_column])
        if P is None:
            P = _projection_planes(m.shape[1], planes, seed)
        b = lsh_bucket_ids(m, P)
        return pa.table({id_column: t[id_column],
                         vec_column: t[vec_column],
                         "bucket": pa.array(b, type=pa.int64())})

    own_ckpt = checkpoint_dir is None
    ckpt = checkpoint_dir or tempfile.mkdtemp(prefix="iresearch_embdup_")
    try:
        params = {"planes": planes, "seed": seed, "id_column": id_column,
                  "vec_column": vec_column,
                  "input": _input_fingerprint(ds) if not own_ckpt else ""}
        sk = _sketch_checkpoint(
            ds.map_batches(assign, batch_format="pyarrow"), ckpt, params)
        hot = _grouped_count_min(
            sk.select_columns(["bucket"]), "bucket", None,
            count_alias="n", min_count=2).to_pandas()
        if not len(hot):
            return ray.data.from_arrow(_empty_pairs_table())
        # bucket-count split: normal buckets pair within sorted runs
        # (w <= max_bucket keeps per-task sims at w^2 floats); degenerate
        # buckets go through the tiled exact path (same-bucket masked)
        hkeys = hot["bucket"].to_numpy()
        hcnts = hot["n"].to_numpy()
        order = np.argsort(hkeys)
        hkeys, hcnts = hkeys[order], hcnts[order]
        normal_keys = np.ascontiguousarray(hkeys[hcnts <= max_bucket])
        degen_keys = np.ascontiguousarray(hkeys[hcnts > max_bucket])
        parts = []
        straddled = np.empty(0, np.int64)
        if len(normal_keys):
            nref = ray.put(normal_keys)

            def keep_normal(t: pa.Table) -> pa.Table:
                keys = ray.get(nref)
                return t.filter(pa.array(
                    _sorted_member(keys, t["bucket"].to_numpy())))

            normal_rows = (sk.map_batches(keep_normal,
                                          batch_format="pyarrow")
                           .sort("bucket").materialize())

            # boundary partials: a bucket whose sorted run STRADDLES
            # blocks (possible under skew — see the repair module
            # comment) appears as the first/last run of >= 2 blocks;
            # within-block pairing would silently MISS its cross-piece
            # pairs, so straddled buckets are detected here and routed
            # through the same per-bucket fan-out as oversized ones.
            # |straddled| <= block count - 1 (each consumes a boundary),
            # and is 0 unless a sampled sort boundary lands mid-bucket.
            def bucket_edges(t: pa.Table) -> pa.Table:
                if len(t) == 0:
                    return pa.table({"bucket": pa.array([], pa.int64())})
                b = t["bucket"].to_numpy()
                vals = [int(b[0])]
                if b[-1] != b[0]:
                    vals.append(int(b[-1]))
                return pa.table({"bucket": pa.array(vals, pa.int64())})

            edge_tbl = _collect_small(normal_rows.map_batches(
                bucket_edges, batch_format="pyarrow", batch_size=None))
            if edge_tbl is not None:
                bvals, bcnts = np.unique(
                    edge_tbl["bucket"].to_numpy(), return_counts=True)
                straddled = np.ascontiguousarray(bvals[bcnts >= 2])
            sref = ray.put(straddled)

            def bucket_pairs(t: pa.Table) -> pa.Table:
                n = len(t)
                if n == 0:
                    return _empty_pairs_table()
                buckets = t["bucket"].to_numpy()
                skip = ray.get(sref)
                ids_all = _int_ids(t[id_column])
                Mn = _as_matrix(t[vec_column], dtype)
                Mn = Mn / np.maximum(
                    np.linalg.norm(Mn, axis=1, keepdims=True), 1e-30)
                starts = np.flatnonzero(
                    np.r_[True, buckets[1:] != buckets[:-1]])
                bounds = np.r_[starts, n]
                skip_run = (_sorted_member(skip, buckets[starts])
                            if len(skip) else np.zeros(len(starts), bool))
                out_a, out_b, out_c = [np.empty(0, np.int64)], \
                    [np.empty(0, np.int64)], [np.empty(0, np.float64)]
                for ri, (s, e) in enumerate(zip(bounds[:-1], bounds[1:])):
                    w = e - s
                    if w < 2 or skip_run[ri]:
                        continue
                    ids = ids_all[s:e]
                    mn = Mn[s:e]
                    # row-tiled within the run: sims memory stays ~4M
                    # floats at ANY bucket width (compute is w^2 either
                    # way; max_bucket bounds when that must distribute)
                    step = max(1, (1 << 22) // w)
                    for rs in range(0, w, step):
                        sims = mn[rs:rs + step] @ mn.T
                        r, c = np.nonzero(sims >= threshold)
                        r_g = r + rs
                        tri = c > r_g  # upper triangle: each pair once
                        r_g, c = r_g[tri], c[tri]
                        lo = np.minimum(ids[r_g], ids[c])
                        hi = np.maximum(ids[r_g], ids[c])
                        out_a.append(lo)
                        out_b.append(hi)
                        out_c.append(sims[r[tri], c].astype(np.float64))
                return pa.table({
                    "id_a": pa.array(np.concatenate(out_a)),
                    "id_b": pa.array(np.concatenate(out_b)),
                    "cosine": pa.array(np.concatenate(out_c))})

            parts.append(normal_rows.map_batches(
                bucket_pairs, batch_format="pyarrow", batch_size=None))
            if len(straddled):
                # straddled buckets are normal-width (<= max_bucket), so
                # each gets one small exact sub-pipeline — but over a
                # ONE-pass materialized extract of just the straddled
                # rows (mirroring degen_rows below): S straddled buckets
                # must not mean S full passes over normal_rows plus
                # O(blocks) re-normalize tasks each
                def keep_straddled(t: pa.Table) -> pa.Table:
                    skip = ray.get(sref)
                    return t.filter(pa.array(
                        _sorted_member(skip, t["bucket"].to_numpy())))

                straddled_rows = normal_rows.map_batches(
                    keep_straddled, batch_format="pyarrow").materialize()
                for bv in straddled.tolist():
                    def keep_one_straddled(t: pa.Table,
                                           _bv=int(bv)) -> pa.Table:
                        import pyarrow.compute as pc

                        return t.filter(pc.equal(t["bucket"], _bv))

                    parts.append(_exact_pairs_blocked(
                        straddled_rows.map_batches(keep_one_straddled,
                                                   batch_format="pyarrow"),
                        threshold, id_column, vec_column, dtype,
                        concurrency))
        if len(degen_keys) > 64:
            raise ValueError(
                f"{len(degen_keys)} LSH buckets exceed max_bucket="
                f"{max_bucket} — that is the TYPICAL bucket width, not a "
                "degenerate tail; raise max_bucket above the expected "
                "corpus/2^planes bucket size (each oversized bucket pays "
                "its own tiled O(w^2) sub-pipeline)")
        if len(degen_keys):
            # ONE filter pass pulls the degenerate rows into (spillable)
            # object-store blocks; the per-bucket sub-pipelines then read
            # memory, not parquet — 29 oversized buckets must not mean 29
            # full checkpoint scans (measured 202 s -> the scan was the
            # cost, not the pairing)
            dref = ray.put(degen_keys)

            def keep_degen(t: pa.Table) -> pa.Table:
                keys = ray.get(dref)
                return t.filter(pa.array(
                    _sorted_member(keys, t["bucket"].to_numpy())))

            degen_rows = sk.map_batches(
                keep_degen, batch_format="pyarrow").materialize()
        for bv in degen_keys.tolist():
            # ONE tiled sub-pipeline per oversized bucket: total work is
            # sum(w_i^2) over the (few, by nature) degenerate buckets,
            # never (sum w_i)^2 across them
            def keep_one(t: pa.Table, _bv=int(bv)) -> pa.Table:
                import pyarrow.compute as pc

                return t.filter(pc.equal(t["bucket"], _bv))

            parts.append(_exact_pairs_blocked(
                degen_rows.map_batches(keep_one, batch_format="pyarrow"),
                threshold, id_column, vec_column, dtype, concurrency))
        res = parts[0].union(*parts[1:]) if len(parts) > 1 else parts[0]
        # each vector lives in exactly ONE sign-LSH bucket, so pairs are
        # already unique; materialize (output-sized) before the scratch
        # checkpoint is removed
        return res.materialize()
    finally:
        if own_ckpt:
            shutil.rmtree(ckpt, ignore_errors=True)


class _SpanHashBatch:
    """Per-doc DISTINCT k-token rolling span hashes -> (id, span_hash) rows.

    The same Rabin-Karp window family as ``rolling_doc_fingerprints`` but
    UNSAMPLED (sample_mod=1): every window of every doc is kept, so span
    equality is exact k-gram equality (up to the 64-bit hash).  Only
    (hash, id) rows ever leave the node — never document text."""

    def __init__(self, text_column, id_column, analyzer, k, hash,
                 analyzer_opts=None):
        from iresearch_ray.analysis import get_analyzer as _ga

        self.text_column = text_column
        self.id_column = id_column
        self.analyzer = _ga(analyzer, **(analyzer_opts or {}))
        self.k = k
        self.hasher = _term_hasher(hash)

    def __call__(self, b: pa.Table) -> pa.Table:
        from iresearch_ray.analysis.minhash import rolling_fingerprints
        from iresearch_ray.pipelines.textstats import _coded_tokens

        codes, dict_np, _, doc_len = _coded_tokens(
            self.analyzer, b[self.text_column])
        offs = np.zeros(len(doc_len) + 1, dtype=np.int64)
        np.cumsum(doc_len, out=offs[1:])
        th = (self.hasher(dict_np)[codes] if len(dict_np)
              else np.empty(0, np.uint64))
        d, h = rolling_fingerprints(th, offs, k=self.k, sample_mod=1)
        ids = b[self.id_column].to_numpy(zero_copy_only=False)
        # explicit id type: an all-tokenless batch yields an empty object
        # slice that pa.array would otherwise infer as null-typed
        return pa.table({
            self.id_column: pa.array(ids[d], type=b[self.id_column].type),
            "span_hash": pa.array(h.view(np.int64))})


def duplicated_spans(ds, text_column: str = "text", id_column: str = "doc_id",
                     analyzer: str = "ascii", k: int = 5,
                     min_docs: int = 2, hash: str = "stable",
                     concurrency: int | None = None,
                     analyzer_opts: dict | None = None):
    """Exact substring-duplication detection: spans (k-token windows)
    whose hash occurs in >= ``min_docs`` DISTINCT documents ->
    Dataset(span_hash, n_docs, keep_id=min doc id).

    This is the cross-document role of suffix-array training-data dedup
    (find verbatim passages repeated across a corpus), re-expressed as
    rolling-hash spans: a shared span of length >= k tokens guarantees at
    least one shared window hash, and with ``hash='md5'`` the whole
    computation is reproducible in ANSI SQL for an exact oracle.

    Scale shape: per-doc distinct hashes in map_batches, then ONE range
    sort on the 64-bit span hash (the exact_dedup shuffle profile: light
    keys, no text) followed by a per-block reduceat combine that emits
    ONLY the duplicated rows — no per-row Python anywhere.  Measured 4x
    faster than ``groupby().aggregate()`` at 4.5M span rows (the sort is
    the whole cost; the combine is one vector sweep), because the
    aggregate path materializes every one-doc group before filtering.

    The combine is exact at ANY key skew: equal-hash runs CAN straddle
    block boundaries (observed at a 2.4M-row hot key — sampled sort
    boundaries split runs), and :func:`_grouped_count_min`'s
    boundary-run repair merges the edge pieces through
    <=2-rows-per-block driver partials; interior runs combine locally.
    """
    spans = ds.map_batches(
        StatelessBatchFn(_SpanHashBatch, dict(
            text_column=text_column, id_column=id_column, analyzer=analyzer,
            k=k, hash=hash, analyzer_opts=analyzer_opts)),
        batch_format="pyarrow",
        concurrency=pool_size(concurrency) if concurrency else None)

    return _grouped_count_min(spans, "span_hash", id_column,
                              count_alias="n_docs", min_count=min_docs)


def duplicated_span_stats(ds, text_column: str = "text",
                          id_column: str = "doc_id", analyzer: str = "ascii",
                          k: int = 5, min_docs: int = 2, hash: str = "stable",
                          concurrency: int | None = None,
                          max_broadcast: int = 50_000_000,
                          analyzer_opts: dict | None = None):
    """Per-document duplicated-span statistics ->
    Dataset(doc_id, n_spans, n_dup_spans, dup_frac): of each doc's
    DISTINCT k-token span hashes, how many are duplicated across the
    corpus (appear in >= ``min_docs`` docs).  ``dup_frac`` is the
    document's verbatim-duplication score — the per-doc signal a
    training-data pipeline filters or down-weights on.

    Scale shape: the duplicated-hash set from :func:`duplicated_spans` is
    OUTPUT-sized (only spans that actually repeat across documents), so
    it is pulled sorted to the driver and broadcast once via ``ray.put``
    (the contamination_check idiom); the per-doc pass is a shuffle-free
    map_batches with one vectorized searchsorted membership per batch.
    ``max_broadcast`` guards the assumption: corpora whose duplicated-span
    set outgrows it should raise ``min_docs``/``k`` or pre-dedup first.

    CONTRACT: ``id_column`` must be unique corpus-wide (the same contract
    sessionize documents for user keys).  A repeated doc id — within or
    across input blocks — emits one partial stats row per occurrence run
    rather than one combined row per doc; exact-dedup the corpus first if
    ids can repeat.
    """
    import ray

    dup = duplicated_spans(ds, text_column=text_column, id_column=id_column,
                           analyzer=analyzer, k=k, min_docs=min_docs,
                           hash=hash, concurrency=concurrency,
                           analyzer_opts=analyzer_opts)
    chunks = [b["span_hash"].to_numpy()
              for b in dup.select_columns(["span_hash"])
              .iter_batches(batch_format="pyarrow")]
    dup_hashes = (np.sort(np.concatenate(chunks)) if chunks
                  else np.empty(0, dtype=np.int64))
    if len(dup_hashes) > max_broadcast:
        raise ValueError(
            f"duplicated-span set ({len(dup_hashes)} hashes) exceeds "
            f"max_broadcast={max_broadcast}; raise min_docs/k or exact-dedup "
            "the corpus first")
    dup_ref = ray.put(dup_hashes)

    class StatsBatch(_SpanHashBatch):
        def __call__(self, b: pa.Table) -> pa.Table:
            spans = super().__call__(b)
            ids = spans[self.id_column].to_numpy(zero_copy_only=False)
            hashes = spans["span_hash"].to_numpy(zero_copy_only=False)
            hit = _sorted_member(ray.get(dup_ref), hashes)
            # spans carry one run of rows per doc (rolling_fingerprints
            # emits docs in order): reduce per contiguous id run
            id_type = b[self.id_column].type
            if not len(ids):
                return pa.table({self.id_column: pa.array([], id_type),
                                 "n_spans": pa.array([], pa.int64()),
                                 "n_dup_spans": pa.array([], pa.int64()),
                                 "dup_frac": pa.array([], pa.float64())})
            starts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
            n_spans = np.diff(np.r_[starts, len(ids)]).astype(np.int64)
            n_dup = np.add.reduceat(hit.astype(np.int64), starts)
            return pa.table({
                self.id_column: pa.array(ids[starts], type=id_type),
                "n_spans": pa.array(n_spans),
                "n_dup_spans": pa.array(n_dup),
                "dup_frac": pa.array(n_dup / n_spans.astype(np.float64)),
            })

    return ds.map_batches(
        StatelessBatchFn(StatsBatch, dict(
            text_column=text_column, id_column=id_column, analyzer=analyzer,
            k=k, hash=hash, analyzer_opts=analyzer_opts)),
        batch_format="pyarrow",
        concurrency=pool_size(concurrency) if concurrency else None)


def dedup_clusters(pairs, id_a: str = "id_a", id_b: str = "id_b",
                   max_rounds: int = 50, log_rounds: bool = False,
                   driver_max: int = 10_000_000):
    """Transitive near-duplicate clusters: connected components over a
    pair edge list (e.g. :func:`minhash_lsh_pairs` /
    :func:`ngram_jaccard_pairs` output) -> Dataset(doc_id, cluster_id),
    one row per distinct doc appearing in a pair, ``cluster_id`` = the
    component's minimum id.  The missing step between pairwise near-dup
    detection and "keep one doc per duplicate group" at corpus scale.
    (The reference engine has no clustering step — its minhash utils are
    pairwise-only, cf. `core/analysis/minhash_utils.cpp`.)

    Distributed two-phase star contraction (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC 2014 — published
    algorithm): alternate

    - large-star: per node u with neighborhood G(u), m = min(G(u) ∪ {u}):
      emit edge (v, m) for every v in G(u) with v > u;
    - small-star: same m; emit (v, m) for every v in G(u) ∪ {u} with
      v <= u and v != m.

    Components converge to star graphs centered at their minima; unlike
    hash-to-min, the per-round edge count NEVER exceeds the input edge
    count (probed: hash-to-min ballooned a 0.5M-edge corpus with a 10k
    chain to 63.7M intermediate rows; two-phase stays flat).  Each star
    op is one range sort of the symmetrized (node, nbr) rows + a per-run
    ``np.minimum.reduceat`` combine, BOUNDARY-REPAIRED (see the module
    comment above :func:`_run_starts_arrow`): a converged duplicate
    cluster IS a hot node whose adjacency run outgrows a sort block — a
    2.4M-row hub at a 5M-edge probe straddled blocks — so the first/last
    run of every block takes its neighborhood min from <=2-rows-per-block
    driver-merged partials instead of trusting block locality.

    Everything is DUPLICATE-INSENSITIVE min/max algebra, so emissions
    never need an exact global dedup (block-local drop_duplicates only
    trims shuffle bytes).  Convergence is a star-forest CERTIFICATE, not
    an edge-multiset signature: with edges canonicalized child > parent,
    the state is converged iff NO node sees neighbors on both sides of
    itself AND no pure child sees two distinct parents (per-run min/max
    tests + the same boundary repair).  At the certificate every
    component is a star centered at its minimum, so labels are immediate:
    label(u) = min(neighbors ∪ u).  (The retired signature needed an
    exact global dedup, which nondeterministic run splits made unstable —
    the 5M probe churned 14 extra no-op rounds before failing.)

    Scale shape: only id rows ever move; each iteration materializes an
    edge-set-sized row set (the near-dup graph — output scale, not
    corpus scale) so rounds re-read object-store blocks instead of
    replaying lineage.  Driver-side state per round: <=2 rows per sort
    block (the boundary partials).  Self-pairs (id_a == id_b) are
    dropped; ``max_rounds`` bounds the provably O(log^2 n) iterations.

    ``driver_max``: edge lists at or below this bound skip the round
    loop for driver-side vectorized min-label propagation (the
    `distributed_verify_min` pattern: pair lists are usually
    output-sized, and the numpy kernel labels 5M edges in 2.4 s vs
    111 s for the distributed contraction — 10M edges is ~5 s and
    <1 GB driver heap); above it, the distributed path runs.  Both
    paths are BIT-IDENTICAL (md5 over all labels at the 5M probe).
    """
    import time as _time

    import ray
    import ray.data

    # --- initial canonical edges: (child=max, parent=min), a != b ---
    def canon(b: pa.Table) -> pa.Table:
        it = b.schema.field(id_a).type
        a = b[id_a].to_numpy(zero_copy_only=False)
        c = b[id_b].cast(it).to_numpy(zero_copy_only=False)
        keep = a != c
        a, c = a[keep], c[keep]
        child = np.maximum(a, c)
        parent = np.minimum(a, c)
        return pa.table({"child": pa.array(child, type=it),
                         "parent": pa.array(parent, type=it)})

    def sym_edges(b: pa.Table) -> pa.Table:
        it = b.schema.field("child").type
        child = b["child"].combine_chunks()
        parent = b["parent"].cast(it).combine_chunks()
        return pa.table({"node": pa.concat_arrays([child, parent]),
                         "nbr": pa.concat_arrays([parent, child])})

    def _runs(node: np.ndarray):
        starts = np.flatnonzero(np.r_[True, node[1:] != node[:-1]])
        lens = np.diff(np.r_[starts, len(node)])
        return starts, lens

    def piece_stats(t: pa.Table) -> pa.Table:
        """Boundary partials: <=2 rows per block — (node, pmin, pmax)
        over nbr for the block's first and last node-run, the only runs
        that can straddle blocks under skew."""
        n = len(t)
        it = t.schema.field("node").type
        if n == 0:
            return pa.table({"node": pa.array([], it),
                             "pmin": pa.array([], it),
                             "pmax": pa.array([], it)})
        col = t["node"].combine_chunks()
        starts = _run_starts_arrow(col, n)
        bounds = [(0, int(starts[1]) if len(starts) > 1 else n)]
        if len(starts) > 1:
            bounds.append((int(starts[-1]), n))
        nbr = t["nbr"].to_numpy(zero_copy_only=False)
        take, mn, mx = [], [], []
        for s, e in bounds:
            take.append(s)
            mn.append(nbr[s:e].min())
            mx.append(nbr[s:e].max())
        return pa.table({"node": col.take(pa.array(take)),
                         "pmin": pa.array(mn, type=it),
                         "pmax": pa.array(mx, type=it)})

    def _sorted_sym(edge_ds):
        # materialized so every pass sees the SAME block boundaries (a
        # re-executed sort may sample different ones)
        return (edge_ds.map_batches(sym_edges, batch_format="pyarrow")
                .sort("node").materialize())

    def _repair(sorted_sym):
        """Driver-merged boundary partials: (nodes_sorted, global nbr
        min/max per boundary node, arrow id type)."""
        parts = _collect_small(sorted_sym.map_batches(
            piece_stats, batch_format="pyarrow", batch_size=None))
        if parts is None:
            return None
        # NUL-safe merge (pandas groupby collapses NUL-bearing string
        # ids): numpy argsort + reduceat over the tiny partial table
        keys = parts["node"].to_numpy(zero_copy_only=False)
        order = np.argsort(keys, kind="stable")
        k_s = keys[order]
        g = np.r_[0, np.flatnonzero(k_s[1:] != k_s[:-1]) + 1]
        gmin = np.minimum.reduceat(
            parts["pmin"].to_numpy(zero_copy_only=False)[order], g)
        gmax = np.maximum.reduceat(
            parts["pmax"].to_numpy(zero_copy_only=False)[order], g)
        return (k_s[g], gmin, gmax, parts.schema.field("node").type)

    def count_viol_interior(t: pa.Table) -> pa.Table:
        """Star-forest violations over INTERIOR runs: node u violates iff
        it sees neighbors on both sides of itself (child AND parent on a
        >= length-2 path) or, as a pure child, two distinct parents."""
        n = len(t)
        if n == 0:
            return pa.table({"viol": pa.array([0], pa.int64())})
        node = t["node"].to_numpy(zero_copy_only=False)
        nbr = t["nbr"].to_numpy(zero_copy_only=False)
        starts, _ = _runs(node)
        if len(starts) <= 2:
            return pa.table({"viol": pa.array([0], pa.int64())})
        lo, hi = starts[1], starts[-1]
        si = starts[1:-1] - lo
        mn = np.minimum.reduceat(nbr[lo:hi], si)
        mx = np.maximum.reduceat(nbr[lo:hi], si)
        u = node[starts[1:-1]]
        viol = ((mx > u) & (mn < u)) | ((mx < u) & (mn != mx))
        return pa.table(
            {"viol": pa.array([int(np.count_nonzero(viol))], pa.int64())})

    def _viol_total(sorted_sym, rep) -> int:
        total = int(sorted_sym.map_batches(
            count_viol_interior, batch_format="pyarrow",
            batch_size=None).sum("viol") or 0)
        if rep is not None:
            nodes, gmin, gmax, _ = rep
            v = (((gmax > nodes) & (gmin < nodes))
                 | ((gmax < nodes) & (gmin != gmax)))
            total += int(np.count_nonzero(v))
        return total

    def make_star(large: bool, rep_ref):
        def star(t: pa.Table) -> pa.Table:
            it = t.schema.field("node").type
            if len(t) == 0:
                return pa.table({"child": pa.array([], it),
                                 "parent": pa.array([], it)})
            node = t["node"].to_numpy(zero_copy_only=False)
            nbr = t["nbr"].to_numpy(zero_copy_only=False)
            starts, lens = _runs(node)
            m_run = np.minimum(np.minimum.reduceat(nbr, starts),
                               node[starts])
            # boundary repair: the first/last run may be a PIECE of a
            # straddled run — its m comes from the driver merge
            rep_nodes, rep_min, _, _ = ray.get(rep_ref)
            for ri in {0, len(starts) - 1}:
                u = node[starts[ri]]
                j = int(np.searchsorted(rep_nodes, u))
                m_run[ri] = min(rep_min[j], u)
            m_row = np.repeat(m_run, lens)
            if large:
                sel = nbr > node
                child, parent = nbr[sel], m_row[sel]
            else:
                sel = (nbr <= node) & (nbr != m_row)
                child, parent = nbr[sel], m_row[sel]
                if len(starts) > 2:
                    # the (u, m) self-edge for INTERIOR runs only; the
                    # driver emits boundary nodes' exactly once
                    iu = node[starts[1:-1]]
                    im = m_run[1:-1]
                    ex = iu != im
                    child = np.concatenate([child, iu[ex]])
                    parent = np.concatenate([parent, im[ex]])
            out = pd.DataFrame({"child": child, "parent": parent})
            out = out.drop_duplicates()  # trims shuffle bytes only —
            # the min/max algebra downstream is duplicate-insensitive
            res = pa.Table.from_pandas(out, preserve_index=False)
            return res.set_column(0, "child", res["child"].cast(it)) \
                      .set_column(1, "parent", res["parent"].cast(it))
        return star

    def _boundary_extras(rep):
        """Small-star (u, m) self-edges for boundary nodes, emitted once
        by the driver (a straddled run would emit one per piece)."""
        nodes, gmin, _, it = rep
        m = np.minimum(gmin, nodes)
        ex = nodes != m
        if not np.count_nonzero(ex):
            return None
        return pa.table({"child": pa.array(nodes[ex], type=it),
                         "parent": pa.array(m[ex], type=it)})

    def _empty_labels():
        # recover the id type from the INPUT dataset (numpy dtype when
        # the pairs came from pandas blocks, object -> string)
        psch = pairs.schema()
        t = dict(zip(psch.names, psch.types))[id_a]
        if not isinstance(t, pa.DataType):
            try:
                t = pa.from_numpy_dtype(np.dtype(t))
            except (TypeError, pa.ArrowNotImplementedError):
                t = pa.string()
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array([], type=t),
            "cluster_id": pa.array([], type=t)}))

    edges = pairs.map_batches(canon, batch_format="pyarrow").materialize()
    n0 = edges.count()
    if n0 == 0:
        return _empty_labels()
    if n0 <= driver_max:
        df = edges.to_pandas()
        child = df["child"].to_numpy()
        parent_in = df["parent"].to_numpy()
        codes, uniq = nul_safe_factorize(np.concatenate([child, parent_in]))
        uniq = np.asarray(uniq)
        uniq_sorted = np.sort(uniq)
        # remap codes so code order == id order (min code = min id)
        codes = np.searchsorted(uniq_sorted, uniq)[codes]
        a, b = codes[:len(child)], codes[len(child):]
        # vectorized min-label propagation with full pointer-jumping
        # compression each round: O(log n) rounds of O(E) ufunc work —
        # A/B'd at 5M edges (incl. a 100k chain): 2.4 s / 7 rounds vs
        # 8.9 s for the per-edge Python union-find it replaces,
        # label-identical.  lab is monotone nonincreasing and strictly
        # decreases somewhere every round until the fixpoint, so the
        # loop provably terminates.
        lab = np.arange(len(uniq_sorted), dtype=np.int64)
        rounds = 0
        while True:
            rounds += 1
            m = np.minimum(lab[a], lab[b])
            before = lab.copy()
            np.minimum.at(lab, a, m)
            np.minimum.at(lab, b, m)
            while True:  # pointer jumping: compress label paths
                nl = lab[lab]
                if np.array_equal(nl, lab):
                    break
                lab = nl
            if np.array_equal(before, lab):
                break
        lbl = pa.table({
            "doc_id": pa.array(uniq_sorted),
            "cluster_id": pa.array(uniq_sorted[lab])})
        if log_rounds:
            print(f"dedup_clusters: driver min-propagation over {n0} "
                  f"edges / {len(uniq_sorted)} nodes, {rounds} rounds "
                  f"(<= driver_max={driver_max})")
        return ray.data.from_arrow(lbl)

    def labels_interior(t: pa.Table) -> pa.Table:
        it = t.schema.field("node").type
        empty = pa.table({"doc_id": pa.array([], it),
                          "cluster_id": pa.array([], it)})
        n = len(t)
        if n == 0:
            return empty
        node = t["node"].to_numpy(zero_copy_only=False)
        nbr = t["nbr"].to_numpy(zero_copy_only=False)
        starts, _ = _runs(node)
        if len(starts) <= 2:
            return empty  # all-boundary block: the driver labels these
        lo, hi = starts[1], starts[-1]
        si = starts[1:-1] - lo
        mn = np.minimum.reduceat(nbr[lo:hi], si)
        u = node[starts[1:-1]]
        return pa.table({"doc_id": pa.array(u, type=it),
                         "cluster_id": pa.array(np.minimum(mn, u),
                                                type=it)})

    def _labels(sorted_sym, rep):
        lab = sorted_sym.map_batches(labels_interior,
                                     batch_format="pyarrow",
                                     batch_size=None)
        if rep is not None:
            nodes, gmin, _, it = rep
            btbl = pa.table({
                "doc_id": pa.array(nodes, type=it),
                "cluster_id": pa.array(np.minimum(gmin, nodes), type=it)})
            lab = lab.union(ray.data.from_arrow(btbl))
        return lab

    state = edges
    for rnd in range(max_rounds):
        t0 = _time.time()
        ss = _sorted_sym(state)
        rep = _repair(ss)
        nviol = _viol_total(ss, rep)
        if log_rounds:
            print(f"dedup_clusters round {rnd}: violations={nviol} "
                  f"({_time.time() - t0:.2f}s)")
        if nviol == 0:
            # star forest centered at component minima: label(u) is
            # min(neighbors, u), exactly once per node (interior runs
            # locally, boundary nodes from the driver merge)
            return _labels(ss, rep)
        ls = ss.map_batches(make_star(True, ray.put(rep)),
                            batch_format="pyarrow", batch_size=None)
        ss2 = _sorted_sym(ls)
        rep2 = _repair(ss2)
        state = ss2.map_batches(make_star(False, ray.put(rep2)),
                                batch_format="pyarrow", batch_size=None)
        extras = _boundary_extras(rep2) if rep2 is not None else None
        if extras is not None:
            state = state.union(ray.data.from_arrow(extras))
        state = state.materialize()
    raise RuntimeError(
        f"dedup_clusters did not converge in {max_rounds} rounds "
        "(two-phase star contraction needs O(log^2 n) — is the pair "
        "list adversarial or max_rounds too small?)")


def dedup_corpus(ds, pairs=None, id_column: str = "doc_id",
                 text_column: str = "text", threshold: float = 0.9,
                 analyzer: str = "ascii", hash: str = "stable",
                 max_broadcast: int = 50_000_000,
                 driver_max: int = 10_000_000,
                 concurrency: int | None = None, **lsh_opts):
    """End-to-end fuzzy deduplication: keep ONE document per transitive
    near-duplicate cluster (the cluster's minimum id), drop the rest ->
    the surviving rows of ``ds``, full schema, streaming.

    Composes :func:`minhash_lsh_pairs` (or a caller-supplied ``pairs``
    edge list — e.g. :func:`ngram_jaccard_pairs` output) ->
    :func:`dedup_clusters` -> a broadcast drop-set filter.  The drop set
    is every clustered doc except its cluster minimum — OUTPUT-sized
    (only docs that actually near-duplicate something), pulled sorted to
    the driver under the ``max_broadcast`` guard and applied as one
    shuffle-free searchsorted pass over the corpus (the ingest
    drop-stage idiom).  Only id rows ever shuffle (pairs + clusters);
    the corpus itself streams through a single filter map.

    ``**lsh_opts`` forward to :func:`minhash_lsh_pairs` (num_hashes,
    bands, shingle_k, checkpoint_dir).
    """
    import ray

    if pairs is None:
        pairs = minhash_lsh_pairs(
            ds, text_column=text_column, id_column=id_column,
            analyzer=analyzer, threshold=threshold, hash=hash,
            concurrency=concurrency, **lsh_opts)
    labels = dedup_clusters(pairs, driver_max=driver_max)

    def _ids(col) -> np.ndarray:
        t = col.type
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            import pyarrow.compute as pc

            if len(col) and pc.max(
                    pc.count_substring(col, "\x00")).as_py():
                # fixed-width unicode ndarrays ALIAS values differing
                # only by trailing NULs ('x' == 'x\x00' after storage) —
                # the NUL-key class the round-4 sweep targets; exact
                # object compares for NUL-bearing id columns
                return np.asarray(col.to_pylist(), dtype=object)
            # unicode ndarray: numpy compares mixed-width exactly; an
            # object array would fall back to per-element Python compare
            return np.asarray(col.to_pylist())
        return col.to_numpy(zero_copy_only=False)

    chunks = []
    for b in labels.iter_batches(batch_format="pyarrow"):
        d = _ids(b["doc_id"])
        keep = d != _ids(b["cluster_id"])
        if keep.any():
            chunks.append(d[keep])
    drop = np.sort(np.concatenate(chunks)) if chunks else np.empty(0)
    if len(drop) > max_broadcast:
        raise ValueError(
            f"near-duplicate drop set ({len(drop)} ids) exceeds "
            f"max_broadcast={max_broadcast}; raise the threshold or dedup "
            "in keyed partitions")
    ref = ray.put(drop)

    def keep_rows(b: pa.Table) -> pa.Table:
        if not b.num_rows:
            return b
        ids = _ids(b[id_column])
        return b.filter(pa.array(~_sorted_member(ray.get(ref), ids)))

    return ds.map_batches(keep_rows, batch_format="pyarrow")
