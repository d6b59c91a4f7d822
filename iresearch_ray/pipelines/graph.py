"""Link-graph analytics: weighted PageRank over an edge list.

Reference parity: the reference engine has no graph operators — this is
part of the beyond-reference webtext family (SURVEY.md §2 "LLM-data
pipeline operators"), the consumer of ``curate.domain_links``'s
(src, dst, n) edges: crawl-frontier prioritisation and domain-quality
weighting both want a PageRank-style score per host.

FIXED-POINT EXACT: ranks are int64 micro-units (``scale`` units = rank
1.0).  Every per-edge contribution is ``floor(((d * r) * n) / W + 0.5)``
evaluated in IEEE float64 with that exact association — numpy here,
``CAST(... AS DOUBLE)`` in the DuckDB oracle — so both sides produce the
same int64, integer sums are order-free, and ten iterations stay
bit-identical end-to-end (same discipline as the ann_ivf k-means-in-SQL
oracle).

Distribution shape (SCALE.md §4): the edge table is materialized once
and never re-shuffled; each iteration is one shuffle-free map_batches
over the edges (rank + out-weight vectors broadcast via ``ray.put`` as
sorted arrays — NODE-set-sized, the documented small-side assumption,
guarded by ``max_broadcast``) followed by ONE keys-only sort+combine
summing per-target contributions.  Driver state is node-sized vectors
only; markup/docs never enter the loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def pagerank(edges, src_column: str = "src_domain",
             dst_column: str = "dst_domain", weight_column: str = "n",
             damping: float = 0.85, iterations: int = 10,
             scale: int = 10 ** 12,
             max_broadcast: int = 200_000_000):
    """Weighted PageRank -> Dataset(node, rank_units, rank).

    ``rank_units`` is the exact int64 fixed-point mass (``scale`` units
    = 1.0); ``rank`` is the single float64 division units/scale.
    Dangling mass (nodes with no out-edges) redistributes uniformly
    each iteration.  ``max_broadcast`` bounds the driver/broadcast node
    vectors in bytes; exceeding it raises (the corpus-scale remedy is
    partitioning the rank vector by node hash and co-shuffling edges
    once per iteration — not needed below ~1e8 domains).
    """
    damping = float(damping)
    edges = edges.materialize()

    from iresearch_ray.pipelines.dedup import _grouped_count_min

    # static per-source out-weight W = sum(n), and the node universe
    def src_rows(b: pa.Table) -> pa.Table:
        return pa.table({"s": b[src_column], "n": b[weight_column]})

    outw = _grouped_count_min(
        edges.map_batches(src_rows, batch_format="pyarrow"),
        "s", None, count_alias="_c", sum_column="n",
        sum_alias="w").to_pandas()

    def dst_rows(b: pa.Table) -> pa.Table:
        return pa.table({"t": b[dst_column]})

    dsts = _grouped_count_min(
        edges.map_batches(dst_rows, batch_format="pyarrow"),
        "t", None, count_alias="_c").to_pandas()

    if not len(outw):
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], pa.string()),
            "rank_units": pa.array([], pa.int64()),
            "rank": pa.array([], pa.float64())}))
    src_sorted = np.sort(outw["s"].to_numpy())
    w_units = outw.set_index("s").loc[src_sorted, "w"].to_numpy(
        np.int64)
    # a source whose weights sum to <= 0 (zero/negative weight_column
    # values on the public API; domain_links can't produce them) would
    # make contrib() divide by w=0 -> inf/nan silently cast to garbage
    # int64 rank units.  Fail loudly instead.
    if (w_units <= 0).any():
        bad = src_sorted[(w_units <= 0).argmax()]
        raise ValueError(
            f"pagerank: source {bad!r} has non-positive out-weight sum; "
            f"every edge needs {weight_column} >= 1")
    nodes = np.unique(np.concatenate(
        [src_sorted, dsts["t"].to_numpy()]))
    n_nodes = len(nodes)
    if n_nodes * 48 > max_broadcast:
        raise ValueError(
            f"pagerank: {n_nodes} nodes exceeds max_broadcast="
            f"{max_broadcast} bytes; partition the rank vector")
    # hash-based membership: np.isin on object arrays degrades to an
    # O(nodes x srcs) broadcast compare (487 s at 200k nodes, measured)
    is_dangling = pd.Index(src_sorted).get_indexer(nodes) < 0

    # Integer-ify the edge table ONCE: node-index src/dst plus float64
    # n and W columns (int->float64 conversions are exact below 2^53).
    # All string handling happens here; the iteration loop is pure
    # numeric numpy + one int-key sort+combine, and the only broadcast
    # that repeats per iteration is the int64 rank vector (plain
    # numeric arrays stay zero-copy in the object store).  The
    # per-iteration string lookups of the first version cost ~45 s/iter
    # at 2M edges; this shape runs the same iteration in ~2 s.
    # per-node out-weight vector indexed by NODE id, so intify does one
    # string-hash lookup per endpoint (not a second per-source probe)
    w_by_node = np.zeros(n_nodes, np.float64)
    w_by_node[pd.Index(nodes).get_indexer(src_sorted)] = \
        w_units.astype(np.float64)
    node_ref = ray.put((pd.Index(nodes), w_by_node))
    sc, dc, wc = src_column, dst_column, weight_column

    def intify(b: pa.Table, _ref=node_ref) -> pa.Table:
        nd, wbn = ray.get(_ref)
        si = nd.get_indexer(b[sc].to_numpy(zero_copy_only=False))
        ti = nd.get_indexer(b[dc].to_numpy(zero_copy_only=False))
        return pa.table({
            "si": pa.array(si, pa.int64()),
            "ti": pa.array(ti, pa.int64()),
            "nf": pa.array(b[wc].to_numpy(
                zero_copy_only=False).astype(np.float64), pa.float64()),
            "wf": pa.array(wbn[si], pa.float64())})

    iedges = edges.map_batches(
        intify, batch_format="pyarrow").materialize()

    # all scalar expressions mirror the SQL oracle byte-for-byte
    units = np.full(n_nodes, np.int64(
        np.floor(float(scale) / float(n_nodes) + 0.5)))
    base = np.int64(np.floor(
        ((1.0 - damping) * float(scale)) / float(n_nodes) + 0.5))

    for _ in range(iterations):
        ref = ray.put(units)

        def contrib(b: pa.Table, _ref=ref) -> pa.Table:
            u = ray.get(_ref)
            r = u[b["si"].to_numpy()].astype(np.float64)
            n = b["nf"].to_numpy()
            w = b["wf"].to_numpy()
            c = np.floor(((damping * r) * n) / w + 0.5).astype(np.int64)
            return pa.table({"ti": b["ti"],
                             "c": pa.array(c, pa.int64())})

        summed = _grouped_count_min(
            iedges.map_batches(contrib, batch_format="pyarrow"),
            "ti", None, count_alias="_c", sum_column="c",
            sum_alias="csum").to_pandas()
        dang_mass = int(units[is_dangling].sum())
        dang = np.int64(np.floor(
            (damping * float(dang_mass)) / float(n_nodes) + 0.5))
        nxt = np.full(n_nodes, base + dang, dtype=np.int64)
        nxt[summed["ti"].to_numpy(np.int64)] += \
            summed["csum"].to_numpy(np.int64)
        units = nxt

    return ray.data.from_arrow(pa.table({
        "node": pa.array(nodes.tolist(), pa.string()),
        "rank_units": pa.array(units, pa.int64()),
        "rank": pa.array(units.astype(np.float64) / float(scale),
                         pa.float64())}))


def filter_by_domain_rank(ds, ranks, min_rank_units: int,
                          url_column: str = "url",
                          max_broadcast: int = 200_000_000):
    """Rank-aware curation: keep rows whose url's domain has
    ``rank_units >= min_rank_units`` in ``ranks`` (a :func:`pagerank` /
    :func:`domain_rank` result) — "docs from reputable hosts", the
    quality-weighting step a crawl pipeline runs after ranking.

    The threshold compares int64 fixed-point units, so the decision is
    exact.  The kept-domain set is node-sized, broadcast sorted under
    ``max_broadcast``; rows whose domain is absent from the graph (or
    has no extractable host) drop."""
    import pyarrow.compute as pc

    from iresearch_ray.pipelines.curate import extract_domain
    from iresearch_ray.pipelines.dedup import _sorted_member

    kept_tbl = ranks.filter(
        expr=f"rank_units >= {int(min_rank_units)}").select_columns(
        ["node"]).to_pandas()
    kept = np.sort(kept_tbl["node"].to_numpy())
    payload = int(sum(len(x) for x in kept)) + 8 * len(kept)
    if payload > max_broadcast:
        raise ValueError(
            f"kept-domain set {payload} B exceeds max_broadcast="
            f"{max_broadcast}; invert to a drop set or partition")
    ref = ray.put(kept)

    def keep_rows(b: pa.Table) -> pa.Table:
        doms = b["_rank_domain"].to_numpy(zero_copy_only=False)
        mask = _sorted_member(ray.get(ref), doms)
        return b.filter(pa.array(mask)).drop_columns(["_rank_domain"])

    tagged = extract_domain(ds, url_column=url_column,
                            out_column="_rank_domain")
    return tagged.map_batches(keep_rows, batch_format="pyarrow")


def domain_rank(ds, html_column: str = "html", url_column: str = "url",
                damping: float = 0.85, iterations: int = 10,
                concurrency: int | None = None, **kw):
    """PageRank over the domain link graph of a crawled-page corpus:
    ``curate.domain_links`` (href fan-out -> host-pair edge counts)
    feeding :func:`pagerank`."""
    from iresearch_ray.pipelines.curate import domain_links

    edges = domain_links(ds, html_column=html_column,
                         url_column=url_column, concurrency=concurrency)
    return pagerank(edges, damping=damping, iterations=iterations, **kw)
