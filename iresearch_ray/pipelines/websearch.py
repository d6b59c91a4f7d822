"""Anchor-text indexing: a fulltext index over what OTHER pages' links
call each domain — the classic off-page web-search relevance signal
(reference parity: composition of this repo's webgraph + index families;
the reference engine itself has no crawl-side surface).

Shape: href/anchor extraction is the vectorized `curate.extract_anchors`
fan-out; target hosts resolve through the shared domain chain; an
optional per-domain anchor cap reuses the exact rank-repair machinery
(`dedup.grouped_rank_drop_ids` — one (domain, anchor-id) keys-only sort,
exact at any in-link skew, so a hub domain cannot flood its document);
each domain's surviving anchors concatenate deterministically (sorted by
their (page, position) id) into ONE document, staged atomically to
Parquet and indexed by the normal segment builder.  Searching the result
ranks domains by anchor text: BM25 over incoming-link language.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


@ray.remote
def _aid_nbytes(t):
    """True string payload of a drop-set block's _aid column."""
    return t["_aid"].nbytes if t.num_rows else 0


def build_anchor_index(ds, work_dir: str, *, html_column: str = "html",
                       url_column: str = "url",
                       anchors_per_domain: int | None = 10_000,
                       domain_mode: str = "host",
                       psl_path: str | None = None,
                       analyzer: str = "ascii",
                       analyzer_opts: dict | None = None,
                       target_docs: int = 50_000,
                       max_broadcast: int = 50_000_000,
                       **build_kw) -> dict:
    """Pages(url, html) -> anchor-text index keyed by target domain.

    Returns the index manifest.  ``anchors_per_domain`` keeps the cap
    deterministically-first anchors per domain ((page url, in-page
    position) order); the over-cap drop set is trim-sized and broadcast
    under ``max_broadcast``.  The DEFAULT cap (10k, the hub-probe value:
    500k pages / 1.5M anchors onto one domain in 5.9 s) bounds the
    per-domain ``map_groups`` group below — a crawl-scale hub like
    wikipedia.org has billions of in-links, and an uncapped group is one
    task holding all of them.  Pass ``anchors_per_domain=None`` ONLY for
    corpora known to have no hub domains; it re-opens that skew cliff.

    Contract: ``url_column`` values are unique per page (the same
    convention as ingest's key column and duplicated_span_stats's id) —
    anchor identity is (url, in-page ordinal), so a recrawl-duplicated
    url must be exact-deduped first or its anchors share ids and the
    per-domain cap turns approximate."""
    import pyarrow.compute as pc

    from iresearch_ray.index.build import build_index
    from iresearch_ray.pipelines.curate import (
        extract_anchors,
        extract_domain,
        psl_fingerprint,
    )
    from iresearch_ray.pipelines.dedup import (
        _collect_small,
        _sorted_member,
        grouped_rank_drop_ids,
    )
    from iresearch_ray.util import stage_parquet_atomic

    if anchors_per_domain is not None and anchors_per_domain < 1:
        raise ValueError(
            f"anchors_per_domain must be >= 1, got {anchors_per_domain}")

    # the in-page ordinal is emitted by extract_anchors ITSELF (same
    # batch the page fans out from), so (url, ordinal) anchor ids stay
    # stable however Ray re-blocks the rows downstream
    anchors = extract_anchors(ds, html_column=html_column,
                              key_column=url_column,
                              ordinal_column="_ord")
    tagged = extract_domain(anchors, url_column="href",
                            out_column="domain", mode=domain_mode,
                            psl_path=psl_path)

    def keep_and_id(b: pa.Table) -> pa.Table:
        # a source url with an embedded NUL would make the packed
        # (url \x00 ordinal) anchor id ambiguous (two (url, ordinal)
        # pairs could collide, breaking the cap's unique-id invariant);
        # a NUL is invalid in a URL, so such pages drop here
        keep = pc.and_(
            pc.and_(pc.not_equal(b["domain"], ""),
                    pc.not_equal(b["anchor"], "")),
            pc.invert(pc.match_substring(b[url_column], "\x00")))
        t = b.filter(keep)
        # zero-padded to 20 digits (covers all of int64), so the id's
        # lexicographic order == (url, ordinal) numeric order; Arrow
        # lpad kernel — no Python per row
        ordpad = pc.utf8_lpad(pc.cast(t["_ord"], pa.string()), 20, "0")
        aid = pc.binary_join_element_wise(t[url_column], ordpad, "\x00")
        return pa.table({"domain": t["domain"], "anchor": t["anchor"],
                         "_aid": aid})

    rows = tagged.map_batches(keep_and_id,
                              batch_format="pyarrow").materialize()

    if anchors_per_domain is not None:
        drops_ds = grouped_rank_drop_ids(
            rows.select_columns(["domain", "_aid"]), "domain", "_aid",
            cap=anchors_per_domain).materialize()
        # size the drop set REMOTELY (per-block Arrow buffer scan =
        # true string payload; an object-array .nbytes would count
        # 8 B/pointer and under-guard 5-25x) BEFORE any driver
        # collection — a hub-heavy crawl's drop set can be corpus-sized
        # and must hit the guard as a clean ValueError, not OOM the
        # driver inside _collect_small
        payload = int(sum(ray.get(
            [_aid_nbytes.remote(r) for r in drops_ds.to_arrow_refs()])))
        if payload > max_broadcast:
            raise ValueError(
                f"anchor drop set {payload} B exceeds "
                f"max_broadcast={max_broadcast}")
        drops = _collect_small(drops_ds)
        if drops is not None and drops.num_rows:
            drop_ids = np.sort(drops["_aid"].to_numpy(
                zero_copy_only=False))
            ref = ray.put(drop_ids)

            def drop(b: pa.Table, _ref=ref) -> pa.Table:
                ids = b["_aid"].to_numpy(zero_copy_only=False)
                return b.filter(pa.array(~_sorted_member(
                    ray.get(_ref), ids)))

            rows = rows.map_batches(drop, batch_format="pyarrow")

    def concat_domain(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("_aid")
        return pd.DataFrame({
            "domain": [df["domain"].iloc[0]],
            "n_anchors": [len(df)],
            "text": [" ".join(df["anchor"])]})

    staged = os.path.join(work_dir, "anchors_staged")
    # group size invariant: every group here holds <= anchors_per_domain
    # rows (the rank-repair cap ran above), so one task per domain is
    # bounded no matter how skewed the in-link graph is.  Only an
    # explicit anchors_per_domain=None re-opens the unbounded path.
    stage_parquet_atomic(
        lambda: rows.groupby("domain").map_groups(
            concat_domain, batch_format="pandas"),
        staged,
        # domain_mode + the PSL content fingerprint are staleness
        # inputs: rerunning with a different mode or rules file must
        # rebuild, not silently reuse host-keyed staged anchors
        params={"anchors_per_domain": anchors_per_domain,
                "html_column": html_column, "url_column": url_column,
                "domain_mode": domain_mode,
                "psl": psl_fingerprint(psl_path)
                if domain_mode == "registrable" else None})

    return build_index(
        staged, os.path.join(work_dir, "index"), analyzer=analyzer,
        analyzer_opts=analyzer_opts, text_column="text",
        key_column="domain", target_docs=target_docs,
        store_columns=("n_anchors",), **build_kw)
