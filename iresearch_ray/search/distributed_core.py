"""Shared guts of the distributed searchers (single-field and multi-field).

Both serving paths are the same machine — df collect with per-actor
max-merge, pilot-wave WAND threshold sharing, bounded k-rows-per-group
merges (reference term_collector + score_threshold feedback,
core/search/bm25.cpp:250-256, utils/index-search.cpp:701-740) — and
diverge only in how a prepared filter routes to a segment (masks on the
single-field path, per-field sub-segments on the multi-field path).
`GroupSearchCore` holds the per-actor logic with two overridable hooks;
the driver helpers hold the collect/merge halves.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


class GroupSearchCore:
    """Actor-side logic for one group of segments.

    Subclasses set ``self.segments`` / ``self.stats`` in ``__init__`` and
    may override ``_wand_route`` (filter node + segment eligible for WAND,
    or ``(prep, None)`` to force the dense path) and ``_apply_mask``.
    """

    # ---- hooks -----------------------------------------------------
    def _wand_route(self, prep, seg):
        """(node, eseg): the prepared node and segment WAND may run over,
        or eseg=None when only the dense execute path is safe."""
        return prep, (seg if seg.mask is None else None)

    def _union_children_wandable(self, node, eseg) -> bool:
        from iresearch_ray.search.filters import _PreparedTerm

        return all(isinstance(c, _PreparedTerm) for c in node.children)

    def _apply_mask(self, seg, raw):
        return seg.apply_mask(*raw)

    # ---- collect ---------------------------------------------------
    def expand_dfs(self, flt) -> dict:
        """Dictionary-expansion collect: matched term -> local df."""
        return flt.expand_dfs(self)

    def term_dfs(self, terms: list[str]) -> dict:
        out: dict[str, int] = {}
        for t in terms:
            total = 0
            for seg in self.segments:
                i = seg.reader.lookup(t)
                if i >= 0:
                    total += int(seg.reader.df_array()[i])
            if total:
                out[t] = total
        return out

    # ---- execute ---------------------------------------------------
    def execute_topk(self, flt, scorer, df_map: dict, k: int,
                     mode: str = "all", threshold: float = float("-inf")):
        """``mode='top'`` + a driver-supplied score threshold: block-max
        WAND pruning inside the actor, with the threshold tightening
        across this group's segments — the reference's cross-segment
        score_threshold feedback stretched over actors.  WAND never runs
        where ``_wand_route`` withholds the segment (masked docs must not
        establish pruning thresholds)."""
        from iresearch_ray.search.executor import _wand_term, _wand_union
        from iresearch_ray.search.filters import _PreparedTerm, _PreparedUnion

        prep = flt.prepare(self, scorer, df_map=df_map)
        docs_l, scores_l, keys_l = [], [], []
        kept = 0
        for seg in self.segments:
            node, eseg = self._wand_route(prep, seg)
            if (mode == "top" and isinstance(node, _PreparedTerm)
                    and eseg is not None):
                raw = _wand_term(node, eseg, k, threshold)
            elif (mode == "top" and isinstance(node, _PreparedUnion)
                    and eseg is not None
                    and self._union_children_wandable(node, eseg)):
                raw = _wand_union(node, eseg, threshold)
            else:
                raw = prep.execute(seg)
            docs, scores = self._apply_mask(seg, raw)
            if not len(docs):
                continue
            kept += len(docs)
            if mode == "top" and kept >= k and len(scores):
                all_s = np.concatenate(scores_l + [scores]) \
                    if scores_l else scores
                if len(all_s) >= k:
                    threshold = max(threshold, float(np.nextafter(
                        np.partition(all_s, len(all_s) - k)[len(all_s) - k],
                        -np.inf)))
            if len(docs) > k:  # tie-exact pre-trim (see executor)
                kth = np.partition(scores, len(scores) - k)[len(scores) - k]
                cand = np.flatnonzero(scores >= kth)
                sel = cand[np.lexsort((docs[cand], -scores[cand]))[:k]]
                docs, scores = docs[sel], scores[sel]
            keys_l.append(seg.reader.keys[docs - 1])
            docs_l.append(docs + seg.base)
            scores_l.append(scores)
        if not docs_l:
            return (np.empty(0, dtype=np.int64),
                    np.empty(0, dtype=np.float64), [])
        docs = np.concatenate(docs_l)
        scores = np.concatenate(scores_l).astype(np.float64)
        keys = np.concatenate(keys_l)
        if len(docs) > k:
            # group-level trim: the driver merge orders by (-score, doc),
            # so each group's own top-k by that exact order is all it can
            # contribute — k rows per GROUP cross the wire, not k per
            # segment (docs are already global here)
            sel = np.lexsort((docs, -scores))[:k]
            docs, scores, keys = docs[sel], scores[sel], keys[sel]
        return docs, scores, list(keys)


# -------------------------------------------------- driver-side halves ----
def plan_groups(entries: list[dict], num_groups: int | None) -> list[list[dict]]:
    """Round-robin segment entries into actor groups (CPU-count default)."""
    import ray

    if num_groups is None:
        num_groups = min(len(entries), max(1, int(
            ray.cluster_resources().get("CPU", 4)) - 2))
    groups = [entries[i::num_groups] for i in range(num_groups)]
    return [g for g in groups if g]


def collect_df_map(actors, flt) -> dict:
    """Global df collect: flat terms + expansion nodes per actor; within
    one actor the same key from two nodes carries the same group-local df
    (merge with max), across actors dfs sum — anything else double-counts
    shared parts (round-2 bug, fixed with this exact shape)."""
    import ray

    from iresearch_ray.search.filters import df_collect_nodes

    df_map: dict[str, int] = {}
    terms = sorted(flt.terms_needed())
    nodes = df_collect_nodes(flt)
    per_actor = []
    for a in actors:
        fs = []
        if terms:
            fs.append(a.term_dfs.remote(terms))
        for node in nodes:
            fs.append(a.expand_dfs.remote(node))
        per_actor.append(fs)
    for fs in per_actor:
        mine: dict[str, int] = {}
        for part in ray.get(fs):
            for t, d in part.items():
                mine[t] = max(mine.get(t, 0), d)
        for t, d in mine.items():
            df_map[t] = df_map.get(t, 0) + d
    return df_map


def distributed_topk(actors, flt, scorer, df_map: dict, k: int,
                     mode: str) -> pd.DataFrame:
    """Two-wave execute + bounded merge.  ``mode='top'``: the pilot
    group's k-th score (one ulp down, so cross-group ties broken by doc
    id at the merge are never pruned) prunes the remaining groups."""
    import ray

    if not actors:  # empty index -> empty frame, like the local searcher
        return pd.DataFrame({"doc": np.empty(0, dtype=np.int64),
                             "key": pd.Series([], dtype=object),
                             "score": np.empty(0, dtype=np.float64)})
    if mode == "top" and len(actors) > 1:
        pilot = ray.get(actors[0].execute_topk.remote(
            flt, scorer, df_map, k, "top"))
        thr = (float(np.nextafter(np.sort(pilot[1])[-k], -np.inf))
               if len(pilot[1]) >= k else float("-inf"))
        rest = ray.get([a.execute_topk.remote(flt, scorer, df_map,
                                              k, "top", thr)
                        for a in actors[1:]])
        results = [pilot, *rest]
    else:
        results = ray.get([a.execute_topk.remote(flt, scorer, df_map,
                                                 k, mode)
                           for a in actors])
    docs = np.concatenate([r[0] for r in results])
    scores = np.concatenate([r[1] for r in results])
    keys = [k_ for r in results for k_ in r[2]]
    if not len(docs):
        return pd.DataFrame({"doc": docs, "key": keys, "score": scores})
    order = np.lexsort((docs, -scores))[:k]
    return pd.DataFrame({"doc": docs[order],
                         "key": [keys[i] for i in order],
                         "score": scores[order]})
