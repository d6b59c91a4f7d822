"""Distributed query serving: long-lived segment-group actors.

Scale path for the query side (the reference serves queries from one
process over mmap'd segments — utils/index-search.cpp:544-546; on a Ray
cluster segments live across nodes, so readers become a pool of
**segment-group actors**, each holding its groups' decoded dictionaries /
docmaps in memory across queries):

1. ``collect``: every actor reports local df for the filter's terms
   (reference term_collector, summed over segments — bm25.cpp:250-256).
2. the driver sums dfs into the global ``df_map``.
3. ``execute``: actors run the filter with the global stats, each returning
   its top-k candidates (bounded: k rows per group cross the wire).
4. the driver merges candidate sets into the final top-k.

Dictionary-expansion filters (prefix/range/wildcard/fuzzy) get EXACT
global stats: the ``expand_dfs`` collect round has every actor report its
groups' matched term -> local df, the driver sums them into the global
``df_map``, and execution scores each matched term with its global df —
the same collect/sum the reference's term_collector performs.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd


def _make_group_actor():
    import ray

    @ray.remote(num_cpus=1, max_restarts=2, max_task_retries=2)
    class SegmentGroupSearcher:
        # restart-safe: all state derives from the small plain-value
        # constructor args (index_dir, entries, stats) over immutable
        # segment artifacts — a crashed actor rebuilds its readers and
        # replays the failed call (reference: stateless readers over
        # mmap'd segments survive process restarts the same way)
        """Holds SegmentReaders for one group of segments (state cached
        across queries — the reference's long-lived reader + caches)."""

        def __init__(self, index_dir: str, generation, segment_entries,
                     field_stats):
            from iresearch_ray.index.segment import SegmentReader
            from iresearch_ray.search.executor import SegmentView
            from iresearch_ray.search.scorers import FieldStats

            from iresearch_ray.index.delete import load_mask

            self.segments = [
                SegmentView(SegmentReader(os.path.join(index_dir, e["segment_id"])),
                            e["base"],
                            load_mask(index_dir, e) if e.get("docmask") else None)
                for e in segment_entries
            ]
            self.stats = FieldStats(*field_stats)

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

        def execute_topk(self, flt, scorer, df_map: dict, k: int,
                         mode: str = "all", threshold: float = float("-inf")):
            """``mode='top'`` + a driver-supplied score threshold: block-max
            WAND pruning inside the actor (single-term filters), with the
            threshold tightening across this group's segments — the
            reference's cross-segment score_threshold feedback
            (utils/index-search.cpp:701-740) stretched over actors."""
            from iresearch_ray.search.executor import _wand_term, _wand_union
            from iresearch_ray.search.filters import _PreparedTerm, _PreparedUnion

            prep = flt.prepare(self, scorer, df_map=df_map)
            docs_l, scores_l, keys_l = [], [], []
            kept = 0
            for seg in self.segments:
                # WAND only on unmasked segments: a masked doc's score must
                # not establish a pruning threshold
                if (mode == "top" and isinstance(prep, _PreparedTerm)
                        and seg.mask is None):
                    raw = _wand_term(prep, seg, k, threshold)
                elif (mode == "top" and isinstance(prep, _PreparedUnion)
                        and seg.mask is None
                        and all(isinstance(c, _PreparedTerm)
                                for c in prep.children)):
                    raw = _wand_union(prep, seg, threshold)
                else:
                    raw = prep.execute(seg)
                docs, scores = seg.apply_mask(*raw)
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
            return (np.concatenate(docs_l),
                    np.concatenate(scores_l).astype(np.float64),
                    list(np.concatenate(keys_l)))

    return SegmentGroupSearcher


class DistributedSearcher:
    """Driver-side handle over a pool of segment-group actors."""

    def __init__(self, index_dir: str, num_groups: int | None = None,
                 generation: int | None = None, scorer=None):
        import ray

        from iresearch_ray.index import manifest as manifest_mod
        from iresearch_ray.search.scorers import BM25

        self.scorer = scorer or BM25()
        man = manifest_mod.load(index_dir, generation)
        entries = []
        base = 0
        for s in man["segments"]:
            entries.append({"segment_id": s["segment_id"], "base": base,
                            "docmask": s.get("docmask")})
            base += s["num_docs"]
        if num_groups is None:
            num_groups = min(len(entries),
                             max(1, int(ray.cluster_resources().get("CPU", 4)) - 2))
        groups = [entries[i::num_groups] for i in range(num_groups)]
        groups = [g for g in groups if g]
        field_stats = (man["num_docs"], man["sum_doc_len"])
        Actor = _make_group_actor()
        self.actors = [Actor.remote(index_dir, man.get("generation"), g, field_stats)
                       for g in groups]

    def search(self, flt, k: int = 10, mode: str = "all") -> pd.DataFrame:
        """``mode='top'``: two-wave block-max WAND — the first (pilot) group
        establishes a k-th-score threshold, broadcast to the remaining
        groups which prune blocks below it (the reference's shared
        score_threshold, spread across actors; results stay identical to
        mode='all' because the bound is conservative)."""
        import ray

        from iresearch_ray.search.filters import df_collect_nodes

        df_map: dict[str, int] = {}
        terms = sorted(flt.terms_needed())
        nodes = df_collect_nodes(flt)
        per_actor = []
        for a in self.actors:
            fs = []
            if terms:
                fs.append(a.term_dfs.remote(terms))
            for node in nodes:
                fs.append(a.expand_dfs.remote(node))
            per_actor.append(fs)
        for fs in per_actor:
            # within ONE actor, the same key reported by two nodes (e.g.
            # an identical variadic part in two phrase filters, or a term
            # matched by two overlapping expansions) carries the same
            # group-local df — merge with max, or the cross-actor sum
            # below would double-count it
            mine: dict[str, int] = {}
            for part in ray.get(fs):
                for t, d in part.items():
                    mine[t] = max(mine.get(t, 0), d)
            for t, d in mine.items():
                df_map[t] = df_map.get(t, 0) + d
        if mode == "top" and len(self.actors) > 1:
            pilot = ray.get(self.actors[0].execute_topk.remote(
                flt, self.scorer, df_map, k, "top"))
            # one ulp below the pilot's k-th score so cross-group ties
            # (broken by doc id at the merge) are never pruned
            thr = (float(np.nextafter(np.sort(pilot[1])[-k], -np.inf))
                   if len(pilot[1]) >= k else float("-inf"))
            rest = ray.get([a.execute_topk.remote(flt, self.scorer, df_map,
                                                  k, "top", thr)
                            for a in self.actors[1:]])
            results = [pilot, *rest]
        else:
            results = ray.get([a.execute_topk.remote(flt, self.scorer,
                                                     df_map, k, mode)
                               for a in self.actors])
        docs = np.concatenate([r[0] for r in results])
        scores = np.concatenate([r[1] for r in results])
        keys = [k_ for r in results for k_ in r[2]]
        if not len(docs):
            return pd.DataFrame({"doc": docs, "key": keys, "score": scores})
        order = np.lexsort((docs, -scores))[:k]
        return pd.DataFrame({"doc": docs[order],
                             "key": [keys[i] for i in order],
                             "score": scores[order]})

    def close(self):
        import ray

        for a in self.actors:
            ray.kill(a)
        self.actors = []
