"""Document deletes: per-segment doc masks, purged at consolidation.

Mirrors the reference's delete path (document_mask per segment applied at
read — formats_10.cpp document_mask_writer :3546; removals resolved against
a committed generation, index_writer.hpp:252-295): ``delete_by_filter``
executes a filter against the CURRENT manifest generation, writes each
affected segment's updated mask as a new artifact, and commits a new
manifest generation referencing the masks.  Readers of older generations
are unaffected (MVCC).  Like the reference, corpus statistics (N, df,
avgdl) keep counting masked docs until a merge physically purges them
(merge_writer drops masked docs and densely remaps doc ids).
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from iresearch_ray.index import manifest as manifest_mod


def load_mask(index_dir: str, seg_entry: dict) -> np.ndarray | None:
    name = seg_entry.get("docmask")
    if not name:
        return None
    t = pq.read_table(os.path.join(index_dir, seg_entry["segment_id"], name))
    return t["deleted_doc"].to_numpy().astype(np.int64)


def _write_mask(index_dir: str, segment_id: str, gen: int,
                deleted: np.ndarray) -> str:
    name = f"docmask-g{gen}.parquet"
    seg_dir = os.path.join(index_dir, segment_id)
    fd, tmp = tempfile.mkstemp(prefix=".mask.", dir=seg_dir)
    os.close(fd)
    pq.write_table(pa.table({"deleted_doc": pa.array(np.sort(deleted),
                                                     type=pa.int64())}), tmp)
    os.replace(tmp, os.path.join(seg_dir, name))
    return name


def _mask_matches(index_dir: str, flt, gen: int, scorer=None,
                  generation: int | None = None) -> tuple[list[dict], int]:
    """Write updated per-segment masks for docs matching ``flt``; returns
    (updated manifest entries, total masked docs) without committing."""
    from iresearch_ray.search.executor import IndexReader
    from iresearch_ray.search.scorers import BM25

    reader = IndexReader(index_dir, generation)
    man = reader.manifest
    prep = flt.prepare(reader, scorer or BM25())
    new_segments = []
    n_deleted = 0
    for seg, entry in zip(reader.segments, man["segments"]):
        docs, _ = prep.execute(seg)
        old = seg.mask if seg.mask is not None else np.empty(0, dtype=np.int64)
        merged = np.union1d(old, docs.astype(np.int64))
        e = dict(entry)
        if len(merged) > len(old):
            e["docmask"] = _write_mask(index_dir, entry["segment_id"], gen, merged)
            e["num_deleted"] = int(len(merged))
        n_deleted += int(len(merged))
        new_segments.append(e)
    return new_segments, n_deleted


def delete_by_filter(index_dir: str, flt, scorer=None,
                     generation: int | None = None) -> dict:
    """Mask every doc matching ``flt``; returns the new manifest."""
    man = manifest_mod.load(index_dir, generation)
    gen = man["generation"] + 1
    new_segments, n_deleted = _mask_matches(index_dir, flt, gen, scorer,
                                            generation)
    return manifest_mod.commit(index_dir, new_segments, generation=gen,
                               extra={"total_deleted": n_deleted})


def replace_by_filter(index_dir: str, flt, new_paths, *, analyzer: str,
                      analyzer_opts: dict | None = None,
                      text_column: str = "text", key_column: str = "url",
                      target_docs: int | None = None, scorer=None,
                      store_columns: tuple = ()) -> dict:
    """Update-as-replace (reference documents_context::replace,
    index_writer.hpp:278-295,325-354): atomically insert replacement docs
    from ``new_paths`` AND mask every older doc matching ``flt`` — both
    visible only from the single new manifest generation (readers of the
    old generation see the pre-replace index)."""
    from iresearch_ray.index.build import DEFAULT_TARGET_DOCS, build_index

    man = manifest_mod.load(index_dir)
    gen = man["generation"] + 1
    masked_entries, n_deleted = _mask_matches(index_dir, flt, gen, scorer)
    sub = build_index(new_paths, index_dir, analyzer=analyzer,
                      analyzer_opts=analyzer_opts, text_column=text_column,
                      key_column=key_column,
                      target_docs=target_docs or DEFAULT_TARGET_DOCS,
                      commit=False, store_columns=store_columns,
                      segment_prefix=f"seg-r{gen}-")
    return manifest_mod.commit(index_dir, masked_entries + sub["segments"],
                               generation=gen,
                               extra={"total_deleted": n_deleted,
                                      "replaced": True})
