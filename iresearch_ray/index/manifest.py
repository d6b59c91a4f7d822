"""Index manifest: versioned list of live segments (MVCC commit point).

The analogue of the reference's ``index_meta`` / ``segments_N`` file
(/root/reference/core/index/index_meta.hpp:119-182; atomic write discipline
of index_meta_writer, core/formats/formats_10.cpp:3518): a JSON file
``index_<generation>.json`` naming the live segments, written atomically
(tmp + rename) AFTER every segment directory exists.  Readers open the
highest generation — an interrupted build never corrupts a committed view.
"""

from __future__ import annotations

import glob
import json
import os
import re
import tempfile

from iresearch_ray import FORMAT_VERSION

_GEN_RE = re.compile(r"index_(\d+)\.json$")


def commit(index_dir: str, segments: list[dict], generation: int | None = None,
           extra: dict | None = None) -> dict:
    """Atomically write the next index manifest generation."""
    os.makedirs(index_dir, exist_ok=True)
    if generation is None:
        cur = latest_generation(index_dir)
        generation = (cur + 1) if cur is not None else 1
    manifest = {
        "format_version": FORMAT_VERSION,
        "generation": generation,
        "num_docs": sum(s["num_docs"] for s in segments),
        "sum_doc_len": sum(s["sum_doc_len"] for s in segments),
        "segments": segments,
    }
    if extra:
        manifest.update(extra)
    fd, tmp = tempfile.mkstemp(prefix=".index_meta.", dir=index_dir)
    with os.fdopen(fd, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, os.path.join(index_dir, f"index_{generation}.json"))
    return manifest


def latest_generation(index_dir: str) -> int | None:
    gens = []
    for p in glob.glob(os.path.join(index_dir, "index_*.json")):
        m = _GEN_RE.search(p)
        if m:
            gens.append(int(m.group(1)))
    return max(gens) if gens else None


def load(index_dir: str, generation: int | None = None) -> dict:
    if generation is None:
        generation = latest_generation(index_dir)
    if generation is None:
        raise FileNotFoundError(f"no index manifest in {index_dir}")
    with open(os.path.join(index_dir, f"index_{generation}.json")) as f:
        return json.load(f)
