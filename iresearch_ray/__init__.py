"""iresearch_ray — a Ray-Data-native full-text index + BM25 query engine.

A from-scratch rebuild of the capabilities of the IResearch toolkit
(segment-based inverted index, pluggable analyzers, boolean / phrase /
prefix / range / fuzzy filters, BM25 / TF-IDF scoring, block-max top-k
pruning) expressed as idiomatic `ray.data.Dataset` pipelines:

- `iresearch_ray.index.build`   — distributed segment build (map_batches)
- `iresearch_ray.index.merge`   — tiered segment consolidation
- `iresearch_ray.search`        — filters, scorers, top-k execution
- `iresearch_ray.analysis`      — analyzer/tokenizer registry
- `iresearch_ray.pipelines`     — dedup / text-stats / ANN data pipelines
- `iresearch_ray.sources`       — pages-table synthesis & readers

Nothing in this package calls ``ray.init`` — callers own the session.
"""

__version__ = "0.1.0"

FORMAT_VERSION = 1
