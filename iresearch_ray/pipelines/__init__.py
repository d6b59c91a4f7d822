"""Training-data pipelines: dedup, text stats, similarity search."""
