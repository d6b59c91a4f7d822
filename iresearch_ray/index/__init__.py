"""Segment-based inverted index: codec, build, segments, manifests, merge."""
