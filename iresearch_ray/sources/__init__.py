"""Input sources: pages-table synthesis and readers."""
