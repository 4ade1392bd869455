"""Query side: posting lookup, BM25 scoring, block-max WAND top-k."""
