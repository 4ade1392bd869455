"""Training-data-pipeline operators: dedup, similarity, text analysis,
multimodal plumbing — first-class components alongside the index engine."""
