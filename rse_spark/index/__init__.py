"""Index build: tokenize -> tf -> salted agg -> compressed posting segments."""
