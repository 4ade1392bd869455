"""Structured Streaming surface: incremental index maintenance."""
