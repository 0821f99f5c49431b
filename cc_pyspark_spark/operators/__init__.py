"""Composite operators: graph construction, dedup, similarity, multimodal."""
