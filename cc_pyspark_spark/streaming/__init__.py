"""Structured Streaming variants of the batch time-window operators."""
