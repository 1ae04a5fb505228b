"""Structured Streaming variants of the tier rollups."""
