"""Structured Streaming extensions (availableNow batch-equivalent)."""
