"""Batch and streaming source helpers."""
