"""Structured-Streaming shell and event-time analytics operators."""
