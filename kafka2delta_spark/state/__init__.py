"""Versioned table state stores (Delta when available, parquet fallback)."""
