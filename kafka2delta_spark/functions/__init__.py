"""LLM-data-pipeline function surface: text analysis, deduplication,
similarity search, multimodal column plumbing."""
