"""Structured Streaming surfaces (SURVEY.md §1.2: the crawler round loop
as a foreachBatch skin; windowed event aggregation with watermarks)."""
