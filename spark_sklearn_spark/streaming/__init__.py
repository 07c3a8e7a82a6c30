"""Structured Streaming jobs (SURVEY.md §2B 'Streaming-only')."""
