"""Structured Streaming surface of the pipeline (SURVEY.md §2.6)."""
