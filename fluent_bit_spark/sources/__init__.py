"""Sources: the ingest-table readers (SURVEY.md §2.1)."""

from fluent_bit_spark.sources.pages import dummy_pages, read_pages

__all__ = ["read_pages", "dummy_pages"]
