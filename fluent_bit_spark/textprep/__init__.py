"""Training-data preparation operators: dedup, similarity search,
text analysis, multimodal plumbing (SURVEY.md §2 extension set)."""
