"""Operator families (SURVEY.md §2): retail metrics, dedup, similarity,
text analysis, event windows, multimodal plumbing."""
