"""Spark DataFrame operators re-deriving the reference's dataflow
(SURVEY.md §2) plus the training-data-pipeline operator family (dedup,
similarity search, text analysis, multimodal plumbing)."""
