"""Scale extensions (SURVEY.md §2.11, X1-X5): the operators a 100 TB
training-data pipeline needs beyond the reference's surface —
deduplication, similarity search, text analysis, multimodal columns.
"""
