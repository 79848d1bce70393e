"""Spark operators: extraction UDFs, dedup, similarity, text analysis,
multimodal plumbing."""
