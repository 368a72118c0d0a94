"""Operators: parsers, filters, rewrites, correlation, enrichment,
dedup, similarity, text analysis, multimodal plumbing."""
