"""Operator library: parity operators (partitioning) + the large-scale
analytic surface (relational, dedup, similarity, text, multimodal)."""
