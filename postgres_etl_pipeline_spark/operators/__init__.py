"""Operator library: relational parity ops (SURVEY §2) + 100 TB extension
operators (dedup, similarity, text, multimodal — SURVEY §7 Phase 5)."""
