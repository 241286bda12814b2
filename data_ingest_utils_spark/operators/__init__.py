"""Operators: ingestion helpers, relational core, LLM-pipeline ops."""
