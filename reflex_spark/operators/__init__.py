"""Operator library: relational extensions + LLM-data-pipeline operators."""
