"""Operators: validation rules, dedup, similarity search, text analytics."""
