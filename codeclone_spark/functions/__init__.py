"""Vectorized functions: audio decode facts, text analytics, vector math."""
