"""Scalar function helpers shared across the engine."""
