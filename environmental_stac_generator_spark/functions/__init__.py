"""Scalar function helpers shared by operators and queries."""
