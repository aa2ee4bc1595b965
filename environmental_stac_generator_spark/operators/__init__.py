"""Operators over the long-format forecast model (SURVEY §2.3–§2.6)."""
