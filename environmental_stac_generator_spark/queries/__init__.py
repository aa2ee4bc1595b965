"""Registered queries — one module per SURVEY.md §2 operator family."""
