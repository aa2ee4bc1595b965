"""Catalog-level dataflow plans (STAC assembly, config guard)."""
