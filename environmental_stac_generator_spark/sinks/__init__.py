"""Sinks: STAC JSON tree, raster encodes, JDBC upsert (SURVEY §2.2)."""
