"""Structured Streaming: incremental catalog maintenance (SURVEY §2.9)."""
