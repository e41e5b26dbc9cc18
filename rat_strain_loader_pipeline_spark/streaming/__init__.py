"""Structured Streaming surface (SURVEY.md §2.8 extension territory)."""
