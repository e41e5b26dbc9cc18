"""End-to-end pipelines mirroring the reference tools (SURVEY.md §3)."""
