"""Engine-level operators (SURVEY.md §2.4-§2.6 + LLM-data extensions)."""
