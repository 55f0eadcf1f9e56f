"""LLM-data-pipeline query registry entries (SURVEY.md §2B). Phase 4."""
