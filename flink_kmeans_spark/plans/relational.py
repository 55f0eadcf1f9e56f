"""Relational-core query registry entries (SURVEY.md §2B). Phase 2."""
