"""Event-time query registry entries (SURVEY.md §2B streaming-shaped). Phase 3."""
