"""Reusable distributed operators (SURVEY.md §2 inventory lives here)."""
