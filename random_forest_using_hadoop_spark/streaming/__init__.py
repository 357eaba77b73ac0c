"""Structured Streaming operators (SURVEY.md §2 B50–B57)."""
