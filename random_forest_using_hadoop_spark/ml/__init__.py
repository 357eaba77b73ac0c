"""Tier A — the reference's random-forest ML surface on Spark MLlib."""
