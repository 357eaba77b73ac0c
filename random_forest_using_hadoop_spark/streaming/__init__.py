"""Structured Streaming operators (SURVEY.md §2 B50–B57)."""

import random_forest_using_hadoop_spark.streaming.ops  # noqa: F401
