"""Tier B relational + Tier C pipeline operators (SURVEY.md §2).

Importing this package imports every operator module, which populates
the central registry as a side effect.
"""

import random_forest_using_hadoop_spark.operators.aggregates  # noqa: F401
