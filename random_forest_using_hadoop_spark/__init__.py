"""PySpark-native analytics engine with the capabilities of the reference
``rohaningale/Random-forest-using-Hadoop`` (a Hadoop MapReduce random-forest
classifier), rebuilt Spark-first per SURVEY.md.

The reference checkout at /root/reference/ is empty (SURVEY.md §0), so the
capability contract is SURVEY.md §2's three-tier inventory:

- Tier A: the reference's ML surface (feature assembly, seeded split,
  bagging, RF train/predict/evaluate/persist) → Spark MLlib.
- Tier B: the relational + streaming query surface (scans, joins, aggs,
  windows, set ops, scalar functions, Structured Streaming).
- Tier C: LLM-data-pipeline extensions (dedup, similarity search,
  multimodal columns, text analysis).

Every operator registers itself in :mod:`.registry` as a
``(spark_fn, oracle_sql)`` pair; ``__spark_entry__.py``, the pytest
suite, and ``bench.py`` all consume that single registry.
"""

from random_forest_using_hadoop_spark.registry import REGISTRY, register
from random_forest_using_hadoop_spark.session import (
    cached_block_count,
    release_caches,
)

__all__ = [
    "REGISTRY",
    "register",
    "load_all",
    "release_caches",
    "cached_block_count",
]


def load_all() -> None:
    """Import every operator module so all registrations run."""
    # Imports are for side effects (registry population).
    import random_forest_using_hadoop_spark.operators  # noqa: F401
    import random_forest_using_hadoop_spark.functions  # noqa: F401
    import random_forest_using_hadoop_spark.ml  # noqa: F401
    import random_forest_using_hadoop_spark.streaming  # noqa: F401
