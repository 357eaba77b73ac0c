"""Tier A — the reference's random-forest ML surface on Spark MLlib."""

import random_forest_using_hadoop_spark.ml.forest  # noqa: F401
import random_forest_using_hadoop_spark.ml.boost  # noqa: F401
