"""Scalar function families + UDF surface (SURVEY.md §2 B42–B49, B58–B61)."""

import random_forest_using_hadoop_spark.functions.scalar  # noqa: F401
import random_forest_using_hadoop_spark.functions.collections  # noqa: F401
import random_forest_using_hadoop_spark.functions.udfs  # noqa: F401
