"""Tier B relational + Tier C pipeline operators (SURVEY.md §2).

Importing this package imports every operator module, which populates
the central registry as a side effect.
"""

import random_forest_using_hadoop_spark.operators.scans  # noqa: F401
import random_forest_using_hadoop_spark.operators.filters  # noqa: F401
import random_forest_using_hadoop_spark.operators.joins  # noqa: F401
import random_forest_using_hadoop_spark.operators.aggregates  # noqa: F401
import random_forest_using_hadoop_spark.operators.windows  # noqa: F401
import random_forest_using_hadoop_spark.operators.setops  # noqa: F401
import random_forest_using_hadoop_spark.operators.text  # noqa: F401
import random_forest_using_hadoop_spark.operators.similarity  # noqa: F401
import random_forest_using_hadoop_spark.operators.dedup_lsh  # noqa: F401
import random_forest_using_hadoop_spark.operators.text_features  # noqa: F401
import random_forest_using_hadoop_spark.operators.multimodal  # noqa: F401
import random_forest_using_hadoop_spark.operators.relational_ext  # noqa: F401
import random_forest_using_hadoop_spark.operators.pipelines  # noqa: F401
import random_forest_using_hadoop_spark.operators.scale_ext  # noqa: F401
import random_forest_using_hadoop_spark.operators.scale_ext2  # noqa: F401
import random_forest_using_hadoop_spark.operators.mining_ext  # noqa: F401
import random_forest_using_hadoop_spark.operators.tpch_ext  # noqa: F401
import random_forest_using_hadoop_spark.operators.tpch_ext3  # noqa: F401
import random_forest_using_hadoop_spark.operators.llm_pipeline  # noqa: F401
import random_forest_using_hadoop_spark.operators.sessions_fuzzy  # noqa: F401
import random_forest_using_hadoop_spark.operators.iterative  # noqa: F401
import random_forest_using_hadoop_spark.operators.analytics_r5  # noqa: F401
import random_forest_using_hadoop_spark.operators.analytics_r5b  # noqa: F401
import random_forest_using_hadoop_spark.operators.sketches  # noqa: F401
import random_forest_using_hadoop_spark.operators.analytics_r7  # noqa: F401
import random_forest_using_hadoop_spark.operators.analytics_r8  # noqa: F401
import random_forest_using_hadoop_spark.operators.delta_ext  # noqa: F401
import random_forest_using_hadoop_spark.operators.iceberg_ext  # noqa: F401
import random_forest_using_hadoop_spark.operators.lake_r14  # noqa: F401
import random_forest_using_hadoop_spark.operators.lake_r15  # noqa: F401
import random_forest_using_hadoop_spark.operators.lake_r15b  # noqa: F401
import random_forest_using_hadoop_spark.operators.llm_r15b  # noqa: F401
import random_forest_using_hadoop_spark.operators.hudi  # noqa: F401
import random_forest_using_hadoop_spark.operators.sql4  # noqa: F401
import random_forest_using_hadoop_spark.operators.analytics_r15c  # noqa: F401
import random_forest_using_hadoop_spark.operators.sim_r15c  # noqa: F401
import random_forest_using_hadoop_spark.operators.lake_r15c  # noqa: F401
import random_forest_using_hadoop_spark.operators.llm_r15c  # noqa: F401
