from random_forest_using_hadoop_spark.sources.io import load_table, TABLES

__all__ = ["load_table", "TABLES"]
