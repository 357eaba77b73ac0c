"""Scalar function families + UDF surface (SURVEY.md §2 B42–B49, B58–B61)."""
