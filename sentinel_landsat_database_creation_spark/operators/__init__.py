"""Operator inventory of SURVEY.md §2, re-expressed Spark-first."""
