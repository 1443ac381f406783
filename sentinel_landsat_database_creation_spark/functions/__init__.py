"""Column-expression builders — native pyspark.sql.functions only, no UDFs."""
