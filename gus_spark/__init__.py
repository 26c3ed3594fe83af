"""gus_spark — a PySpark-native analytics engine with the API contract of
qwerdenkerXD/gus (schema-driven model registry, typed validation, CRUD,
projection, introspection) completed to a full relational + ML-data-pipeline
surface (scans, joins, aggregation, windows, dedup, similarity search, text
analysis, streaming).

Reference: /root/reference (gus v0.1.0, Rust). This package is a from-scratch
Spark-first design, not a port: logical plans are declared via the DataFrame /
Spark SQL API and optimized by Catalyst; Python-side code is confined to the
validation layer and Arrow-vectorized Pandas UDFs where Spark lacks a builtin.
"""

__version__ = "0.1.0"

from gus_spark.session import get_spark  # noqa: F401
