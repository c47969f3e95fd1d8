"""feature_store_spark — a PySpark-native feature/analytics engine.

Brand-new implementation (Spark DataFrame/SQL + Structured Streaming)
of the query and data-processing capabilities of the
`1samahoseini/feature-store` reference (see SURVEY.md), plus
LLM-data-pipeline operators (dedup, similarity search, text analysis)
designed for 100 TB scale.
"""

__version__ = "0.1.0"
