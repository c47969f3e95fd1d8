"""Serving layer (SURVEY.md §2.10)."""

from feature_store_spark.serving.store import (  # noqa: F401
    FeatureResponse,
    FeatureStore,
)
