from feature_store_spark.functions.scalars import (
    is_night,
    is_weekend,
    safe_ratio,
)

__all__ = ["is_night", "is_weekend", "safe_ratio"]
