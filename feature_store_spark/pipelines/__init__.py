from feature_store_spark.pipelines.features import (
    derive_risk_features,
    derive_transaction_features,
    derive_user_features,
    serving_join,
)

__all__ = [
    "derive_user_features",
    "derive_transaction_features",
    "derive_risk_features",
    "serving_join",
]
