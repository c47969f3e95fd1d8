from feature_store_spark.ml.pipeline import (  # noqa: F401
    risk_model_pipeline,
    risk_training_frame,
    score_risk,
)
