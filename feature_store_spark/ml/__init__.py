from feature_store_spark.ml.pipeline import (  # noqa: F401
    risk_model_pipeline,
    risk_training_frame,
    score_risk,
)
from feature_store_spark.ml.text_quality import (  # noqa: F401
    quality_training_frame,
    score_text_quality,
    text_quality_pipeline,
)
