"""MLlib pipeline over the derived feature tables (the BASELINE.json
approach line: "MLlib pipelines + DataFrame transformations").

The reference stores a precomputed ``risk_score`` and serves it
(`sql/postgresql_schema.sql:43`, `src/pipelines/feature_pipeline.py:251-266`);
this module closes the loop the reference leaves implicit: train a
model ON the offline feature store and score entities with it, as one
``pyspark.ml.Pipeline`` (assemble → scale → logistic regression).

Scale posture: training input is the fused serving frame (one scan per
fact table, see ``pipelines/features.py::serving_features``); MLlib's
LogisticRegression aggregates gradients tree-wise per partition, so
the fit is one cached pass over (#features + 1)-wide vectors per row.
Scoring is a narrow map — no shuffle — and the fitted model is a
broadcastable closure.

Determinism: fixed seed-free deterministic solvers (LBFGS), fixed
maxIter, and a label derived from the data itself (declined activity),
so repeated runs on the same fixtures converge to the same model; the
driver's rows-only check pins row count + schema (float coefficients
are not hash-compared across engines — there is no SQL oracle for an
iterative optimizer).
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import LogisticRegression
from pyspark.ml.feature import StandardScaler, VectorAssembler
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_COLS = [
    "total_orders",
    "avg_order_value",
    "total_transactions_30d",
    "total_amount_30d",
    "transactions_declined_30d",
    "payment_delays_90d",
    "failed_payments_count",
    "velocity_alerts_30d",
]


def risk_training_frame(serving: DataFrame) -> DataFrame:
    """Label + dense features from the serving join output. Label:
    the user had declined or delayed payment activity (the event the
    reference's risk pipeline exists to predict). NULL feature slots
    (inactive users) are zero-filled — the same semantics their
    COALESCE defaults give the batch pipeline."""
    label = (
        (F.coalesce(F.col("transactions_declined_30d"), F.lit(0)) > 0)
        | (F.coalesce(F.col("payment_delays_90d"), F.lit(0)) > 0)
        | (F.coalesce(F.col("failed_payments_count"), F.lit(0)) > 0)
    )
    cols = [
        F.coalesce(F.col(c).cast("double"), F.lit(0.0)).alias(c)
        for c in FEATURE_COLS
    ]
    return serving.select(
        "user_id", *cols, label.cast("double").alias("label")
    )


def risk_model_pipeline() -> Pipeline:
    assembler = VectorAssembler(
        inputCols=FEATURE_COLS, outputCol="raw_features"
    )
    scaler = StandardScaler(
        inputCol="raw_features", outputCol="features", withMean=False
    )
    lr = LogisticRegression(
        featuresCol="features",
        labelCol="label",
        maxIter=25,
        regParam=0.01,
        standardization=False,
    )
    return Pipeline(stages=[assembler, scaler, lr])


def score_risk(model: PipelineModel, frame: DataFrame) -> DataFrame:
    """Score a (possibly unlabeled) feature frame: (user_id,
    risk_probability, risk_flag).

    Scoring folds the fitted model INTO the plan as literal
    constants: effective weight ``coef_i / std_i`` per feature (the
    StandardScaler is withMean=False, so scaling is a per-column
    divide; std==0 columns scale to 0 exactly like
    ``StandardScalerModel``), then a sigmoid over the linear term —
    all whole-stage-codegen column math. Compared to
    ``model.transform`` this avoids the assemble→scale→predict ScalaUDF
    chain entirely: no per-row vector objects, and no model closure in
    the task binary (``LogisticRegressionModel.trainingSummary`` pins a
    SparkSession, whose ``observationManager`` is not serializable in
    Spark 4.1 once any ``Observation`` has been used on the session).
    """
    scaler = model.stages[1]
    lr = model.stages[2]
    coef = lr.coefficients.toArray()
    std = scaler.std.toArray()
    weights = [
        (c / s if s != 0.0 else 0.0) for c, s in zip(coef, std)
    ]
    z = F.lit(float(lr.intercept))
    for col, w in zip(FEATURE_COLS, weights):
        # same zero-fill as risk_training_frame: a raw serving frame
        # carries NULL slots for inactive users, and NULL would
        # propagate into a NULL probability (silent train/serve skew)
        z = z + F.coalesce(F.col(col).cast("double"), F.lit(0.0)) * F.lit(
            float(w)
        )
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    threshold = lr.getThreshold()
    return frame.select(
        "user_id",
        F.round(prob, 6).alias("risk_probability"),
        (prob > F.lit(float(threshold))).cast("int").alias("risk_flag"),
    )
