"""Model-based document quality filtering — the classifier step of a
pretraining corpus pipeline (CCNet, Wenzek et al. 2019; fastText-style
quality filters as used by GPT-3/LLaMA data pipelines, all public):
distill the cheap rule-based gate into a text classifier that
generalizes past the hand thresholds, then score every document with
one narrow MLlib map.

Supervision is the repo's own rule-based ``llm.text.quality_score``
(weak labels — exactly the CCNet setup, where the "reference corpus"
side of the filter is itself rule-selected). Features are hashed
TF-IDF unigrams (HashingTF — stateless murmur3, no vocabulary fit, so
the transform is a pure function usable on any later batch) plus the
four interpretable stats the rules read (token count, punct ratio,
stopword ratio, lexical diversity); the classifier therefore (a)
reproduces the rules where they are confident and (b) carries token
-level signal the rules cannot see.

Scale posture: HashingTF/IDF/LR-scoring are narrow per-row maps — no
shuffle; the only wide steps are IDF's one document-frequency
aggregate and LBFGS's tree-aggregated gradient passes over the cached
training frame. The fitted model is a broadcastable closure; scoring
a 100 TB corpus is one map over (doc_id, text).

Determinism: HashingTF is seed-free murmur3, IDF is a deterministic
aggregate, LBFGS with fixed maxIter/regParam on a fixed frame
converges to the same model — so the driver's tolerance band
(accuracy vs the weak labels >= threshold as a boolean the oracle can
reproduce structurally) is stable, the same contract as
``ml_risk_scores``. No SQL oracle for the optimizer itself.
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import LogisticRegression
from pyspark.ml.feature import (
    HashingTF,
    IDF,
    RegexTokenizer,
    VectorAssembler,
)
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from feature_store_spark.llm.text import TOKEN_RE, quality_score, text_stats

STATS_COLS = [
    "n_tokens",
    "punct_ratio",
    "stopword_ratio",
    "lexical_diversity",
]


def quality_training_frame(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, text, stats..., label): label 1.0 iff EVERY quality rule
    passes (``quality_score == 1.0`` — the rule gate this classifier
    distills). Stats NULLs (empty/NULL text) zero-fill, same as the
    risk frame's COALESCE convention."""
    labels = quality_score(docs, id_col, text_col).select(
        id_col, (F.col("quality_score") >= 1.0).cast("double").alias("label")
    )
    stats = text_stats(docs, id_col, text_col).select(
        id_col,
        *(
            F.coalesce(F.col(c).cast("double"), F.lit(0.0)).alias(c)
            for c in STATS_COLS
        ),
    )
    return (
        docs.select(id_col, F.coalesce(F.col(text_col), F.lit("")).alias("text"))
        .join(stats, id_col)
        .join(labels, id_col)
    )


def text_quality_pipeline(num_features: int = 1 << 12) -> Pipeline:
    tok = RegexTokenizer(
        inputCol="text",
        outputCol="toks",
        pattern=TOKEN_RE,
        gaps=False,
        toLowercase=True,
    )
    tf = HashingTF(
        inputCol="toks", outputCol="tf", numFeatures=num_features
    )
    idf = IDF(inputCol="tf", outputCol="tfidf")
    asm = VectorAssembler(
        inputCols=["tfidf", *STATS_COLS], outputCol="features"
    )
    lr = LogisticRegression(
        featuresCol="features",
        labelCol="label",
        maxIter=30,
        regParam=0.001,
        standardization=True,
    )
    return Pipeline(stages=[tok, tf, idf, asm, lr])


def _strip_training_summary(model: PipelineModel) -> None:
    """Drop the fitted LR stage's trainingSummary before transform:
    the summary pins the TRAINING DataFrame and therefore the
    SparkSession, and Spark 4.1's ``observationManager`` is not
    serializable once any ``Observation`` has run on the session
    (`pipelines/sinks.py` uses one per upsert/export) — so an unstripped
    ``model.transform`` closure dies with Task-not-serializable in any
    process that mixed sinks and scoring. Same trap `ml/pipeline.py`
    documents; there the model is folded into the plan as literals,
    here the 4096-dim hashed-TF stage makes the summary strip the
    practical form. A save/load roundtrip would also shed the summary
    at the cost of a tmp dir.

    The strip mutates the fitted model (the summary is gone for every
    later caller — deliberate: the stale summary is exactly what must
    not ride into task closures), and it sets scala ``Option.empty``,
    not null, so ``hasSummary`` afterwards is a clean ``False`` rather
    than an NPE."""
    lr = model.stages[-1]
    try:
        from pyspark import SparkContext

        empty = SparkContext._active_spark_context._jvm.scala.Option.empty()
        lr._java_obj.setSummary(empty)
    except Exception:
        # private API moved — scoring still works in sessions that
        # never ran an Observation; the plan-literal path (see
        # ml/pipeline.py) is the fallback shape if this ever breaks
        pass


def score_text_quality(
    model: PipelineModel, frame: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """(id, quality_prob, quality_flag) for every document in a frame
    built by :func:`quality_training_frame` (minus the label use).
    ``quality_prob`` is P(label=1) rounded to 6 digits; the flag is
    the 0.5-threshold decision."""
    from pyspark.ml.functions import vector_to_array

    _strip_training_summary(model)

    p1 = F.element_at(vector_to_array(F.col("probability")), 2).cast(
        "double"
    )
    scored = model.transform(frame)
    return scored.select(
        id_col,
        F.round(p1, 6).alias("quality_prob"),
        (F.col("prediction") >= 1.0).alias("quality_flag"),
    )
