"""Distributed multinomial Naive Bayes — a trainable text classifier
whose training IS a pair of count aggregations, so it scales like a
word-count and stays fully oracle-checkable (every statistic is SQL).

This is the quality/domain-classifier shape of an LLM-data pipeline
(fastText-style filtering a la CCNet/phi: label a seed set, train a
cheap linear-ish model, score the whole corpus).  A multinomial NB over
unigram counts is the count-based member of that family: the model is
``P(class)`` and add-one-smoothed ``P(token | class)``, both plain
aggregates over the labeled split.

Scale shape:

* **train** = one explode + ``groupBy(label, tok)`` count, plus a
  per-label total and the vocabulary size — shuffles keyed on (label,
  token), map-side partial aggregation, no driver materialization;
* the **model** is a DataFrame ``(label, tok, logp)`` — vocab x classes
  rows.  It joins to scoring tokens **on `tok`** (a standard shuffled
  equi-join; broadcastable when the vocabulary is small).  Per-class
  scalars (prior, OOV floor) ride a tiny broadcast dimension;
* **score** = per-doc token counts joined to the model, one
  ``groupBy(doc, label)`` sum, and an argmax via a per-doc window —
  ranks are computed on scores rounded to 6 decimals so the argmax is
  engine-portable (log-prob magnitudes are O(1e3); doubles carry ~1e-13
  absolute error there, far under the rounding grain).

No UDFs anywhere.  Extension surface — the reference has no model
training; cite: quality-filter stage of pretraining pipelines
(C4/CCNet-style), re-expressed as Spark aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import text as TX


def _doc_tokens(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-doc lowercased token counts: ``(doc_id, tok, cnt)``."""
    return (df.select(F.col(id_col).alias("doc_id"),
                      F.explode(F.transform(
                          TX.tokens(text_col),
                          lambda t: F.lower(t))).alias("tok"))
            .groupBy("doc_id", "tok")
            .agg(F.count(F.lit(1)).alias("cnt")))


def nb_train(train: DataFrame, label_col: str, text_col: str = "text",
             id_col: str = "doc_id") -> tuple[DataFrame, DataFrame]:
    """Train multinomial NB with add-one smoothing.

    Returns ``(model, class_stats)``:

    * ``model``: ``(label, tok, logp)`` for every (vocab token, class)
      pair — ``logp = ln((n_tok_in_class + 1) / (n_class_tokens + V))``;
    * ``class_stats``: one row per class — ``(label, log_prior,
      log_oov)`` where ``log_oov`` is the smoothed floor an
      out-of-vocabulary token scores in that class.

    The complete vocab x class cross matters: a vocab token UNSEEN in
    some class must contribute that class's smoothing floor, not drop
    out of the sum.
    """
    toks = (train.select(F.col(label_col).alias("label"),
                         F.explode(F.transform(
                             TX.tokens(text_col),
                             lambda t: F.lower(t))).alias("tok")))
    tok_counts = toks.groupBy("label", "tok").agg(
        F.count(F.lit(1)).alias("n_lt"))
    vocab = toks.select("tok").distinct()
    v_size = vocab.agg(F.count(F.lit(1)).alias("v"))
    class_tok = toks.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_l"))
    class_docs = train.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).alias("docs"))
    n_docs = train.agg(F.count(F.lit(1)).alias("n_docs"))
    # Left-join FROM class_docs so a label whose training docs all
    # tokenize to zero tokens keeps its prior (n_l = 0, log_oov =
    # ln(1/V)) instead of silently vanishing from the model.
    class_stats = (class_docs.join(class_tok, "label", "left")
                   .crossJoin(F.broadcast(v_size))
                   .crossJoin(F.broadcast(n_docs))
                   .select(
                       "label",
                       F.log(F.col("docs") / F.col("n_docs"))
                       .alias("log_prior"),
                       F.log(F.lit(1.0)
                             / (F.coalesce(F.col("n_l"), F.lit(0))
                                + F.col("v")))
                       .alias("log_oov"),
                       (F.coalesce(F.col("n_l"), F.lit(0))
                        + F.col("v")).alias("denom")))
    # vocab x classes (classes ride broadcast), left-join observed counts
    model = (vocab.crossJoin(F.broadcast(
                 class_stats.select("label", "denom")))
             .join(tok_counts, ["label", "tok"], "left")
             .select("label", "tok",
                     F.log((F.coalesce(F.col("n_lt"), F.lit(0)) + 1)
                           / F.col("denom")).alias("logp")))
    return model, class_stats.drop("denom")


def nb_score(docs: DataFrame, model: DataFrame, class_stats: DataFrame,
             text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Score *docs* against a trained model: ``(doc_id, pred_label,
    score)`` — argmax over per-class log-posteriors, scores rounded to
    6 decimals before the argmax, ties broken by label ascending.

    Out-of-vocabulary tokens (absent from EVERY class — vocab tokens are
    complete per class by construction) contribute the per-class
    ``log_oov`` floor; empty docs fall back to the prior argmax.
    """
    toks = _doc_tokens(docs, text_col, id_col)
    known = (toks.join(model, "tok")
             .groupBy("doc_id", "label")
             .agg(F.sum(F.col("cnt") * F.col("logp")).alias("known_sum"),
                  F.sum("cnt").alias("known_cnt")))
    doc_len = toks.groupBy("doc_id").agg(F.sum("cnt").alias("n_tok"))
    # every doc x class frame, even for docs with zero in-vocab tokens
    base = (docs.select(F.col(id_col).alias("doc_id"))
            .crossJoin(F.broadcast(class_stats)))
    scored = (base
              .join(doc_len, "doc_id", "left")
              .join(known, ["doc_id", "label"], "left")
              .select(
                  "doc_id", "label",
                  F.round(
                      F.col("log_prior")
                      + F.coalesce(F.col("known_sum"), F.lit(0.0))
                      + (F.coalesce(F.col("n_tok"), F.lit(0))
                         - F.coalesce(F.col("known_cnt"), F.lit(0)))
                      * F.col("log_oov"),
                      6).alias("score")))
    from pyspark.sql import Window
    rn = F.row_number().over(
        Window.partitionBy("doc_id")
        .orderBy(F.desc("score"), F.col("label")))
    return (scored.withColumn("__rn", rn).where(F.col("__rn") == 1)
            .select("doc_id", F.col("label").alias("pred_label"), "score"))


def write_nb_model(model: DataFrame, class_stats: DataFrame,
                   path: str) -> None:
    """Persist a trained model (the frozen-classifier deployment shape:
    train once on the labeled seed set, score every future ingest batch
    without touching the training data again)."""
    model.write.mode("overwrite").parquet(f"{path}/model")
    class_stats.coalesce(1).write.mode("overwrite").parquet(
        f"{path}/class_stats")


def read_nb_model(spark, path: str) -> tuple[DataFrame, DataFrame]:
    return (spark.read.parquet(f"{path}/model"),
            spark.read.parquet(f"{path}/class_stats"))


def nb_model_wide(model: DataFrame,
                  class_stats: DataFrame) -> tuple[DataFrame, list]:
    """Pivot the model to one row per token with per-class log-prob
    COLUMNS: ``(tok, <label1>, <label2>, ...)`` plus the collected
    class-stats rows (label, log_prior, log_oov — a few rows, driver-
    sized by definition).

    This is the STREAMING-scorable layout: per-token class scores become
    a single stream-static broadcast join plus ONE stateful aggregation
    (chained stream aggs are unsupported), with the argmax folded into a
    stateless projection."""
    stats_rows = sorted(class_stats.collect(), key=lambda r: r.label)
    labels = [r.label for r in stats_rows]
    wide = (model.groupBy("tok").pivot("label", labels)
            .agg(F.first("logp")))
    return wide, stats_rows


def nb_confusion(docs: DataFrame, model: DataFrame,
                 class_stats: DataFrame, label_col: str,
                 text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Confusion matrix of NB predictions on a labeled eval split:
    ``(label, pred_label, docs)``."""
    preds = nb_score(docs, model, class_stats, text_col, id_col)
    truth = docs.select(F.col(id_col).alias("doc_id"),
                        F.col(label_col).alias("label"))
    return (truth.join(preds, "doc_id")
            .groupBy("label", "pred_label")
            .agg(F.count(F.lit(1)).alias("docs")))
