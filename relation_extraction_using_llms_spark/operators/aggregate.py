"""Cross-document aggregation, comparison and ranking (SURVEY.md §2.11).

Reference semantics: pipeline/aggregation/aggregator.py (A1-A6),
comparator.py (A7), model_ranker.py (A8), strategy_comparison.py (A9),
main.py:1197-1294 (A10).  One groupBy per grain; everything map-side
combinable except the exact median (percentile over per-doc scores, small
groups).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .metrics import COMBO

AGG_KEY = [*COMBO, "strategy", "with_types"]


def _safe_div(num, den):
    return F.when(den > 0, num / den).otherwise(F.lit(0.0))


def exclude_failed_docs(per_doc: DataFrame) -> DataFrame:
    """A1 (aggregator.py:46-91): drop documents with zero predictions but
    non-zero gold — an API-failure heuristic, not a model miss.
    Counts use matched grain: predicted = tp+fp, gold = tp+fn."""
    return per_doc.where(
        ~((F.col("tp") + F.col("fp") == 0) & (F.col("tp") + F.col("fn") > 0))
    )


def aggregate_results(per_doc: DataFrame, exclude_failed: bool = True) -> DataFrame:
    """A2-A6: one row per (technique, model, strategy, with_types)."""
    df = exclude_failed_docs(per_doc) if exclude_failed else per_doc

    total_tp, total_fp, total_fn = F.sum("tp"), F.sum("fp"), F.sum("fn")
    total_gold = total_tp + total_fn
    total_pred = total_tp + total_fp
    micro_p = _safe_div(total_tp, total_tp + total_fp)
    micro_r = _safe_div(total_tp, total_tp + total_fn)
    total_sem = F.sum("n_semantic")
    # Fuzzy micro uses *partial* matches (aggregator.py:137-148).
    fz_tp = total_tp + F.sum("n_partial")
    fz_fp = total_fp - F.sum("n_partial")
    fz_p = _safe_div(fz_tp, fz_tp + fz_fp)
    fz_r = _safe_div(fz_tp, fz_tp + total_fn)

    return (
        df.groupBy(*AGG_KEY).agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.avg("precision").alias("macro_precision"),
            F.avg("recall").alias("macro_recall"),
            F.avg("f1_score").alias("macro_f1"),
            total_tp.alias("total_tp"),
            total_fp.alias("total_fp"),
            total_fn.alias("total_fn"),
            total_gold.alias("total_gold"),
            total_pred.alias("total_predicted"),
            micro_p.alias("micro_precision"),
            micro_r.alias("micro_recall"),
            _safe_div(2 * micro_p * micro_r, micro_p + micro_r).alias("micro_f1"),
            _safe_div(total_tp, total_gold).alias("overall_exact_match_rate"),
            _safe_div(total_fn, total_gold).alias("overall_omission_rate"),
            _safe_div(total_fp, total_pred).alias("overall_hallucination_rate"),
            F.avg("exact_match_rate").alias("avg_exact_match_rate"),
            F.avg("omission_rate").alias("avg_omission_rate"),
            F.avg("hallucination_rate").alias("avg_hallucination_rate"),
            F.avg("redundancy_rate").alias("avg_redundancy_rate"),
            F.avg("graph_edit_distance").alias("avg_graph_edit_distance"),
            F.sum("graph_edit_distance").alias("total_graph_edit_distance"),
            _safe_div(F.sum("graph_edit_distance"), total_gold).alias(
                "normalized_graph_edit_distance"
            ),
            F.avg("bertscore").alias("avg_bertscore"),
            F.sum("n_partial").alias("total_partial_matches"),
            F.avg("fuzzy_precision").alias("fuzzy_macro_precision"),
            F.avg("fuzzy_recall").alias("fuzzy_macro_recall"),
            F.avg("fuzzy_f1").alias("fuzzy_macro_f1"),
            fz_p.alias("fuzzy_micro_precision"),
            fz_r.alias("fuzzy_micro_recall"),
            _safe_div(2 * fz_p * fz_r, fz_p + fz_r).alias("fuzzy_micro_f1"),
            total_sem.alias("total_semantic_matches"),
            # A5 spread statistics (aggregator.py:150-172)
            F.coalesce(F.stddev_samp("f1_score"), F.lit(0.0)).alias("f1_std"),
            F.expr("percentile(f1_score, 0.5)").alias("f1_median"),
            F.min("f1_score").alias("f1_min"),
            F.max("f1_score").alias("f1_max"),
            F.coalesce(F.stddev_samp("precision"), F.lit(0.0)).alias("precision_std"),
            F.expr("percentile(precision, 0.5)").alias("precision_median"),
            F.min("precision").alias("precision_min"),
            F.max("precision").alias("precision_max"),
            F.coalesce(F.stddev_samp("recall"), F.lit(0.0)).alias("recall_std"),
            F.expr("percentile(recall, 0.5)").alias("recall_median"),
            F.min("recall").alias("recall_min"),
            F.max("recall").alias("recall_max"),
        )
    )


def technique_rankings(agg: DataFrame, metrics: list[str] | None = None) -> DataFrame:
    """A7 (comparator.py:68-142): rank combos per metric within
    (strategy, with_types)."""
    metrics = metrics or [
        "macro_f1",
        "micro_f1",
        "macro_precision",
        "macro_recall",
        "fuzzy_macro_f1",
        "avg_omission_rate",
        "avg_hallucination_rate",
    ]
    frames = []
    for m in metrics:
        asc = m in ("avg_omission_rate", "avg_hallucination_rate")
        order = F.col(m).asc() if asc else F.col(m).desc()
        w = Window.partitionBy("strategy", "with_types").orderBy(
            order, F.col("technique"), F.col("model")
        )
        frames.append(
            agg.select(
                "strategy",
                "with_types",
                "technique",
                "model",
                F.lit(m).alias("metric"),
                F.col(m).alias("value"),
                F.row_number().over(w).alias("rank"),
            )
        )
    out = frames[0]
    for fdf in frames[1:]:
        out = out.unionByName(fdf)
    return out


def model_ranking(agg: DataFrame) -> DataFrame:
    """A8 (model_ranker.py:161-289): composite score per model, averaged
    over techniques:
      0.40*F1 + 0.20*fuzzyF1 + 0.15*P + 0.15*R
      + 0.10*(0.6*(1-omission) + 0.4*(1-hallucination))
    """
    per_model = agg.groupBy("strategy", "with_types", "model").agg(
        F.avg("macro_f1").alias("avg_f1"),
        F.avg("fuzzy_macro_f1").alias("avg_fuzzy_f1"),
        F.avg("macro_precision").alias("avg_precision"),
        F.avg("macro_recall").alias("avg_recall"),
        F.avg("avg_omission_rate").alias("avg_omission"),
        F.avg("avg_hallucination_rate").alias("avg_hallucination"),
        F.count(F.lit(1)).alias("n_techniques"),
    )
    quality = 0.6 * (1 - F.col("avg_omission")) + 0.4 * (1 - F.col("avg_hallucination"))
    score = (
        0.40 * F.col("avg_f1")
        + 0.20 * F.col("avg_fuzzy_f1")
        + 0.15 * F.col("avg_precision")
        + 0.15 * F.col("avg_recall")
        + 0.10 * quality
    )
    w = Window.partitionBy("strategy", "with_types").orderBy(
        F.col("composite_score").desc(), F.col("model")
    )
    return per_model.withColumn("composite_score", score).withColumn(
        "rank", F.row_number().over(w)
    )


def strategy_summary(agg: DataFrame) -> DataFrame:
    """A9 (strategy_comparison.py:11-170): per-strategy avg/best/worst
    macro-F1 across combos."""
    return agg.groupBy("strategy", "with_types").agg(
        F.avg("macro_f1").alias("avg_f1"),
        F.max("macro_f1").alias("best_f1"),
        F.min("macro_f1").alias("worst_f1"),
        F.max_by(F.concat_ws("/", "technique", "model"), "macro_f1").alias("best_combo"),
        F.count(F.lit(1)).alias("n_combos"),
    )


def best_configuration(agg: DataFrame) -> DataFrame:
    """A10 (main.py:1197-1294): argmax combo by macro_f1 per
    (strategy, with_types)."""
    w = Window.partitionBy("strategy", "with_types").orderBy(
        F.col("macro_f1").desc(), F.col("technique"), F.col("model")
    )
    return (
        agg.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )


def eval_cube(per_doc: DataFrame) -> DataFrame:
    """Every summary granularity of the reference's hand-rolled 3-D
    reporting loops (main.py:299-627 iterates strategy x with_types x
    combo in separate passes; SURVEY §2.13 flags it as a cube) in ONE
    ``cube()`` aggregation: per-(technique, model, strategy, with_types)
    rows plus every marginal — per-strategy, per-model, grand total —
    from a single shuffle with map-side partial aggregation.

    ``gid`` is ``grouping_id()`` (bit i set = dimension i aggregated
    out), disambiguating a NULL dimension value from a rolled-up one.
    Counts are map-side-combinable sums; macro_f1 is the mean of per-doc
    f1 over the rows in each cell.
    """
    return (
        per_doc.cube("technique", "model", "strategy", "with_types")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("tp").cast("long").alias("total_tp"),
            F.sum("fp").cast("long").alias("total_fp"),
            F.sum("fn").cast("long").alias("total_fn"),
            F.round(F.avg("f1_score"), 6).alias("macro_f1"),
        )
    )
