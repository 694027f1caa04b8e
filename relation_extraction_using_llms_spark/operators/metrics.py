"""Per-document evaluation metrics (SURVEY.md §2.10, Q1-Q12).

All formulas from pipeline/evaluation/metrics.py and evaluator.py:243-267,
expressed as built-in column expressions over the match-counts table —
whole-stage-codegen territory, no Python.  Redundancy (Q5) and graph edit
distance (Q6) need the triples themselves and are separate aggregations
joined back on (url, combo).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

COMBO = ["technique", "model"]
EVAL_KEY = ["url", *COMBO, "strategy", "with_types"]


def _safe_div(num, den):
    return F.when(den > 0, num / den).otherwise(F.lit(0.0))


def per_doc_metrics(counts_df: DataFrame) -> DataFrame:
    """counts -> P/R/F1, exact-match/omission/hallucination rates, fuzzy
    P/R/F1 (Q1-Q4, Q8-Q10).

    Fuzzy metrics treat every semantic match as correct (evaluator.py:
    252-261: fuzzy_tp = tp + partials + high-semantic = tp + n_semantic).
    ``bertscore`` = mean semantic-match score (evaluator.py:263-267).
    """
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    n_gold, n_pred = F.col("n_gold"), F.col("n_pred")
    precision = _safe_div(tp, tp + fp)
    recall = _safe_div(tp, tp + fn)
    f1 = _safe_div(2 * precision * recall, precision + recall)
    fuzzy_tp = tp + F.col("n_semantic")
    fuzzy_fp = fp - F.col("n_semantic")
    fuzzy_p = _safe_div(fuzzy_tp, fuzzy_tp + fuzzy_fp)
    fuzzy_r = _safe_div(fuzzy_tp, fuzzy_tp + fn)
    return counts_df.select(
        *EVAL_KEY,
        "tp",
        "fp",
        "fn",
        "n_semantic",
        "n_partial",
        "n_gold",
        "n_pred",
        precision.alias("precision"),
        recall.alias("recall"),
        f1.alias("f1_score"),
        _safe_div(tp, n_gold).alias("exact_match_rate"),
        _safe_div(fn, n_gold).alias("omission_rate"),
        _safe_div(fp, n_pred).alias("hallucination_rate"),
        fuzzy_p.alias("fuzzy_precision"),
        fuzzy_r.alias("fuzzy_recall"),
        _safe_div(2 * fuzzy_p * fuzzy_r, fuzzy_p + fuzzy_r).alias("fuzzy_f1"),
        _safe_div(F.col("semantic_sum"), F.col("n_semantic")).alias("bertscore"),
    )


def redundancy_rate(pred_df: DataFrame) -> DataFrame:
    """Q5 (metrics.py:76-105): duplicates over (head_id, tail_id, type),
    counting the reverse direction as a duplicate; predictions lacking ids
    are skipped but stay in the denominator."""
    keyed = pred_df.withColumn(
        "pair_key",
        F.when(
            F.col("head_id").isNotNull() & F.col("tail_id").isNotNull(),
            F.concat_ws(
                "",
                F.least("head_id", "tail_id"),
                F.greatest("head_id", "tail_id"),
                F.col("relation_type"),
            ),
        ),
    )
    per_key = keyed.groupBy("url", *COMBO, "pair_key").agg(
        F.count(F.lit(1)).alias("k")
    )
    return per_key.groupBy("url", *COMBO).agg(
        _safe_div(
            F.sum(F.when(F.col("pair_key").isNotNull(), F.col("k") - 1).otherwise(0)),
            F.sum("k"),
        ).alias("redundancy_rate")
    )


def graph_edit_distance(pred_df: DataFrame, gold_rel_df: DataFrame) -> DataFrame:
    """Q6 (metrics.py:107-160): |pred_nodes ⊕ gold_nodes| +
    |pred_edges ⊕ gold_edges| on the directed (head -> tail) graphs.
    Pure set algebra via full-outer joins — no graph library.

    Duplicate edges collapse (DiGraph semantics); nodes come from edge
    endpoints of id-resolved predictions only.
    """
    # Set identity |P ⊕ G| = |P| + |G| - 2|P ∩ G| per (url, combo): avoids
    # replicating gold per combo (no crossJoin) and replaces full-outer
    # joins with one inner join + small aggregates — at 8 combos this cut
    # the stage from ~8s to ~2s on the 6x sf0.1 corpus.
    pred_edges = (
        pred_df.where(F.col("head_id").isNotNull() & F.col("tail_id").isNotNull())
        .select("url", *COMBO, "head_id", "tail_id")
        .distinct()
    )
    gold_edges = gold_rel_df.select("url", "head_id", "tail_id").distinct()
    combos = pred_df.select(*COMBO).distinct()

    def nodes(edges, extra):
        return (
            edges.select("url", *extra, F.col("head_id").alias("node"))
            .unionByName(edges.select("url", *extra, F.col("tail_id").alias("node")))
            .distinct()
        )

    pred_nodes = nodes(pred_edges, COMBO)
    gold_nodes = nodes(gold_edges, [])

    def sym_diff(pred, gold, keys):
        n_pred = pred.groupBy("url", *COMBO).agg(F.count(F.lit(1)).alias("n_p"))
        n_gold = gold.groupBy("url").agg(F.count(F.lit(1)).alias("n_g"))
        n_both = (
            pred.join(gold, ["url", *keys])
            .groupBy("url", *COMBO)
            .agg(F.count(F.lit(1)).alias("n_pg"))
        )
        # every (url in gold) x combo must appear even with no predictions
        base = n_gold.crossJoin(F.broadcast(combos))
        return (
            base.join(n_pred, ["url", *COMBO], "full_outer")
            .join(n_both, ["url", *COMBO], "left")
            .select(
                "url",
                *COMBO,
                (
                    F.coalesce("n_p", F.lit(0))
                    + F.coalesce("n_g", F.lit(0))
                    - 2 * F.coalesce("n_pg", F.lit(0))
                ).alias("edits"),
            )
        )

    edge_diff = sym_diff(pred_edges, gold_edges, ["head_id", "tail_id"]).withColumnRenamed(
        "edits", "edge_edits"
    )
    node_diff = sym_diff(pred_nodes, gold_nodes, ["node"]).withColumnRenamed(
        "edits", "node_edits"
    )
    return edge_diff.join(node_diff, ["url", *COMBO], "full_outer").select(
        "url",
        *COMBO,
        (
            F.coalesce("edge_edits", F.lit(0)) + F.coalesce("node_edits", F.lit(0))
        ).cast("double").alias("graph_edit_distance"),
    )


def per_type_metrics(details_df: DataFrame) -> DataFrame:
    """Q7 (metrics.py:162-218): P/R/F1 per relation type from labeled match
    records.  TP/FN types come from the gold relation, FP types from the
    prediction."""
    typed = details_df.select(
        "url",
        *COMBO,
        "strategy",
        "with_types",
        "kind",
        F.when(F.col("kind") == "fp", F.col("pred_type"))
        .otherwise(F.col("gold_type"))
        .alias("rel_type"),
    ).where(F.col("kind").isin("tp", "fp", "fn"))
    agg = typed.groupBy("url", *COMBO, "strategy", "with_types", "rel_type").agg(
        F.sum(F.when(F.col("kind") == "tp", 1).otherwise(0)).alias("tp"),
        F.sum(F.when(F.col("kind") == "fp", 1).otherwise(0)).alias("fp"),
        F.sum(F.when(F.col("kind") == "fn", 1).otherwise(0)).alias("fn"),
    )
    p = _safe_div(F.col("tp"), F.col("tp") + F.col("fp"))
    r = _safe_div(F.col("tp"), F.col("tp") + F.col("fn"))
    return agg.select(
        "url",
        *COMBO,
        "strategy",
        "with_types",
        "rel_type",
        "tp",
        "fp",
        "fn",
        p.alias("precision"),
        r.alias("recall"),
        _safe_div(2 * p * r, p + r).alias("f1_score"),
    )


def eval_per_doc(
    counts_df: DataFrame,
    pred_df: DataFrame | None = None,
    gold_rel_df: DataFrame | None = None,
) -> DataFrame:
    """Full per-document EvaluationResult table: metric expressions over
    counts, plus redundancy + GED joined in when triples are provided."""
    out = per_doc_metrics(counts_df)
    if pred_df is not None:
        out = out.join(redundancy_rate(pred_df), ["url", *COMBO], "left")
        if gold_rel_df is not None:
            out = out.join(
                graph_edit_distance(pred_df, gold_rel_df), ["url", *COMBO], "left"
            )
    for c, default in (("redundancy_rate", 0.0), ("graph_edit_distance", 0.0)):
        if c in out.columns:
            out = out.withColumn(c, F.coalesce(F.col(c), F.lit(default)))
        else:
            out = out.withColumn(c, F.lit(default))
    return out
