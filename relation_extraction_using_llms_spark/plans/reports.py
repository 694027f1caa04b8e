"""Result sinks (SURVEY.md §2.1 S8).

The reference writes per-combo summary JSONs (main.py:398-448), per-doc
detail JSONs (document_exporter.py), comparison reports (comparator.py:
144-191), model rankings (model_ranker.py:128-136) and strategy summaries
(strategy_comparison.py:131-170) as file trees.  Here each is a table write
partitioned by its natural keys — partition pruning replaces directory
globbing when reports are read back.  Chart generation (chart_generator.py,
3.5k LoC of matplotlib) is deliberately out of scope (SURVEY.md §7.4); the
metrics tables are the deliverable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.aggregate import (
    best_configuration,
    model_ranking,
    strategy_summary,
    technique_rankings,
)


def write_run_artifacts(
    run_dir: str,
    eval_per_doc: DataFrame,
    eval_aggregate: DataFrame,
    details: DataFrame | None = None,
    fmt: str = "parquet",
) -> dict[str, str]:
    """Materialize the full report tree for one run; returns name->path."""
    out = {}

    def write(df: DataFrame, name: str, partition_cols: list[str]):
        path = f"{run_dir}/{name}"
        writer = df.write.mode("overwrite")
        if partition_cols:
            writer = writer.partitionBy(*partition_cols)
        getattr(writer, fmt)(path)
        out[name] = path

    write(eval_per_doc, "eval_per_doc", ["strategy", "with_types"])
    write(eval_aggregate, "eval_aggregate", ["strategy"])
    write(technique_rankings(eval_aggregate), "technique_rankings", ["metric"])
    write(model_ranking(eval_aggregate), "model_ranking", [])
    write(strategy_summary(eval_aggregate), "strategy_summary", [])
    write(best_configuration(eval_aggregate), "best_configuration", [])
    if details is not None:
        write(details, "match_details", ["strategy"])
    return out


def predicate_summary(triples_df: DataFrame) -> DataFrame:
    """Per-predicate edge statistics of the final graph — the summary table
    ``write_graph_tables`` materializes next to the edges.  Plain two-level
    aggregate (map-side combinable count + distincts)."""
    from pyspark.sql import functions as F

    return triples_df.groupBy("pred").agg(
        F.count(F.lit(1)).alias("n_edges"),
        F.countDistinct("subj").alias("n_subjects"),
        F.countDistinct("obj").alias("n_objects"),
    )


def write_graph_tables(
    triples_df: DataFrame, path: str, fmt: str = "parquet"
) -> dict[str, str]:
    """Materialize the final knowledge graph (north_star: partitioned graph
    tables): edges partitioned by ``subj_bucket`` so subject-keyed reads
    prune to one bucket, plus a per-predicate edge-count summary.  At a
    warehouse this write targets an Iceberg table bucketed by subj; the
    layout contract (bucket column = pmod(hash(subj), n)) is identical."""
    edges_path = f"{path}/edges"
    getattr(
        triples_df.write.mode("overwrite").partitionBy("subj_bucket"), fmt
    )(edges_path)
    summary_path = f"{path}/predicate_summary"
    getattr(predicate_summary(triples_df).write.mode("overwrite"), fmt)(
        summary_path
    )
    return {"edges": edges_path, "predicate_summary": summary_path}
