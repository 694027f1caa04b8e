#!/usr/bin/env python
"""spark-submit entrypoint for the KG-construction pipeline (north_rule:
"run via spark-submit --py-files on a multi-executor cluster").

Package the library once and submit — no repo checkout needed on the
cluster; the driver and every executor resolve the package from the zip:

    cd <repo> && zip -qr /tmp/kg_pkg.zip relation_extraction_using_llms_spark
    spark-submit --master local[8] \
        --py-files /tmp/kg_pkg.zip \
        scripts/run_pipeline.py \
        --sf-dir /root/testdata/sf0.001 --out /tmp/kg_out

On a real cluster the same command takes --master yarn/k8s and
--num-executors N; the engine confs here are master-agnostic (the tuned
conf is shared with the library's own session factory).

Outputs under --out:
    eval_aggregate/   per-combo evaluation table
    graph/edges/      (subj, pred, obj) edges partitioned by subj_bucket
    graph/predicate_summary/
Prints ONE JSON line with row counts.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True, help="testdata sf directory")
    ap.add_argument("--out", required=True, help="output root")
    ap.add_argument("--techniques", default="IO,ReAct")
    ap.add_argument("--models", default="stub-large")
    ap.add_argument("--strategies", default="exact,text")
    ap.add_argument("--limit", type=int, default=0, help="page cap (0 = all)")
    ap.add_argument("--shuffle-partitions", type=int, default=32)
    args = ap.parse_args()

    # master/deploy-mode/executors come from the spark-submit command; only
    # the engine's own tuned conf is applied here.  Imports of the package
    # happen AFTER the session exists so they resolve from --py-files.
    builder = SparkSession.builder.appName("kg-construct")
    from relation_extraction_using_llms_spark.session import tuned_conf

    for k, v in tuned_conf(args.shuffle_partitions).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from relation_extraction_using_llms_spark.operators.canonicalize import (
        canonical_mapping,
        materialize_triples,
    )
    from relation_extraction_using_llms_spark.plans.pipeline import (
        PipelineConfig,
        run_pipeline,
    )
    from relation_extraction_using_llms_spark.plans.reports import (
        write_graph_tables,
    )
    from relation_extraction_using_llms_spark.sources.stub_model import (
        make_stub_model,
    )
    from relation_extraction_using_llms_spark.sources.synthetic import pages_df

    cfg = PipelineConfig(
        techniques=args.techniques.split(","),
        models=args.models.split(","),
        strategies=args.strategies.split(","),
        with_types_variants=(True,),
    )
    pages = pages_df(spark, args.sf_dir)
    if args.limit:
        pages = pages.limit(args.limit)
    stages = run_pipeline(spark, pages, cfg, model_fn=make_stub_model(args.sf_dir))

    agg_path = f"{args.out}/eval_aggregate"
    stages["eval_aggregate"].write.mode("overwrite").parquet(agg_path)

    cmap = canonical_mapping(stages["entity_catalog"])
    triples = materialize_triples(stages["resolved"], cmap)
    graph_paths = write_graph_tables(triples, f"{args.out}/graph")

    n_agg = spark.read.parquet(agg_path).count()
    n_edges = spark.read.parquet(graph_paths["edges"]).count()
    print(
        json.dumps(
            {
                "eval_aggregate_rows": n_agg,
                "graph_edges": n_edges,
                "out": args.out,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
