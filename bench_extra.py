#!/usr/bin/env python
"""Per-stage isolation harness (guide §1.4): builds the SAME DataFrames
bench.py's run_stages builds, but times each through the noop sink and/or
dumps .explain("formatted") — so optimization work measures the
computation, not the parquet sink, and plan claims are verifiable.

    python bench_extra.py explain [out_dir]   # write plans/<q>_*.txt
    python bench_extra.py time [stage ...]    # noop-sink best-of-2 walls

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same contract as bench.py).
bench.py itself is FROZEN for measurement; numbers cited from here are
sub-stage isolation evidence only.
"""

from __future__ import annotations

import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
TECHNIQUES = ["IO", "ReAct"]
MODELS = ["stub-large"]


def build_stage_dfs(spark, corpus: str) -> dict:
    """The eight benched stage DataFrames, over the SAME materialized
    stage tables bench.py writes (stage_clean/stage_triples/... must
    exist — run bench.py once first)."""
    from pyspark.sql import functions as F

    from relation_extraction_using_llms_spark.functions.extraction import clean_text_df
    from relation_extraction_using_llms_spark.functions.parsing import parsed_triples_df
    from relation_extraction_using_llms_spark.operators.aggregate import (
        aggregate_results,
    )
    from relation_extraction_using_llms_spark.operators.canonicalize import (
        materialize_triples,
    )
    from relation_extraction_using_llms_spark.operators.dedup import minhash_lsh_pairs
    from relation_extraction_using_llms_spark.operators.entity_catalog import (
        full_catalog,
    )
    from relation_extraction_using_llms_spark.operators.linking import (
        resolve_in_document,
    )
    from relation_extraction_using_llms_spark.operators.matching import (
        evaluate_counts_df,
        gold_bundle,
    )
    from relation_extraction_using_llms_spark.operators.metrics import eval_per_doc
    from relation_extraction_using_llms_spark.operators.similarity import lsh_topk

    pages = spark.read.parquet(f"{corpus}/pages")
    ents = spark.read.parquet(f"{corpus}/gold_entities")
    gold_rels = spark.read.parquet(f"{corpus}/gold_relations")
    responses = spark.read.parquet(f"{corpus}/responses")
    clean_r = spark.read.parquet(f"{corpus}/stage_clean")
    triples_r = spark.read.parquet(f"{corpus}/stage_triples")
    cat_r = spark.read.parquet(f"{corpus}/stage_candidates")
    resolved_r = spark.read.parquet(f"{corpus}/stage_resolved")

    combos = [(t, m) for t in TECHNIQUES for m in MODELS]
    counts = evaluate_counts_df(
        resolved_r,
        gold_bundle(gold_rels, ents),
        strategies=["exact", "text"],
        with_types_variants=(True,),
        combos=combos,
    )
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries_df = emb.where(F.col("vec_id") < 32).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return {
        "q_extract": clean_text_df(pages),
        "q_parse": parsed_triples_df(
            responses.join(clean_r.select("url", "text"), "url")
        ),
        "q_catalog": full_catalog(ents),
        "q_resolve": resolve_in_document(
            triples_r,
            membership_df=ents.select("url", "entity_id"),
            catalog_df=cat_r,
        ),
        "q_materialize": materialize_triples(resolved_r),
        "q_evaluate": aggregate_results(eval_per_doc(counts, resolved_r, gold_rels)),
        "q_dedup_minhash": minhash_lsh_pairs(docs, jaccard_threshold=0.5),
        "q_ann_lsh": lsh_topk(emb, queries_df, k=10),
    }


def main():
    from relation_extraction_using_llms_spark.session import get_spark

    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    spark = get_spark(
        "bench-extra", master=f"local[{CPUS}]", shuffle_partitions=max(8, int(CPUS))
    )
    corpus = f"/tmp/bench_corpus_{SF_DIR.strip('/').replace('/', '_')}"
    dfs = build_stage_dfs(spark, corpus)

    if mode == "explain":
        out_dir = sys.argv[2] if len(sys.argv) > 2 else "plans/r07"
        os.makedirs(out_dir, exist_ok=True)
        suffix = os.environ.get("PLAN_SUFFIX", "before")
        for name, df in dfs.items():
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(f"{out_dir}/{name}_{suffix}.txt", "w") as f:
                f.write(buf.getvalue())
            print(f"wrote {out_dir}/{name}_{suffix}.txt")
    else:
        wanted = sys.argv[2:] or list(dfs)
        # warm python workers + codegen once (bench.py does the same)
        for name in wanted:
            dfs[name].limit(8).write.format("noop").mode("overwrite").save()
        results = {}
        for name in wanted:
            best = float("inf")
            for _ in range(2):
                spark.sparkContext.setJobDescription(f"noop:{name}")
                t0 = time.time()
                dfs[name].write.format("noop").mode("overwrite").save()
                best = min(best, time.time() - t0)
            results[name] = round(best, 3)
            print(f"{name}: {results[name]}s (noop best-of-2)")
        import json

        print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
