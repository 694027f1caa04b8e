#!/usr/bin/env python
"""Benchmark harness.

Runs the headline stages at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": "triples_per_sec", "value": N, "unit": "sec", "queries": {...},
   "sf": ...}

The synthetic corpus (pages/gold/responses derived from the documents
table) is materialized to parquet once per (sf, seed) under /tmp — the
benchmark then measures the engine reading tables, as in deployment, not
the generator.

  --scaling   run the headline pipeline at local[8] AND local[32] on the
              same input and report throughput + scaling efficiency
              (the sandbox substitute for N vs 4N executors).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
TECHNIQUES = ["IO", "ReAct"]
MODELS = ["stub-large"]
# scaling runs use the full fan-out (4 techniques x 2 models = 8 combos) so
# each run is long enough to amortize fixed stage costs — the measurement
# target is steady-state throughput, which is what a 100 TB job sees.
SCALING_TECHNIQUES = ["IO", "CoT", "ReAct", "RAG"]
SCALING_MODELS = ["stub-small", "stub-large"]
# scaling corpus = replicated documents (distinct doc_ids) so per-level runs
# are compute-bound for long enough that fixed stage costs (~5-8 s/run)
# don't drown the signal.
SCALING_REPLICAS = int(os.environ.get("SPARK_GRAFT_SCALE_REPLICAS", "24"))


def _control_pass(args=None) -> float:
    """Fixed pure-Python workload (SequenceMatcher over deterministic
    token lists) — the shared body of both hardware controls.  Module
    level so multiprocessing can pickle it."""
    import random
    from difflib import SequenceMatcher

    reps, n = args or (8, 14000)
    rng = random.Random(1234)
    words = ["w%03d" % rng.randint(0, 400) for _ in range(n * 2)]
    total = 0.0
    for i in range(reps):
        total += SequenceMatcher(None, words[i::2][:n], words[i + 1 :: 2][:n]).ratio()
    return total


def hardware_control_sec() -> float:
    """Single-process control wall (best-of-2), ~2.1 s on this box
    unthrottled.  Emitted as ``control_sec`` in the JSON line so any
    reader can normalize a throttled/co-tenant sample: a uniform
    multiplier on every pipeline stage that ALSO appears on this control
    is box state, not a code regression (the r5 driver artifact's 1.9x
    could not be distinguished without it)."""
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        _control_pass()
        best = min(best, time.time() - t0)
    return round(best, 3)


def hardware_control_mc_sec(procs: int = 16) -> float:
    """ALL-CORE control: the same workload in ``procs`` concurrent
    processes; returns the wall of the slowest (best-of-2).  This box's
    all-core turbo throttles independently of single-core speed — a
    sample can read control_ratio ~1.0 (single core fine) while every
    32-thread pipeline stage runs 1.2x slow.  control_mc_ratio catches
    exactly that state; a stage multiplier mirrored by NEITHER control
    is a genuine regression."""
    from multiprocessing import get_context

    best = float("inf")
    with get_context("fork").Pool(procs) as pool:
        pool.map(_control_pass, [(1, 2000)] * procs)  # warm the pool
        for _ in range(2):
            t0 = time.time()
            pool.map(_control_pass, [(4, 14000)] * procs)
            best = min(best, time.time() - t0)
    return round(best, 3)


# best-of-2 walls of the two controls on this box on a known-good
# (unthrottled, idle) day — the denominators for normalizing a sample.
# MC nominal is DERIVED, not yet observed on a good day: single-proc
# (4,14000) ~= CONTROL_NOMINAL/2 = 1.05 s, and the measured per-proc
# all-core slowdown at 16 procs is 1.25-1.35x across throttled samples
# (2026-08-17: mc16/single-half = 1.25, 1.35) -> ~1.35 s.  Refine when a
# control_ratio ~1.0 day produces a direct mc16 sample.
CONTROL_NOMINAL_SEC = 2.1
CONTROL_MC_NOMINAL_SEC = 1.35


def corpus_dir(sf_dir: str, replicas: int = 1) -> str:
    tag = sf_dir.strip("/").replace("/", "_")
    # v2: replicas are vocabulary-salted distinct shards (see _documents)
    suffix = f"_x{replicas}v2" if replicas > 1 else ""
    return f"/tmp/bench_corpus_{tag}{suffix}"


def materialize_corpus(spark, sf_dir: str, scaling: bool = False) -> str:
    """Write pages/gold_entities/gold_relations/responses parquet once."""
    from relation_extraction_using_llms_spark.sources.synthetic import (
        gold_entities_df,
        gold_relations_df,
        pages_df,
        stub_responses_df,
    )

    replicas = SCALING_REPLICAS if scaling else 1
    out = corpus_dir(sf_dir, replicas)
    marker = f"{out}/_DONE"
    # 64-way layout: parquet row groups only split at file boundaries for
    # small files, so a deterministic multi-file layout keeps every level's
    # scans parallel (mirrors a real many-file table).
    if not os.path.exists(marker):
        pages_df(spark, sf_dir, replicas).repartition(64).write.mode("overwrite").parquet(
            f"{out}/pages"
        )
        gold_entities_df(spark, sf_dir, replicas=replicas).repartition(64).write.mode(
            "overwrite"
        ).parquet(f"{out}/gold_entities")
        gold_relations_df(spark, sf_dir, replicas=replicas).repartition(64).write.mode(
            "overwrite"
        ).parquet(f"{out}/gold_relations")
        techniques = SCALING_TECHNIQUES if scaling else TECHNIQUES
        models = SCALING_MODELS if scaling else MODELS
        stub_responses_df(spark, sf_dir, techniques, models, replicas=replicas).repartition(
            64
        ).write.mode("overwrite").parquet(f"{out}/responses")
        open(marker, "w").close()
    if scaling and not os.path.exists(f"{out}/documents/_SUCCESS"):
        # replicated (vocabulary-salted) documents: the dedup stage must be
        # measured on the level-scaled input, or its wall time is a
        # fixed-size job that can never show core scaling (own marker so an
        # already-built corpus is not regenerated just to add this table)
        from relation_extraction_using_llms_spark.sources.synthetic import (
            _documents,
        )

        _documents(spark, sf_dir, replicas).repartition(64).write.mode(
            "overwrite"
        ).parquet(f"{out}/documents")
    if scaling and not os.path.exists(f"{out}/embeddings/_SUCCESS"):
        # level-scaled ANN input, same rationale as documents above
        from relation_extraction_using_llms_spark.sources.synthetic import (
            embeddings_df,
        )

        embeddings_df(spark, sf_dir, replicas).repartition(64).write.mode(
            "overwrite"
        ).parquet(f"{out}/embeddings")
    return out


def run_stages(spark, corpus: str, responses_name: str = "responses",
               techniques=None, models=None) -> dict[str, float]:
    """Time each headline stage; returns {name: seconds} + counters."""
    from pyspark.sql import functions as F

    from relation_extraction_using_llms_spark.functions.extraction import clean_text_df
    from relation_extraction_using_llms_spark.functions.parsing import parsed_triples_df
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
    from relation_extraction_using_llms_spark.operators.aggregate import (
        aggregate_results,
    )
    from relation_extraction_using_llms_spark.operators.similarity import lsh_topk

    pages = spark.read.parquet(f"{corpus}/pages")
    ents = spark.read.parquet(f"{corpus}/gold_entities")
    gold_rels = spark.read.parquet(f"{corpus}/gold_relations")
    responses = spark.read.parquet(f"{corpus}/{responses_name}")
    techniques = techniques or TECHNIQUES
    models = models or MODELS

    times: dict[str, float] = {}
    counters: dict[str, int] = {}

    def timed(name, fn):
        t0 = time.time()
        n = fn()
        times[name] = round(time.time() - t0, 3)
        counters[name] = n
        return n

    # 1. extraction
    clean = clean_text_df(pages)
    timed("q_extract", lambda: clean.count())
    clean_tbl = f"{corpus}/stage_clean"
    clean.write.mode("overwrite").parquet(clean_tbl)
    clean_r = spark.read.parquet(clean_tbl)

    # 2. parse + validate
    with_text = responses.join(clean_r.select("url", "text"), "url")
    triples = parsed_triples_df(with_text)
    triples_tbl = f"{corpus}/stage_triples"
    timed(
        "q_parse",
        lambda: triples.write.mode("overwrite").parquet(triples_tbl) or
        spark.read.parquet(triples_tbl).count(),
    )
    triples_r = spark.read.parquet(triples_tbl)

    # 3a. entity catalog (one-pass salted two-phase full_catalog — the
    # materialized entity-grain stage output; membership ids live in the
    # gold_entities table already)
    cat_tbl = f"{corpus}/stage_candidates"
    cat = full_catalog(ents)
    timed(
        "q_catalog",
        lambda: cat.write.mode("overwrite").parquet(cat_tbl) or
        spark.read.parquet(cat_tbl).count(),
    )
    cat_r = spark.read.parquet(cat_tbl)

    # 3b. linking: distinct-(mention, entity) pair scoring + JVM reduction
    resolved = resolve_in_document(
        triples_r,
        membership_df=ents.select("url", "entity_id"),
        catalog_df=cat_r,
    )
    resolved_tbl = f"{corpus}/stage_resolved"
    timed(
        "q_resolve",
        lambda: resolved.write.mode("overwrite").parquet(resolved_tbl) or
        spark.read.parquet(resolved_tbl).count(),
    )
    resolved_r = spark.read.parquet(resolved_tbl)

    # 4. triple materialization
    n_triples = timed(
        "q_materialize",
        lambda: materialize_triples(resolved_r).count(),
    )

    # 5. evaluation (exact + text, with_types)
    bundle = gold_bundle(gold_rels, ents)
    combos = [(t, m) for t in techniques for m in models]
    counts = evaluate_counts_df(
        resolved_r, bundle, strategies=["exact", "text"],
        with_types_variants=(True,), combos=combos,
    )
    agg = aggregate_results(eval_per_doc(counts, resolved_r, gold_rels))
    timed("q_evaluate", lambda: agg.count())

    # 6. training-data ops — in scaling mode the dedup runs on the
    # level-scaled (replicated, vocabulary-salted) documents shard so its
    # wall time can actually drop with cores; default mode keeps the fixed
    # sf input for round-over-round comparability
    # gate on the _SUCCESS marker (matching materialize_corpus), not the
    # directory: a partially written shard from an interrupted run must
    # fall back to the fixed sf input, not be read as-is
    docs_path = f"{corpus}/documents"
    if not os.path.exists(f"{docs_path}/_SUCCESS"):
        docs_path = f"{SF_DIR}/documents.parquet"
    docs = spark.read.parquet(docs_path)
    timed("q_dedup_minhash", lambda: minhash_lsh_pairs(docs, jaccard_threshold=0.5).count())
    emb_path = f"{corpus}/embeddings"
    if not os.path.exists(f"{emb_path}/_SUCCESS"):
        emb_path = f"{SF_DIR}/embeddings.parquet"
    emb = spark.read.parquet(emb_path)
    queries_df = emb.where(F.col("vec_id") < 32).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    timed("q_ann_lsh", lambda: lsh_topk(emb, queries_df, k=10).count())

    times["_n_triples"] = n_triples
    return times


def warm_workers(spark, corpus: str) -> None:
    """One small pass through every Python-UDF stage so each worker pays
    its pandas/pyarrow import cost before timing starts.  A production job
    amortizes this over hours; timing it would measure interpreter startup,
    not the engine."""
    from relation_extraction_using_llms_spark.functions.extraction import clean_text_df
    from relation_extraction_using_llms_spark.functions.parsing import parsed_triples_df
    from relation_extraction_using_llms_spark.operators.entity_catalog import (
        full_catalog,
    )
    from relation_extraction_using_llms_spark.operators.linking import (
        resolve_in_document,
    )

    from pyspark.sql import functions as F

    from relation_extraction_using_llms_spark.operators.dedup import minhash_lsh_pairs
    from relation_extraction_using_llms_spark.operators.similarity import lsh_topk

    pages = spark.read.parquet(f"{corpus}/pages").limit(64).repartition(64)
    clean = clean_text_df(pages)
    responses = spark.read.parquet(f"{corpus}/responses").limit(64).repartition(64)
    triples = parsed_triples_df(responses.join(clean.select("url", "text"), "url"))
    ents = spark.read.parquet(f"{corpus}/gold_entities").limit(64).repartition(64)
    resolve_in_document(
        triples,
        membership_df=ents.select("url", "entity_id"),
        catalog_df=full_catalog(ents),
    ).count()
    # the ANN/dedup stages pay one-time Janino codegen of their nested-HOF
    # expressions on first use; warm them on 64-row slices for the same
    # reason the Python workers are warmed above
    emb64 = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(64)
    q8 = emb64.limit(8).select(F.col("vec_id").alias("query_id"), "embedding")
    lsh_topk(emb64, q8, k=3).count()
    minhash_lsh_pairs(
        spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(64)
    ).count()


def run_once(master: str, shuffle_partitions: int, scaling: bool = False):
    from relation_extraction_using_llms_spark.session import get_spark

    spark = get_spark("bench", master=master, shuffle_partitions=shuffle_partitions)
    corpus = materialize_corpus(spark, SF_DIR, scaling=scaling)
    warm_workers(spark, corpus)
    # best-of-2 always: the sandbox shows intermittent multi-second
    # co-tenant stalls that would otherwise dominate any single run
    if scaling:
        times = run_stages(spark, corpus, techniques=SCALING_TECHNIQUES, models=SCALING_MODELS)
        second = run_stages(spark, corpus, techniques=SCALING_TECHNIQUES, models=SCALING_MODELS)
    else:
        times = run_stages(spark, corpus)
        second = run_stages(spark, corpus)
    for k, v in second.items():
        if isinstance(v, float) and k in times:
            times[k] = min(times[k], v)
    spark.stop()
    return times


SCALE_LEVELS = [
    int(x) for x in os.environ.get("SPARK_GRAFT_SCALE_LEVELS", "4,8,16,32").split(",")
]


def main():
    scaling = "--scaling" in sys.argv
    if "--materialize" in sys.argv:
        # build the (scaling) corpus and exit — lets orchestration split
        # corpus construction from timed runs
        from relation_extraction_using_llms_spark.session import get_spark

        spark = get_spark("bench-mat", master=f"local[{CPUS}]",
                          shuffle_partitions=max(8, int(CPUS)))
        out = materialize_corpus(spark, SF_DIR, scaling=scaling)
        spark.stop()
        print(json.dumps({"materialized": out}))
        return
    control = hardware_control_sec()
    control_mc = hardware_control_mc_sec()
    times = run_once(f"local[{CPUS}]", max(8, int(CPUS)))
    n_triples = times.pop("_n_triples")
    pipeline_sec = (
        times["q_extract"] + times["q_parse"] + times["q_catalog"]
        + times["q_resolve"] + times["q_materialize"]
    )
    result = {
        "metric": "triples_per_sec",
        "value": round(n_triples / pipeline_sec, 2) if pipeline_sec else 0.0,
        "unit": "sec",
        "queries": {k: v for k, v in times.items()},
        "sf": SF_DIR,
        "n_triples": n_triples,
        "pipeline_sec": round(pipeline_sec, 3),
        "cpus": int(CPUS),
        # hardware-state control: single-process pure-python wall, best-of-2,
        # measured immediately before the pipeline run.  nominal ~2.1 s on
        # this box idle; control_ratio > ~1.3 means the sample ran on a
        # throttled/co-tenant box and stage walls scale by roughly that
        # multiplier (see hardware_control_sec docstring).
        "control_sec": control,
        "control_nominal_sec": CONTROL_NOMINAL_SEC,
        "control_ratio": round(control / CONTROL_NOMINAL_SEC, 3),
        # all-core control: same workload across 16 concurrent processes.
        # This box's all-core turbo throttles independently of single-core
        # speed, so control_ratio ~1.0 with control_mc_ratio ~1.2 means
        # "multi-threaded stages run ~1.2x slow, single-threaded fine".
        # A stage multiplier mirrored by NEITHER control is a regression.
        "control_mc_sec": control_mc,
        "control_mc_nominal_sec": CONTROL_MC_NOMINAL_SEC,
        "control_mc_ratio": round(control_mc / CONTROL_MC_NOMINAL_SEC, 3),
    }
    if scaling:
        # fresh JVMs per level; same input all runs.  The N -> 4N pair is
        # local[4] -> local[16]: a pure-python multiprocessing control shows
        # this box scales 3.99x from 4 -> 16 procs but only ~3.0x from
        # 8 -> 32 (all-core turbo throttling) — the 4/16 pair measures the
        # engine, not the silicon's frequency curve.  8/32 reported too.
        for level in SCALE_LEVELS:
            level_control = hardware_control_sec()
            # per-level all-core control: N procs each doing FIXED work, so
            # a flat wall across levels == perfect hardware scaling; the
            # level-L/level-4 wall ratio IS the same-day silicon ceiling
            # that scaling-efficiency claims must be normalized by.
            level_control_mc = hardware_control_mc_sec(procs=level)
            t = run_once(f"local[{level}]", level, scaling=True)
            nt = t.pop("_n_triples")
            sec = (t["q_extract"] + t["q_parse"] + t["q_catalog"]
                   + t["q_resolve"] + t["q_materialize"])
            result[f"scaling_local{level}"] = {
                "pipeline_sec": round(sec, 3),
                "triples_per_sec": round(nt / sec, 2) if sec else 0.0,
                "stages": {k: v for k, v in t.items() if k.startswith("q_")},
                "n_triples": nt,
                "control_sec": level_control,
                "control_mc_sec": level_control_mc,
            }
        tps = {
            lv: result[f"scaling_local{lv}"]["triples_per_sec"]
            for lv in SCALE_LEVELS
        }
        if 4 in tps and 16 in tps and tps[4]:
            result["scaling_efficiency_4_to_16"] = round(tps[16] / (4 * tps[4]), 3)
        if 8 in tps and 32 in tps and tps[8]:
            result["scaling_efficiency_8_to_32"] = round(tps[32] / (4 * tps[8]), 3)
        mc = {
            lv: result[f"scaling_local{lv}"].get("control_mc_sec")
            for lv in SCALE_LEVELS
        }
        # hardware ceiling for each efficiency pair: fixed work per proc, so
        # perfect silicon holds the wall flat; ceiling = wall(N)/wall(4N)
        for lo, hi in ((4, 16), (8, 32), (2, 8)):
            if mc.get(lo) and mc.get(hi):
                result[f"control_ceiling_{lo}_to_{hi}"] = round(mc[lo] / mc[hi], 3)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
