"""Full-pipeline kill-and-resume (north_rule): a crashed run resumes from
its ledger, recomputing only missing partitions; results equal a clean run."""

from __future__ import annotations

import pyspark.sql.functions as F


def _key(rows):
    return sorted(
        (r["url"], r["technique"], r["model"], r["pred_index"], r["head_id"], r["tail_id"])
        for r in rows
    )


def test_kill_and_resume_equals_clean_run(spark, sf_dir, tmp_path):
    from relation_extraction_using_llms_spark.plans.checkpointed import (
        run_checkpointed,
    )
    from relation_extraction_using_llms_spark.plans.pipeline import PipelineConfig
    from relation_extraction_using_llms_spark.sources.stub_model import make_stub_model
    from relation_extraction_using_llms_spark.sources.synthetic import pages_df

    cfg = PipelineConfig(techniques=["IO"], models=["stub-large"])
    model = make_stub_model(sf_dir)
    pages = pages_df(spark, sf_dir).limit(100).cache()

    # clean run (reference result)
    clean_dir = str(tmp_path / "clean_run")
    clean = run_checkpointed(spark, pages, clean_dir, cfg, model)
    want = _key(clean["resolved"].collect())
    assert len(want) > 100

    # "crashed" run: first attempt only sees 40 pages (simulates a job
    # killed partway — some partitions done, some not)
    crash_dir = str(tmp_path / "crash_run")
    first = pages.limit(40)
    run_checkpointed(spark, first, crash_dir, cfg, model)

    # resume with the full input: only missing partitions recompute
    resumed = run_checkpointed(spark, pages, crash_dir, cfg, model)
    got = _key(resumed["resolved"].collect())
    assert got == want

    # third run: pure no-op, same result
    again = run_checkpointed(spark, pages, crash_dir, cfg, model)
    assert _key(again["resolved"].collect()) == want

    # ledger doubles as the metrics table
    metrics = {r["stage"]: r for r in resumed["ledger"].collect()}
    for stage in ("clean_text", "gold_entities", "gold_relations", "triples", "resolved"):
        assert stage in metrics, stage
        assert metrics[stage]["rows"] > 0
    # the crashed+resumed ledger shows two distinct run ids contributed
    assert any(r["n_runs"] >= 1 for r in resumed["ledger"].collect())


def test_partial_resume_recomputes_only_missing(spark, sf_dir, tmp_path):
    """Count model calls across the crash/resume cycle: the resumed run
    must fetch only the delta (cache anti-join), never re-ask."""
    from relation_extraction_using_llms_spark.plans.checkpointed import (
        run_checkpointed,
    )
    from relation_extraction_using_llms_spark.plans.pipeline import PipelineConfig
    from relation_extraction_using_llms_spark.sources.stub_model import make_stub_model
    from relation_extraction_using_llms_spark.sources.synthetic import pages_df

    cfg = PipelineConfig(techniques=["IO"], models=["stub-large"])
    inner = make_stub_model(sf_dir)
    calls = []

    def counting_model(df):
        calls.append(df.count())
        return inner(df)

    pages = pages_df(spark, sf_dir).limit(60).cache()
    workdir = str(tmp_path / "wd")
    run_checkpointed(spark, pages.limit(25), workdir, cfg, counting_model)
    assert sum(calls) == 25
    run_checkpointed(spark, pages, workdir, cfg, counting_model)
    assert sum(calls) == 60  # only the 35 new pages hit the model
