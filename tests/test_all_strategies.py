"""End-to-end smoke across ALL nine matching strategies + ensemble, and
invariant checks that don't need the reference (which can't run
token/levenshtein/jaro_winkler/sbert here)."""

from __future__ import annotations

import pytest

from relation_extraction_using_llms_spark.operators.matching import (
    ALL_STRATEGIES,
    run_strategy,
)


@pytest.fixture(scope="module")
def eval_counts(spark, sf_dir):
    from relation_extraction_using_llms_spark.plans.pipeline import (
        PipelineConfig,
        run_pipeline,
    )
    from relation_extraction_using_llms_spark.sources.stub_model import make_stub_model
    from relation_extraction_using_llms_spark.sources.synthetic import pages_df

    cfg = PipelineConfig(
        techniques=["ReAct"],
        models=["stub-large"],
        strategies=ALL_STRATEGIES,
        with_types_variants=(True, False),
    )
    pages = pages_df(spark, sf_dir).limit(80)
    stages = run_pipeline(spark, pages, cfg, model_fn=make_stub_model(sf_dir))
    return stages["counts"].collect()


def test_every_strategy_produces_counts(eval_counts):
    by_strategy = {}
    for r in eval_counts:
        by_strategy.setdefault(r["strategy"], []).append(r)
    assert set(by_strategy) == set(ALL_STRATEGIES)
    for strategy, rows in by_strategy.items():
        assert len(rows) == 80 * 2, strategy  # 80 docs x 2 type variants
        total_tp = sum(r["tp"] for r in rows)
        assert total_tp > 0, strategy


def test_count_invariants(eval_counts):
    for r in eval_counts:
        # every prediction lands in exactly one bucket
        assert r["tp"] + r["fp"] + r["n_semantic"] == r["n_pred"], r
        # gold accounting: consumed + FN covers all gold for consuming
        # strategies; for exact/fuzzy partial-matches don't consume gold
        if r["strategy"] == "exact":
            # matched gold tracked by TUPLE (matcher.py): duplicate gold
            # tuples all leave the FN set when one matches
            assert r["tp"] + r["fn"] <= r["n_gold"], r
        elif r["strategy"] == "fuzzy":
            assert r["tp"] + r["fn"] == r["n_gold"], r
        else:
            assert r["tp"] + r["n_semantic"] + r["fn"] == r["n_gold"], r
        assert r["semantic_sum"] >= 0.0


def test_strategy_ordering_sanity(eval_counts):
    """Looser kernels should not find fewer matches than exact-ID matching
    in aggregate (they match on text, which the stub corrupts less than
    resolution loses)."""
    tp = {}
    for r in eval_counts:
        if r["with_types"]:
            tp[r["strategy"]] = tp.get(r["strategy"], 0) + r["tp"]
    assert tp["text"] >= tp["exact"] * 0.8
    assert tp["jaccard"] > 0 and tp["token"] > 0
    assert tp["levenshtein"] > 0 and tp["jaro_winkler"] > 0
    assert tp["ensemble"] > 0 and tp["sbert"] > 0


def test_run_strategy_empty_inputs():
    for strategy in ALL_STRATEGIES:
        assert run_strategy(strategy, [], [], True) == []
        golds = [
            {
                "rel_id": "R0",
                "head_id": "A",
                "tail_id": "B",
                "rel_type": "Bind",
                "head_mentions": ["alpha"],
                "tail_mentions": ["beta"],
            }
        ]
        out = run_strategy(strategy, [], golds, True)
        assert [d["kind"] for d in out] == ["fn"], strategy
        preds = [
            {
                "pred_index": 0,
                "head_mention": "alpha",
                "tail_mention": "beta",
                "relation_type": "Bind",
                "head_id": "A",
                "tail_id": "B",
            }
        ]
        out2 = run_strategy(strategy, preds, golds, True)
        kinds = sorted(d["kind"] for d in out2)
        assert kinds == ["tp"], (strategy, out2)
