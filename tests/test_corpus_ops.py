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


def test_pack_documents_bins_average_to_budget(spark):
    from relation_extraction_using_llms_spark.operators.corpus import (
        pack_documents,
    )

    rows = [(i, "src", "tok " * 10) for i in range(30)]  # 10 tokens each
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = pack_documents(docs, budget_tokens=25, by="source").collect()
    by_doc = {r["doc_id"]: r for r in out}
    assert by_doc[0]["bin_id"] == 0 and by_doc[0]["n_tokens"] == 10
    # exclusive cumsum: doc i starts at 10*i tokens -> bin floor(10*i/25)
    for i in range(30):
        assert by_doc[i]["bin_id"] == (10 * i) // 25, i
    # deterministic across repartitioning
    out2 = pack_documents(docs.repartition(5), budget_tokens=25).collect()
    assert {(r["doc_id"], r["bin_id"]) for r in out2} == {
        (r["doc_id"], r["bin_id"]) for r in out
    }


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
    prof = {r["group"]: r for r in corpus_profile(docs).collect()}
    assert prof["a"]["n_docs"] == 2 and prof["a"]["total_tokens"] == 8
    assert prof["a"]["p50_tokens"] == 4.0  # interpolated median of {3, 5}
    assert prof["b"]["n_docs"] == 1 and prof["b"]["p50_tokens"] == 1.0
    assert prof["a"]["avg_chars"] == (13 + 23) / 2


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
