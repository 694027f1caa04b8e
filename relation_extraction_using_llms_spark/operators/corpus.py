"""Corpus management primitives for training-data pipelines.

Three standard operations a 100 TB text pipeline needs around the dedup /
quality stages in this package:

  deterministic_sample   reproducible hash-threshold sampling — the same
                         rows come back on every run, on every cluster,
                         with no RNG state to ship (unlike ``df.sample``,
                         whose output depends on partitioning)
  pack_documents         streaming sequence packing: assign docs to
                         ~budget-token bins per group via a cumulative-sum
                         window — the batch-construction step before
                         training-example serialization
  corpus_profile         per-source token/length statistics (exact
                         interpolated percentiles) — the corpus QA table

All three are pure JVM column/window logic with DuckDB-oracle twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _hex_threshold(fraction: float) -> str:
    """32-hex-digit threshold such that P(md5_hex < threshold) ==
    ``fraction`` under a uniform hash — exact hex expansion, so Spark and
    any external engine agree by plain STRING comparison (no hex->int
    parsing, which engines disagree on)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    scaled = int(fraction * (1 << 128))
    return format(min(scaled, (1 << 128) - 1), "032x")


def deterministic_sample(
    df: DataFrame, fraction: float, key: str = "doc_id"
) -> DataFrame:
    """Keep rows whose ``md5(key)`` falls below the fraction's hex
    threshold.  Membership depends only on the key value: re-runs,
    repartitions and different cluster sizes all select the SAME rows
    (the reproducibility contract ``df.sample`` cannot give), and two
    samples with fractions f1 < f2 are NESTED (the f1 sample is a subset
    of the f2 sample) — handy for growing training subsets
    monotonically."""
    thr = _hex_threshold(fraction)
    return df.where(F.md5(F.col(key).cast("string")) < F.lit(thr))


def pack_documents(
    documents: DataFrame,
    budget_tokens: int = 8192,
    by: str = "source",
    order_col: str = "doc_id",
) -> DataFrame:
    """Assign each document to a ~``budget_tokens`` bin within its
    ``by`` group: bin_id = floor(exclusive-cumulative-tokens / budget)
    over a deterministic ``order_col`` ordering.  Streaming quantized
    packing — a document may straddle a budget boundary, but every bin
    except the last holds >= budget tokens and bins average to the
    budget; the assignment is a single window cumsum (one shuffle on the
    group key), deterministic across runs and cluster sizes.

    Returns (doc_id, group, n_tokens, bin_id)."""
    n_tokens = F.size(F.split(F.lower(F.trim("text")), r"\s+"))
    w = (
        Window.partitionBy("group")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        documents.select(
            "doc_id", F.col(by).alias("group"), n_tokens.alias("n_tokens")
        )
        .withColumn(
            "bin_id",
            F.floor(
                F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
                / F.lit(budget_tokens)
            ),
        )
    )


# PII patterns shared verbatim by the Spark operator and the DuckDB
# oracle: restricted to the Java-regex ∩ RE2 dialect (no lookaround, no
# backreferences) so both engines match identical spans.  Redaction
# order matters (an email contains dot-separated tokens an IP pattern
# could nibble at) and is fixed: email -> ipv4 -> intl phone.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (
        "phone",
        r"\+\d{1,3}[ .-]?\(?\d{2,4}\)?[ .-]?\d{3,4}[ .-]?\d{2,4}",
        "<PHONE>",
    ),
)


def redact_pii(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Scrub emails, IPv4 addresses and international phone numbers from
    the text column, counting what was removed — the standard PII pass a
    web-scale training pipeline runs before publication.  Pure JVM
    ``regexp_replace``/``regexp_extract_all`` column logic (codegen, no
    Python); patterns are deliberately conservative (the ``+``-prefixed
    phone form only) — recall-tuned pattern packs drop into
    ``PII_PATTERNS`` without touching the operator.

    Returns the input columns with ``text`` redacted plus one
    ``n_<kind>`` count per pattern."""
    out = documents
    redacted = F.col(text_col)
    counts = []
    for kind, pat, token in PII_PATTERNS:
        counts.append(
            F.size(F.regexp_extract_all(redacted, F.lit(pat), F.lit(0))).alias(
                f"n_{kind}"
            )
        )
        redacted = F.regexp_replace(redacted, pat, token)
    keep = [c for c in documents.columns if c != text_col]
    return out.select(*keep, redacted.alias(text_col), *counts)


def corpus_profile(documents: DataFrame, by: str = "source") -> DataFrame:
    """Per-group corpus QA statistics: doc count, token totals, exact
    interpolated median/p95 token counts and mean char length.  One
    map-side-combinable aggregation (the percentiles are exact —
    appropriate for a profiling table; swap in approx_percentile for
    ad-hoc exploration at extreme group cardinalities)."""
    n_tokens = F.size(F.split(F.lower(F.trim("text")), r"\s+"))
    base = documents.select(
        F.col(by).alias("group"),
        n_tokens.alias("n_tokens"),
        F.length("text").alias("n_chars"),
    )
    return base.groupBy("group").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.round(F.expr("percentile(n_tokens, 0.5)"), 6).alias("p50_tokens"),
        F.round(F.expr("percentile(n_tokens, 0.95)"), 6).alias("p95_tokens"),
        F.round(F.avg("n_chars"), 6).alias("avg_chars"),
    )
