"""Corpus management primitives for training-data pipelines.

Three standard operations a 100 TB text pipeline needs around the dedup /
quality stages in this package:

  deterministic_sample   reproducible hash-threshold sampling — the same
                         rows come back on every run, on every cluster,
                         with no RNG state to ship (unlike ``df.sample``,
                         whose output depends on partitioning)
  pack_documents         streaming sequence packing: assign docs to
                         ~budget-token bins per group via a TWO-LEVEL
                         cumulative sum ((group, hash-bucket) windows +
                         broadcast bucket offsets — never one task per
                         group) — the batch-construction step before
                         training-example serialization
  corpus_profile         per-source token/length statistics
                         (approx_percentile by default; exact=True for
                         the oracle-verified interpolated form) — the
                         corpus QA table

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


def hash_bucket(col: str, n_buckets: int):
    """Deterministic cross-engine hash bucket in ``[0, n_buckets)``: the
    first two md5 hex chars of the value-as-string -> 0..255 -> modulo.
    Built from string primitives BOTH Spark and DuckDB evaluate
    identically (``instr``/``strpos`` over the hex alphabet), so oracle
    SQL can replay the bucketing bit-for-bit — Spark's ``hash()`` is
    murmur3, which external engines cannot reproduce."""
    if not 1 <= n_buckets <= 256:
        raise ValueError(f"n_buckets must be in [1, 256], got {n_buckets}")
    h = f"md5(cast(`{col}` as string))"
    c = "instr('0123456789abcdef', substring({h}, {i}, 1)) - 1"
    return F.expr(
        f"pmod(({c.format(h=h, i=1)}) * 16 + {c.format(h=h, i=2)}, {n_buckets})"
    )


def pack_documents(
    documents: DataFrame,
    budget_tokens: int = 8192,
    by: str = "source",
    order_col: str = "doc_id",
    n_buckets: int = 16,
) -> DataFrame:
    """Assign each document to a ~``budget_tokens`` bin within its
    ``by`` group: bin_id = floor(exclusive-cumulative-tokens / budget)
    under the deterministic total order ``(hash_bucket(order_col),
    order_col)``.  Floor binning never splits a document, so bins
    AVERAGE to the budget; an individual bin can be under- or over-filled
    when a document straddles its boundary.

    Scale shape — two-level packing, no single-task-per-group window:
    with the default ``by="source"`` a 100 TB corpus has a handful of
    groups, and a plain cumsum window over ``partitionBy(group)`` would
    sort each group's billions of rows in ONE task.  Instead docs hash
    into ``n_buckets`` buckets per group, the cumsum window partitions by
    ``(group, bucket)`` (max task = group/n_buckets; raise ``n_buckets``
    up to 256 for bigger groups), and each bucket's global token offset —
    the exclusive prefix-sum of per-bucket totals in bucket order, a tiny
    groups x buckets aggregate — is broadcast-joined back.  The result is
    IDENTICAL to a single exclusive-cumsum window over the
    ``(bucket, order_col)`` total order (``n_buckets=1`` degenerates to
    exactly the plain ``order_col`` window), deterministic across runs,
    partitionings and cluster sizes.

    Returns (doc_id, group, n_tokens, bin_id)."""
    n_tokens = F.size(F.split(F.lower(F.trim("text")), r"\s+"))
    base = documents.select(
        "doc_id",
        F.col(by).alias("group"),
        n_tokens.alias("n_tokens"),
        hash_bucket(order_col, n_buckets).alias("_bucket"),
        F.col(order_col).alias("_ord"),
    )
    w = (
        Window.partitionBy("group", "_bucket")
        .orderBy("_ord")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = base.withColumn(
        "_cum", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )
    w_off = (
        Window.partitionBy("group")
        .orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        base.groupBy("group", "_bucket")
        .agg(F.sum("n_tokens").alias("_btot"))
        .withColumn("_boff", F.coalesce(F.sum("_btot").over(w_off), F.lit(0)))
        .select("group", "_bucket", "_boff")
    )
    return cum.join(F.broadcast(offsets), ["group", "_bucket"]).select(
        "doc_id",
        "group",
        "n_tokens",
        F.floor((F.col("_boff") + F.col("_cum")) / F.lit(budget_tokens)).alias(
            "bin_id"
        ),
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


def corpus_profile(
    documents: DataFrame,
    by: str = "source",
    exact: bool = False,
    accuracy: int = 10000,
) -> DataFrame:
    """Per-group corpus QA statistics: doc count, token totals,
    median/p95 token counts and mean char length.  One
    map-side-combinable aggregation.

    Percentiles default to ``approx_percentile`` (Greenwald-Khanna, a
    bounded ~O(accuracy)-size sketch per group) because the failure mode
    of exact ``percentile`` is ROWS PER GROUP, not group cardinality: a
    holistic aggregate buffers every per-group value in one aggregation
    buffer, so a single source with 10^9 docs OOMs an executor no matter
    how few groups exist.  ``exact=True`` keeps the exact interpolated
    percentile for small/verified inputs (it is what the DuckDB
    ``quantile_cont`` oracle twin replays)."""
    n_tokens = F.size(F.split(F.lower(F.trim("text")), r"\s+"))
    base = documents.select(
        F.col(by).alias("group"),
        n_tokens.alias("n_tokens"),
        F.length("text").alias("n_chars"),
    )
    if exact:
        p50 = F.expr("percentile(n_tokens, 0.5)")
        p95 = F.expr("percentile(n_tokens, 0.95)")
    else:
        p50 = F.expr(f"approx_percentile(n_tokens, 0.5, {accuracy})").cast(
            "double"
        )
        p95 = F.expr(f"approx_percentile(n_tokens, 0.95, {accuracy})").cast(
            "double"
        )
    return base.groupBy("group").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.round(p50, 6).alias("p50_tokens"),
        F.round(p95, 6).alias("p95_tokens"),
        F.round(F.avg("n_chars"), 6).alias("avg_chars"),
    )


def mix_sources(
    documents: DataFrame,
    weights: dict[str, int],
    target_tokens: int,
    by: str = "source",
    key: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Down-sample each ``by`` group to hit a weighted token budget — the
    corpus-mixing step that turns raw source dumps into a training mix
    ("5 parts web to 1 part wiki, 10B tokens total").

    Per group g: target_g = target_tokens * w_g / sum(w); sampling
    fraction = min(1, target_g / tokens_g); membership is the same
    deterministic hash test as ``deterministic_sample`` (uniform in
    [0,1) from the first 13 md5 hex digits of ``key`` — 52 bits, exact
    in IEEE double for Spark and any oracle engine), so the mix is
    reproducible across runs, partitionings and cluster sizes, and
    raising the budget grows each group's sample as a SUPERSET.  Groups
    absent from ``weights`` are dropped.  Expected realized tokens per
    group = target_g (exact only in expectation — hash sampling is
    per-document).

    Scale shape: ONE map-side-combinable groupBy over the corpus for
    per-group token totals (|groups| rows, broadcast-joined back), then
    a pure-JVM filter; fully lazy, no driver action, no skew risk.

    Returns sampled rows: (doc_id, group, n_tokens, sample_frac).
    """
    if not weights:
        raise ValueError("weights must be a non-empty {group: int} dict")
    if any(w < 0 for w in weights.values()) or sum(weights.values()) <= 0:
        raise ValueError(f"weights must be >= 0 with a positive sum: {weights}")
    w_total = sum(weights.values())
    base = documents.select(
        F.col(key).alias("doc_id"),
        F.col(by).alias("group"),
        F.size(F.split(F.lower(F.trim(text_col)), r"\s+")).alias("n_tokens"),
    ).where(F.col("group").isin(*weights.keys()))
    totals = base.groupBy("group").agg(F.sum("n_tokens").alias("_gtok"))
    weight_map = F.create_map(
        *[F.lit(x) for kv in weights.items() for x in kv]
    )
    # mirror-exact fraction: every step below is a single correctly-rounded
    # IEEE double op; oracle SQL replays the identical expression tree, so
    # the fractions (and therefore the keep sets) agree bit-for-bit
    frac = F.least(
        F.lit(1.0),
        (F.lit(float(target_tokens)) * weight_map[F.col("group")] / F.lit(w_total))
        / F.col("_gtok").cast("double"),
    )
    # uniform [0,1)-scaled integer: first 13 md5 hex digits = 52 bits,
    # exactly representable in double on both engines
    u = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13), 16, 10).cast(
        "double"
    )
    return (
        base.join(F.broadcast(totals), "group")
        .withColumn("_frac", frac)
        .where(u < F.col("_frac") * F.lit(float(1 << 52)))
        .select("doc_id", "group", "n_tokens", F.round("_frac", 6).alias("sample_frac"))
    )
