"""Text-analysis operators over the documents table (training-data ops):
language ID, quality scoring, token counting, document fingerprinting.
All JVM-side column expressions (codegen); no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Tiny per-language stop-word inventories for the n-gram/stop-word heuristic.
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein"],
    "es": ["el", "la", "los", "las", "es", "que", "con", "una"],
}


def _tokens(col="text"):
    return F.split(F.lower(F.trim(F.col(col))), r"\s+")


def token_count(documents: DataFrame) -> DataFrame:
    """Whitespace tokens + a BPE-ish subword estimate (word-piece count
    approximated by ceil(chars/4), the common rule of thumb)."""
    toks = _tokens()
    return documents.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.ceil(F.length(F.col("text")) / 4).cast("long").alias("n_subwords_est"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
    )


def language_id(documents: DataFrame) -> DataFrame:
    """Stop-word-vote language ID: count marker-word hits per language,
    argmax (ties -> 'und' = undetermined order by score desc, lang asc)."""
    toks = _tokens()
    scores = [
        F.size(
            F.array_intersect(
                F.array_distinct(toks), F.array(*[F.lit(w) for w in words])
            )
        ).alias(f"score_{lang}")
        for lang, words in LANG_MARKERS.items()
    ]
    scored = documents.select("doc_id", "lang", *scores)
    langs = list(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{lg}") for lg in langs])
    pred = F.lit("und")
    for lg in reversed(langs):  # earlier languages win ties
        pred = F.when(
            (F.col(f"score_{lg}") == best) & (best > 0), F.lit(lg)
        ).otherwise(pred)
    return scored.select(
        "doc_id",
        F.col("lang").alias("lang_actual"),
        pred.alias("lang_pred"),
        *[F.col(f"score_{lg}") for lg in langs],
    )


def quality_score(documents: DataFrame) -> DataFrame:
    """Heuristic quality features + composite score: length band, mean word
    length, punctuation ratio, stop-word ratio, repetition ratio."""
    toks = _tokens()
    n_tokens = F.size(toks)
    n_chars = F.length("text")
    punct = n_chars - F.length(F.regexp_replace("text", r"[^\w\s]", ""))
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin(LANG_MARKERS["en"]))
    )
    uniq_ratio = F.size(F.array_distinct(toks)) / F.greatest(n_tokens, F.lit(1))
    feats = documents.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        (n_chars / F.greatest(n_tokens, F.lit(1))).alias("mean_word_len"),
        (punct / F.greatest(n_chars, F.lit(1))).alias("punct_ratio"),
        (stop_hits / F.greatest(n_tokens, F.lit(1))).alias("stopword_ratio"),
        uniq_ratio.alias("unique_ratio"),
    )
    length_ok = F.when(
        (F.col("n_tokens") >= 10) & (F.col("n_tokens") <= 100000), 1.0
    ).otherwise(0.0)
    word_ok = F.when(
        (F.col("mean_word_len") >= 3) & (F.col("mean_word_len") <= 12), 1.0
    ).otherwise(0.0)
    punct_ok = F.when(F.col("punct_ratio") <= 0.2, 1.0).otherwise(0.0)
    rep_ok = F.when(F.col("unique_ratio") >= 0.1, 1.0).otherwise(0.0)
    return feats.withColumn(
        "quality_score",
        (0.3 * length_ok + 0.25 * word_ok + 0.2 * punct_ok + 0.25 * rep_ok),
    )


def text_stats(documents: DataFrame, n: int = 5) -> DataFrame:
    """Every text statistic this module computes — token counts, language
    ID, quality features + composite score, and the minhash fingerprint —
    in ONE projection over ONE scan of the documents table.

    This is the scale-shaped entry point: the four per-block functions
    (``token_count``/``language_id``/``quality_score``/``fingerprint``)
    each scan the input once, so materializing all four costs four scans
    (or three shuffling joins to recombine).  Here the repeated
    sub-expressions (the token split, the distinct-token array) are plain
    codegen expressions OUTSIDE lambdas, so whole-stage codegen CSE
    evaluates each once per row; the shingle HOF is let-bound via
    ``bind_once`` exactly as in ``fingerprint``.  A parity test pins this
    column-for-column to the four individual functions joined on doc_id.

    Requires the documents schema (doc_id, text, lang)."""
    from .hofs import bind_once

    toks = _tokens()
    n_tokens = F.size(toks)
    n_chars = F.length("text")
    punct = n_chars - F.length(F.regexp_replace("text", r"[^\w\s]", ""))
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(LANG_MARKERS["en"])))
    uniq = F.size(F.array_distinct(toks))
    mean_word_len = n_chars / F.greatest(n_tokens, F.lit(1))
    punct_ratio = punct / F.greatest(n_chars, F.lit(1))
    stopword_ratio = stop_hits / F.greatest(n_tokens, F.lit(1))
    unique_ratio = uniq / F.greatest(n_tokens, F.lit(1))

    langs = list(LANG_MARKERS)
    scores = {
        lang: F.size(
            F.array_intersect(
                F.array_distinct(toks), F.array(*[F.lit(w) for w in words])
            )
        )
        for lang, words in LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    pred = F.lit("und")
    for lg in reversed(langs):  # earlier languages win ties
        pred = F.when((scores[lg] == best) & (best > 0), F.lit(lg)).otherwise(
            pred
        )

    length_ok = F.when((n_tokens >= 10) & (n_tokens <= 100000), 1.0).otherwise(
        0.0
    )
    word_ok = F.when(
        (mean_word_len >= 3) & (mean_word_len <= 12), 1.0
    ).otherwise(0.0)
    punct_ok = F.when(punct_ratio <= 0.2, 1.0).otherwise(0.0)
    rep_ok = F.when(unique_ratio >= 0.1, 1.0).otherwise(0.0)
    quality = 0.3 * length_ok + 0.25 * word_ok + 0.2 * punct_ok + 0.25 * rep_ok

    def sh_of(t):
        idx = F.sequence(F.lit(0), F.greatest(F.size(t) - n, F.lit(0)))
        return F.transform(
            idx, lambda i: F.array_join(F.slice(t, i + 1, n), " ")
        )

    fp = bind_once(
        bind_once(_tokens(), sh_of),
        lambda sh: F.struct(
            F.array_min(F.transform(sh, F.md5)).alias("fingerprint"),
            F.size(sh).alias("n_shingles"),
        ),
    )

    return documents.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.ceil(n_chars / 4).cast("long").alias("n_subwords_est"),
        uniq.alias("n_unique_tokens"),
        F.col("lang").alias("lang_actual"),
        pred.alias("lang_pred"),
        *[scores[lg].alias(f"score_{lg}") for lg in langs],
        mean_word_len.alias("mean_word_len"),
        punct_ratio.alias("punct_ratio"),
        stopword_ratio.alias("stopword_ratio"),
        unique_ratio.alias("unique_ratio"),
        quality.alias("quality_score"),
        fp.alias("_fp"),
    ).select(
        *[
            c
            for c in (
                "doc_id",
                "n_tokens",
                "n_subwords_est",
                "n_unique_tokens",
                "lang_actual",
                "lang_pred",
                *[f"score_{lg}" for lg in langs],
                "mean_word_len",
                "punct_ratio",
                "stopword_ratio",
                "unique_ratio",
                "quality_score",
            )
        ],
        F.col("_fp.fingerprint").alias("fingerprint"),
        F.col("_fp.n_shingles").alias("n_shingles"),
    )


def fingerprint(documents: DataFrame, n: int = 5) -> DataFrame:
    """Min-hash style document fingerprint: minimum md5 over word
    ``n``-gram shingles (a deterministic 1-perm minhash; two docs share a
    fingerprint iff their rarest-hashing shingle coincides — the standard
    cheap near-dup blocking key).

    Tokens and the shingle array are let-bound (``bind_once``): HOF
    lambdas are interpreted without CSE, so unbound references would
    re-tokenize once per shingle (see functions/hofs.py)."""
    from .hofs import bind_once

    def sh_of(t):
        idx = F.sequence(F.lit(0), F.greatest(F.size(t) - n, F.lit(0)))
        return F.transform(
            idx, lambda i: F.array_join(F.slice(t, i + 1, n), " ")
        )

    result = bind_once(
        bind_once(_tokens(), sh_of),
        lambda sh: F.struct(
            F.array_min(F.transform(sh, F.md5)).alias("fingerprint"),
            F.size(sh).alias("n_shingles"),
        ),
    )
    return documents.select("doc_id", result.alias("_r")).select(
        "doc_id", "_r.fingerprint", "_r.n_shingles"
    )
