"""Prompt construction (SURVEY.md §2.5, P1-P8).

The reference builds prompts with per-row Python string templates
(io_prompter.py:64-172, cot_prompter.py:63-209, react_prompter.py:45-184,
rag_prompter.py:130-246, baseline_prompter.py:51-72) — deterministic
functions of (text, doc_id, technique, mode).  Here the whole stage is a
JVM-side ``concat`` over literal template fragments: whole-stage codegen,
no Python in the hot path at all.  Template texts are original (same
structure: preamble -> relation-type definitions -> few-shot examples ->
technique scaffold -> document); the reference's exact prose is not the
invariant — its (url -> extracted text) bytes and emitted triples are.

Fan-out over techniques/modes/models is a crossJoin with a tiny config
DataFrame (replaces the reference's nested thread pools, main.py:877-975).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TECHNIQUES = ["IO", "CoT", "ReAct", "RAG"]
MODES = ["baseline", "improved", "full"]

RELATION_TYPES_BRIEF = (
    "Association, Positive_Correlation, Negative_Correlation, Bind, "
    "Cotreatment, Comparison, Drug_Interaction, Conversion"
)

RELATION_TYPE_DEFS = """Relation types (use exactly these labels):
- Association: a general link between two entities.
- Positive_Correlation: one entity increases with the other.
- Negative_Correlation: one entity decreases as the other increases.
- Bind: physical binding between molecules.
- Cotreatment: entities used together as treatment.
- Comparison: entities compared against each other.
- Drug_Interaction: pharmacological interaction between substances.
- Conversion: one entity transformed into the other."""

OUTPUT_SPEC = """Return a JSON array; each element:
{"head_mention": "<exact text span>", "tail_mention": "<exact text span>", "relation_type": "<label>"}
Use exact character spans from the document for both mentions."""

FEW_SHOT = """Example document: "ABC1 binds XYZ2 in tumor cells."
Example output: [{"head_mention": "ABC1", "tail_mention": "XYZ2", "relation_type": "Bind"}]"""

COT_STEPS = """Work step by step:
1. List candidate entity mentions.
2. Group mentions referring to the same entity.
3. For each entity pair, decide whether the text states a relation.
4. Assign the best relation type label.
5. Emit the final JSON array only."""

REACT_SCAFFOLD = """Follow the OBSERVE-THINK-ACT-REFLECT-EXTRACT loop:
OBSERVE the document. THINK about which entities interact.
ACT by drafting candidate triples. REFLECT on unsupported ones and drop them.
EXTRACT: output the final JSON array only."""


def _technique_block(technique: str) -> str:
    if technique == "CoT":
        return COT_STEPS
    if technique == "ReAct":
        return REACT_SCAFFOLD
    if technique == "RAG":
        return "Consider the retrieved context snippets above the document when extracting."
    return "Extract the relations directly."


def template_parts(technique: str, mode: str) -> tuple[str, str]:
    """(prefix, suffix) literal fragments around the document text."""
    pieces = [
        "You are a biomedical relation extraction system.",
    ]
    if mode in ("improved", "full"):
        pieces.append(RELATION_TYPE_DEFS)
    else:
        pieces.append(f"Valid relation types: {RELATION_TYPES_BRIEF}.")
    if mode == "full":
        pieces.append(FEW_SHOT)
    pieces.append(_technique_block(technique))
    pieces.append(OUTPUT_SPEC)
    prefix = "\n\n".join(pieces) + "\n\nDocument (id={doc_id}):\n"
    return prefix, "\n\nJSON output:"


def template_hash(technique: str, mode: str) -> str:
    """Provenance hash of the template (reference main.py:80-102 snapshots
    prompts + sha256; here the hash is a lineage column)."""
    pre, suf = template_parts(technique, mode)
    return hashlib.sha256(f"{pre}|{suf}".encode()).hexdigest()[:12]


def configs_df(spark, techniques=None, modes=None, models=None) -> DataFrame:
    """Tiny (technique, mode, model) config table for crossJoin fan-out."""
    rows = [
        (t, mo, m, template_hash(t, mo))
        for t in (techniques or TECHNIQUES)
        for mo in (modes or MODES)
        for m in (models or ["stub-large"])
    ]
    return spark.createDataFrame(
        rows, "technique string, mode string, model string, prompt_template_hash string"
    )


def build_prompts(
    clean_text_df: DataFrame,
    configs: DataFrame,
    context_df: DataFrame | None = None,
) -> DataFrame:
    """clean_text x configs -> (url, technique, mode, model,
    prompt_template_hash, doc_hash, prompt).

    ``context_df`` (url, context) supplies RAG retrieval snippets
    (rag_prompter.py:77-129); joined in only for RAG rows.
    """
    fanned = clean_text_df.select("url", "text").crossJoin(F.broadcast(configs))
    if context_df is not None:
        fanned = fanned.join(context_df, "url", "left")
        ctx = F.when(
            (F.col("technique") == "RAG") & F.col("context").isNotNull(),
            F.concat(F.lit("Retrieved context:\n"), F.col("context"), F.lit("\n\n")),
        ).otherwise(F.lit(""))
    else:
        ctx = F.lit("")

    # Assemble per-row: prefix literal depends on (technique, mode) — a small
    # CASE over the config columns keeps everything in codegen.
    prefix = F.lit(None).cast("string")
    suffix = F.lit(None).cast("string")
    for t in TECHNIQUES:
        for mo in MODES:
            pre, suf = template_parts(t, mo)
            pre_head, _, pre_tail = pre.partition("{doc_id}")
            cond = (F.col("technique") == t) & (F.col("mode") == mo)
            prefix = F.when(
                cond, F.concat(F.lit(pre_head), F.col("url"), F.lit(pre_tail))
            ).otherwise(prefix)
            suffix = F.when(cond, F.lit(suf)).otherwise(suffix)
    return fanned.select(
        "url",
        "technique",
        "mode",
        "model",
        "prompt_template_hash",
        F.sha2(F.coalesce(F.col("text"), F.lit("")), 256).substr(1, 12).alias("doc_hash"),
        F.concat(ctx, prefix, F.coalesce(F.col("text"), F.lit("")), suffix).alias("prompt"),
    )
