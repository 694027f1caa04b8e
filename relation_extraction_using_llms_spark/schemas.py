"""Schema constants for every table the engine produces or consumes.

Mirrors the reference data model (SURVEY.md §1; reference
pipeline/types.py:7-172) plus the web-scale ``pages`` input shape from
BASELINE.json ``input_hint``.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# pages: Common-Crawl-style input table (input_hint).  html carries a
# BioC-like passage structure (JSON bytes) so clean-text extraction has
# real parsing work; text may be null (forces extraction from html).
# ---------------------------------------------------------------------------
PAGES = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# Mention span inside a document (reference types.py:7-14).
MENTION = T.StructType(
    [
        T.StructField("text", T.StringType(), True),
        T.StructField("passage_index", T.IntegerType(), True),
        T.StructField("passage_offset", T.IntegerType(), True),
        T.StructField("char_offset", T.IntegerType(), True),
        T.StructField("length", T.IntegerType(), True),
    ]
)

# Per-document gold entity annotations (reference types.py:17-22).
GOLD_ENTITIES = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("entity_id", T.StringType(), False),
        T.StructField("entity_type", T.StringType(), True),
        T.StructField("mentions", T.ArrayType(MENTION), True),
    ]
)

# Per-document gold relations (reference types.py:25-32).
GOLD_RELATIONS = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("rel_id", T.StringType(), False),
        T.StructField("head_id", T.StringType(), False),
        T.StructField("tail_id", T.StringType(), False),
        T.StructField("rel_type", T.StringType(), False),
        T.StructField("novel", T.StringType(), True),
    ]
)

# Clean extracted text per page (reference generate_clean_text.py:28-53
# defines the byte-level invariant; loader.py:47-58 the reload shape).
CLEAN_TEXT = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("title", T.StringType(), True),
        T.StructField("body", T.StringType(), True),
        T.StructField("file_text", T.StringType(), True),  # bytes written to disk
        T.StructField("text", T.StringType(), True),  # prompt text after reload
    ]
)

# Raw model responses / cache table (reference llm_cache.py:284-372).
LLM_RESPONSES = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("technique", T.StringType(), False),
        T.StructField("model", T.StringType(), False),
        T.StructField("prompt_template_hash", T.StringType(), True),
        T.StructField("doc_hash", T.StringType(), True),
        T.StructField("response", T.StringType(), True),
    ]
)

# Parsed + validated predicted triples (reference types.py:66-74).
PREDICTED = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("technique", T.StringType(), True),
        T.StructField("model", T.StringType(), True),
        T.StructField("pred_index", T.IntegerType(), False),  # parse order (greedy-match order)
        T.StructField("head_mention", T.StringType(), True),
        T.StructField("tail_mention", T.StringType(), True),
        T.StructField("relation_type", T.StringType(), True),
        T.StructField("confidence", T.DoubleType(), True),
        T.StructField("head_id", T.StringType(), True),
        T.StructField("tail_id", T.StringType(), True),
    ]
)

# Side-channel errors table (parsing_errors / entity_resolution_errors,
# reference types.py:77-85).
ERRORS = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("stage", T.StringType(), False),
        T.StructField("error", T.StringType(), True),
    ]
)

# Global entity catalog (reference types.py:55-63, entity_map.py:18-74).
ENTITY_CATALOG = T.StructType(
    [
        T.StructField("entity_id", T.StringType(), False),
        T.StructField("entity_type", T.StringType(), True),
        T.StructField("canonical_name", T.StringType(), True),
        T.StructField("common_mentions", T.ArrayType(T.StringType()), True),
        T.StructField("mention_count", T.LongType(), True),
        T.StructField("document_count", T.LongType(), True),
    ]
)

# Per-document matcher output: counted match classes per strategy.
MATCH_COUNTS = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("strategy", T.StringType(), False),
        T.StructField("with_types", T.BooleanType(), False),
        T.StructField("tp", T.IntegerType(), False),
        T.StructField("fp", T.IntegerType(), False),
        T.StructField("fn", T.IntegerType(), False),
        T.StructField("partial", T.IntegerType(), False),
        T.StructField("semantic_sum", T.DoubleType(), True),
        T.StructField("n_gold", T.IntegerType(), False),
        T.StructField("n_pred", T.IntegerType(), False),
    ]
)

# Detailed per-prediction match records (reference evaluator.py:269-361).
MATCH_DETAILS = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("strategy", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # tp | semantic | fp | fn
        T.StructField("head", T.StringType(), True),
        T.StructField("tail", T.StringType(), True),
        T.StructField("rel_type", T.StringType(), True),
        T.StructField("score", T.DoubleType(), True),
    ]
)

# Per-partition lineage ledger for checkpoint/resume (north_rule).
LINEAGE = T.StructType(
    [
        T.StructField("stage", T.StringType(), False),
        T.StructField("partition_key", T.StringType(), False),
        T.StructField("input_hash", T.StringType(), True),
        T.StructField("row_count", T.LongType(), True),
        T.StructField("status", T.StringType(), True),
        T.StructField("run_id", T.StringType(), True),
    ]
)
