"""LLM response parsing + validation (SURVEY.md §2.7, X1-X6).

Semantics mirror the reference parser (pipeline/parsing/parser.py:181-321)
and validator (pipeline/parsing/validator.py) exactly; implementation is
original.  Runs inside ``mapInPandas`` over Arrow batches.
"""

from __future__ import annotations

import json
import re
from collections.abc import Iterator

import pandas as pd

from .textnorm import confidence_score, mention_in_text

_FENCE_PATTERNS = [
    re.compile(r"```json\s*\n([\s\S]*?)\n```", re.MULTILINE),
    re.compile(r"```\s*\n([\s\S]*?)\n```", re.MULTILINE),
    re.compile(r"```json\s*([\s\S]*?)\n```", re.MULTILINE),
    re.compile(r"```\s*([\s\S]*?)\n```", re.MULTILINE),
]
_ARROW_LINE = re.compile(r"([^->:]+)\s*->\s*([^->:]+)\s*:\s*([^\n]+)")


def _try_loads(s: str):
    try:
        out = json.loads(s)
    except json.JSONDecodeError:
        return None
    return out if out else None


def _balanced_slice(text: str, open_ch: str, close_ch: str):
    """Return the substring spanning the first balanced open..close pair,
    honouring JSON string literals and escapes (parser.py:220-295)."""
    start = text.find(open_ch)
    if start == -1:
        return None
    depth = 0
    in_str = False
    escaped = False
    for i in range(start, len(text)):
        ch = text[i]
        if escaped:
            escaped = False
            continue
        if ch == "\\":
            escaped = True
            continue
        if ch == '"':
            in_str = not in_str
            continue
        if in_str:
            continue
        if ch == open_ch:
            depth += 1
        elif ch == close_ch:
            depth -= 1
            if depth == 0:
                return text[start : i + 1]
    return None


def extract_json(text: str):
    """Fence patterns -> balanced array -> balanced object -> whole text.
    Returns the parsed JSON value or None (parser.py:181-295)."""
    if not text:
        return None
    for pat in _FENCE_PATTERNS:
        for m in pat.findall(text):
            parsed = _try_loads(m)
            if parsed is not None:
                return parsed
    arr = _balanced_slice(text, "[", "]")
    if arr is not None:
        parsed = _try_loads(arr)
        if parsed is not None:
            return parsed
    obj = _balanced_slice(text, "{", "}")
    if obj is not None:
        parsed = _try_loads(obj)
        if parsed is not None:
            return parsed
    return _try_loads(text.strip())


def parse_response(response: str) -> tuple[list[dict], list[str]]:
    """Response text -> ([{head_mention, tail_mention, relation_type,
    confidence}], parsing_errors).  JSON rows need all three fields
    non-empty (parser.py:55-73); fallback parses ``A -> B: type`` lines
    (parser.py:297-321)."""
    errors: list[str] = []
    data = extract_json(response or "")
    triples: list[dict] = []
    if data is not None:
        if isinstance(data, dict) and "relations" in data:
            data = data["relations"]
        elif not isinstance(data, list):
            data = [data]
        for row in data:
            if not isinstance(row, dict):
                continue
            head = str(row.get("head_mention", "") or "").strip()
            tail = str(row.get("tail_mention", "") or "").strip()
            rtype = str(row.get("relation_type", "") or "").strip()
            if head and tail and rtype:
                triples.append(
                    {
                        "head_mention": head,
                        "tail_mention": tail,
                        "relation_type": rtype,
                        "confidence": row.get("confidence"),
                    }
                )
    else:
        errors.append("No JSON found, attempting text parsing")
        for head, tail, rtype in _ARROW_LINE.findall(response or ""):
            triples.append(
                {
                    "head_mention": head.strip(),
                    "tail_mention": tail.strip(),
                    "relation_type": rtype.strip(),
                    "confidence": None,
                }
            )
    return triples, errors


def validate_triples(
    triples: list[dict], source_text: str
) -> tuple[list[dict], list[str]]:
    """Mention-presence validation with keep-invalid policy + confidence
    assignment (parser.py:105-129 with filter_invalid=False;
    validator.py:122-205)."""
    errors: list[str] = []
    for t in triples:
        head_ok = mention_in_text(t["head_mention"], source_text)
        tail_ok = mention_in_text(t["tail_mention"], source_text)
        if not head_ok:
            errors.append(
                f"Invalid relation: {t['head_mention']} -> {t['tail_mention']}"
                f" ({t['relation_type']}): head not found in source text"
            )
        elif not tail_ok:
            errors.append(
                f"Invalid relation: {t['head_mention']} -> {t['tail_mention']}"
                f" ({t['relation_type']}): tail not found in source text"
            )
        t["confidence"] = confidence_score(
            t["head_mention"], t["tail_mention"], source_text
        )
    return triples, errors


def parse_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body over (url, technique, model, response, text) ->
    PREDICTED rows (head/tail ids left null; linking fills them) plus an
    ``n_errors``-free shape — errors ride a separate channel built by
    ``error_batches``."""
    for pdf in batches:
        out = {
            "url": [],
            "technique": [],
            "model": [],
            "pred_index": [],
            "head_mention": [],
            "tail_mention": [],
            "relation_type": [],
            "confidence": [],
            "head_id": [],
            "tail_id": [],
        }
        for url, technique, model, response, text in zip(
            pdf["url"], pdf["technique"], pdf["model"], pdf["response"], pdf["text"]
        ):
            triples, _ = parse_response(response)
            if text:
                triples, _ = validate_triples(triples, text)
            for i, t in enumerate(triples):
                out["url"].append(url)
                out["technique"].append(technique)
                out["model"].append(model)
                out["pred_index"].append(i)
                out["head_mention"].append(t["head_mention"])
                out["tail_mention"].append(t["tail_mention"])
                out["relation_type"].append(t["relation_type"])
                out["confidence"].append(t["confidence"])
                out["head_id"].append(None)
                out["tail_id"].append(None)
        yield pd.DataFrame(out)


def error_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body emitting the errors side-table (url, stage, error)."""
    for pdf in batches:
        rows = {"url": [], "stage": [], "error": []}
        for url, response, text in zip(pdf["url"], pdf["response"], pdf["text"]):
            triples, perrs = parse_response(response)
            verrs: list[str] = []
            if text:
                _, verrs = validate_triples(triples, text)
            for e in perrs:
                rows["url"].append(url)
                rows["stage"].append("parse")
                rows["error"].append(e)
            for e in verrs:
                rows["url"].append(url)
                rows["stage"].append("validate")
                rows["error"].append(e)
        yield pd.DataFrame(rows)


VALIDATION_SCHEMA = (
    "url string, technique string, model string, pred_index int,"
    " head_mention string, tail_mention string, head_strict boolean,"
    " tail_strict boolean, head_ok boolean, tail_ok boolean,"
    " confidence double"
)


def validation_df(triples_with_text_df):
    """X5/X6 isolated: mention-presence flags + confidence assignment over
    already-parsed triples (validator.py:64-205 semantics — strict
    containment, the loose cascade, and the 0.5 + 0.2/0.2/0.1 capped
    confidence formula).  Pure per-row column logic over (mention, text);
    the DuckDB oracle re-derives every output column in SQL.

    Input: (url, technique, model, pred_index, head_mention, tail_mention,
    text); output adds the two strict flags, the two loose flags and
    ``confidence``.
    """
    cols = triples_with_text_df.select(
        "url", "technique", "model", "pred_index",
        "head_mention", "tail_mention", "text",
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "url", "technique", "model", "pred_index", "head_mention",
                "tail_mention", "head_strict", "tail_strict", "head_ok",
                "tail_ok", "confidence",
            )}
            for url, tech, model, idx, head, tail, text in zip(
                pdf["url"], pdf["technique"], pdf["model"], pdf["pred_index"],
                pdf["head_mention"], pdf["tail_mention"], pdf["text"],
            ):
                out["url"].append(url)
                out["technique"].append(tech)
                out["model"].append(model)
                out["pred_index"].append(idx)
                out["head_mention"].append(head)
                out["tail_mention"].append(tail)
                out["head_strict"].append(mention_in_text(head, text, strict=True))
                out["tail_strict"].append(mention_in_text(tail, text, strict=True))
                out["head_ok"].append(mention_in_text(head, text))
                out["tail_ok"].append(mention_in_text(tail, text))
                out["confidence"].append(confidence_score(head, tail, text))
            yield pd.DataFrame(out)

    return cols.mapInPandas(fn, schema=VALIDATION_SCHEMA)


def parsed_triples_df(responses_with_text_df):
    """(url, technique, model, response, text) -> PREDICTED DataFrame."""
    from ..schemas import PREDICTED

    cols = responses_with_text_df.select(
        "url", "technique", "model", "response", "text"
    )
    return cols.mapInPandas(parse_batches, schema=PREDICTED)


def parse_errors_df(responses_with_text_df):
    from ..schemas import ERRORS

    cols = responses_with_text_df.select("url", "response", "text")
    return cols.mapInPandas(error_batches, schema=ERRORS)
