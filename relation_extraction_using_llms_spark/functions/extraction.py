"""Clean-text extraction — the byte-identity invariant (SURVEY.md §2.2).

Semantics reproduced (not copied) from the reference:
  - setup_scripts/generate_clean_text.py:28-40 ``extract_title_and_body``
  - setup_scripts/generate_clean_text.py:43-53 ``write_document_text``
  - pipeline/data/loader.py:47-58 (reload: title line + "\\n"-joined rest)

The reference writes ``{title}\\n\\n{body}`` paragraphs joined by ``\\n\\n``
then re-reads line-wise joining raw lines (with their trailing newlines)
by ``\\n`` — an asymmetry that multiplies blank lines between paragraphs.
Both directions are reproduced byte-for-byte; the round-trip output
(``text``) is what every prompt sees.

Spark surface: one ``mapInPandas``-compatible batch function operating on
the ``pages`` table.  The html payload is a BioC-like JSON document
(``{"documents":[{"id":..,"passages":[{"offset":..,"text":..}]}]}``);
parsing + string assembly are pure Python over Arrow batches — no per-row
Python UDFs.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd


def title_body_from_passages(passages: list[dict]) -> tuple[str, str]:
    """Title = stripped text of the offset-min passage; body = remaining
    non-empty stripped texts joined by blank lines."""
    if not passages:
        return "", ""
    ordered = sorted(passages, key=lambda p: p.get("offset", 0))
    title = (ordered[0].get("text") or "").strip()
    rest = [(p.get("text") or "").strip() for p in ordered[1:] if p.get("text")]
    body = "\n\n".join(s for s in rest if s)
    return title, body


def file_bytes(title: str, body: str) -> str:
    """The exact bytes the reference writes per document (trailing newline,
    outer strip; title-only docs collapse to one line)."""
    if body:
        return f"{title}\n\n{body}".strip() + "\n"
    return (title or "").strip() + "\n"


def _split_keepends(s: str) -> list[str]:
    """Line split on '\\n' only, keeping the terminator — mirrors
    ``open(...).readlines()`` on files this pipeline writes."""
    if not s:
        return []
    parts = s.split("\n")
    lines = [p + "\n" for p in parts[:-1]]
    if parts[-1]:
        lines.append(parts[-1])
    return lines


def reload_text(file_text: str) -> tuple[str, str, str]:
    """Re-read the written bytes the way the reference loader does:
    first line stripped = title; remaining raw lines '\\n'-joined then
    stripped = body; text = title + blank line + body."""
    lines = _split_keepends(file_text)
    if not lines:
        return "", "", ""
    title = lines[0].strip()
    body = "\n".join(lines[1:]).strip() if len(lines) > 1 else ""
    text = f"{title}\n\n{body}" if body else title
    return title, body, text


def extract_record(html: bytes | str | None) -> tuple[str, str, str, str]:
    """html JSON -> (title, body, file_text, text).  Returns empty strings
    on undecodable payloads (error rows are filtered by the caller)."""
    if html is None:
        return "", "", "", ""
    try:
        raw = html.decode("utf-8") if isinstance(html, (bytes, bytearray)) else html
        doc = json.loads(raw)
    except (UnicodeDecodeError, json.JSONDecodeError, ValueError):
        return "", "", "", ""
    docs = doc.get("documents") if isinstance(doc, dict) else doc
    if not docs:
        return "", "", "", ""
    passages = (docs[0] or {}).get("passages", []) or []
    title, body = title_body_from_passages(passages)
    fbytes = file_bytes(title, body)
    r_title, r_body, text = reload_text(fbytes)
    return r_title, r_body, fbytes, text


def extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body: pages(url, html, ...) -> CLEAN_TEXT rows."""
    for pdf in batches:
        recs = [extract_record(h) for h in pdf["html"]]
        yield pd.DataFrame(
            {
                "url": pdf["url"].values,
                "title": [r[0] for r in recs],
                "body": [r[1] for r in recs],
                "file_text": [r[2] for r in recs],
                "text": [r[3] for r in recs],
            }
        )


def clean_text_df(pages_df):
    """pages -> clean_text DataFrame (url, title, body, file_text, text).

    Column-pruned before the Python stage so Arrow only ships (url, html).
    """
    from ..schemas import CLEAN_TEXT

    return pages_df.select("url", "html").mapInPandas(extract_batches, schema=CLEAN_TEXT)
