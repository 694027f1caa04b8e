"""Text normalization + similarity kernels (pure Python, UDF-side).

These are the scalar kernels the validator, entity resolver and fuzzy
matchers share.  Semantics mirror the reference (cited per function); the
code is original.  All callers are Arrow-batched pandas UDFs or
``applyInPandas`` bodies — these functions never run row-at-a-time through
``F.udf``.
"""

from __future__ import annotations

import re
import string
from difflib import SequenceMatcher
from functools import lru_cache

_WS = re.compile(r"\s+")
_NON_WORD = re.compile(r"[^\w\s]")
_PUNCT_TABLE = str.maketrans("", "", string.punctuation)

# Stop words for core-term extraction (reference entity_resolver.py:144-162).
STOP_WORDS = frozenset(
    """the a an and or but in on at to for of with by from as is was are were be been
    have has had do does did will would could should""".split()
)

# Leading-quantifier prefix, e.g. "15 nucleotide (nt) deletion ..." -> "deletion ..."
# (reference text_matcher.py:129-153).
_QUANTIFIER_PREFIX = re.compile(
    r"^\d+\s*(?:nucleotide|nt|amino\s*acid|aa|base\s*pair|bp)?\s*(?:\([^)]+\))?\s*",
    re.IGNORECASE,
)


@lru_cache(maxsize=1 << 17)
def norm_ws(text: str | None) -> str:
    """Lowercase + trim + collapse whitespace (text_matcher.py:105-127 —
    punctuation is KEPT here)."""
    if not text:
        return ""
    return _WS.sub(" ", text.lower().strip())


@lru_cache(maxsize=1 << 17)
def norm_full(text: str | None) -> str:
    """Lowercase, strip punctuation, collapse whitespace
    (entity_resolver.py:120-142)."""
    if not text:
        return ""
    return " ".join(text.lower().translate(_PUNCT_TABLE).split())


@lru_cache(maxsize=1 << 17)
def norm_alnum(text: str | None) -> str:
    """Lowercase + drop non-word chars + collapse whitespace
    (validator.py:100-107 variant used for mention-in-text checks)."""
    if not text:
        return ""
    return " ".join(_NON_WORD.sub("", text.lower()).split())


@lru_cache(maxsize=1 << 17)
def core_terms(text: str | None) -> frozenset[str]:
    """Stop-word-filtered terms of length > 2 over ``norm_full`` output
    (entity_resolver.py:144-162).  Frozen + memoized: called once per
    (mention, entity, step) in the resolver cascade."""
    return frozenset(
        w for w in norm_full(text).split() if w not in STOP_WORDS and len(w) > 2
    )


@lru_cache(maxsize=1 << 17)
def seq_ratio(a: str, b: str) -> float:
    """difflib ratio — used verbatim (not approximated) for parity with the
    reference's SequenceMatcher calls (SURVEY.md §7.3 risk 3).  Memoized:
    surface forms repeat heavily across documents/combos, and the function
    is pure."""
    return SequenceMatcher(None, a, b).ratio()


def core_phrase(text: str | None) -> str:
    """Strip a leading numeric quantifier prefix when it leaves a meaty core
    (text_matcher.py:129-153)."""
    normalized = norm_ws(text)
    stripped = _QUANTIFIER_PREFIX.sub("", normalized)
    if stripped != normalized and len(stripped) > 10:
        return stripped.strip()
    return normalized


@lru_cache(maxsize=1 << 17)
def text_similarity(a: str | None, b: str | None) -> float:
    """The default ('text' strategy) mention-similarity kernel
    (text_matcher.py:158-216): normalized equality -> 1.0; else
    SequenceMatcher ratio with containment boost 0.85 and a core-phrase
    retry boosted to 0.90 on containment."""
    if not a or not b:
        return 0.0
    na, nb = norm_ws(a), norm_ws(b)
    if na == nb:
        return 1.0
    sim = seq_ratio(na, nb)
    if na in nb or nb in na:
        sim = max(sim, 0.85)
    ca, cb = core_phrase(a), core_phrase(b)
    if ca != na or cb != nb:
        core_sim = seq_ratio(ca, cb)
        if ca in cb or cb in ca:
            core_sim = max(core_sim, 0.90)
        sim = max(sim, core_sim)
    return sim


def jaccard(a: set, b: set) -> float:
    if not a or not b:
        return 0.0
    inter = len(a & b)
    if inter == 0:
        return 0.0
    return inter / len(a | b)


def mention_in_text(mention: str | None, text: str | None, strict: bool = False) -> bool:
    """Mention-presence validation cascade (validator.py:64-120): exact
    containment when strict; else case-insensitive containment ->
    normalized containment -> (for >3-word mentions) >=60% word overlap."""
    if not mention or not text:
        return False
    mention = mention.strip()
    if not mention:
        return False
    if strict:
        return mention in text
    m_low, t_low = mention.lower(), text.lower()
    if m_low in t_low:
        return True
    m_norm, t_norm = norm_alnum(m_low), norm_alnum(t_low)
    if m_norm and m_norm in t_norm:
        return True
    if len(mention.split()) > 3:
        m_words = set(m_norm.split())
        if m_words:
            t_words = set(t_norm.split())
            return len(m_words & t_words) / len(m_words) >= 0.6
    return False


def confidence_score(head: str, tail: str, text: str) -> float:
    """Confidence assignment (validator.py:167-205): 0.5 base, +0.2 per
    strict hit, +0.1 when both pass the loose check, capped at 1.0."""
    conf = 0.5
    if mention_in_text(head, text, strict=True):
        conf += 0.2
    if mention_in_text(tail, text, strict=True):
        conf += 0.2
    if mention_in_text(head, text) and mention_in_text(tail, text):
        conf += 0.1
    return min(1.0, conf)
