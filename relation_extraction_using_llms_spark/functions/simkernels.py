"""String-similarity kernels for the matcher family (SURVEY.md §2.9).

Self-contained implementations of the published algorithms the reference
delegates to third-party libs for (python-Levenshtein ``ratio``, jellyfish
``jaro_winkler_similarity``, fuzzywuzzy/rapidfuzz token ratios) — those libs
are optional imports in the reference (token_matcher.py:6-15,
levenshtein_matcher.py:6-17, jaro_winkler_matcher.py:6-11) and absent here,
so the algorithms are implemented from their public definitions.

Each ``*_similarity`` entry point reproduces one matcher's
``compute_text_similarity`` (normalization + kernel + containment boosts).
"""

from __future__ import annotations

import re
from functools import lru_cache

from .textnorm import norm_ws

# ---------------------------------------------------------------------------
# primitive kernels
# ---------------------------------------------------------------------------


def lcs_len(a: str, b: str) -> int:
    if not a or not b:
        return 0
    if len(a) < len(b):
        a, b = b, a
    prev = [0] * (len(b) + 1)
    for ca in a:
        cur = [0]
        append = cur.append
        for j, cb in enumerate(b):
            if ca == cb:
                append(prev[j] + 1)
            else:
                x, y = cur[j], prev[j + 1]
                append(x if x > y else y)
        prev = cur
    return prev[-1]


def indel_ratio(a: str, b: str) -> float:
    """python-Levenshtein ``ratio`` / rapidfuzz ``fuzz.ratio``/100:
    normalized indel similarity 2*LCS/(|a|+|b|) (substitution cost 2)."""
    total = len(a) + len(b)
    if total == 0:
        return 1.0
    return 2.0 * lcs_len(a, b) / total


def jaro(a: str, b: str) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    la, lb = len(a), len(b)
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    a_flags = [False] * la
    b_flags = [False] * lb
    matches = 0
    for i, ch in enumerate(a):
        lo, hi = max(0, i - window), min(lb, i + window + 1)
        for j in range(lo, hi):
            if not b_flags[j] and b[j] == ch:
                a_flags[i] = b_flags[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    transpositions = 0
    k = 0
    for i in range(la):
        if a_flags[i]:
            while not b_flags[k]:
                k += 1
            if a[i] != b[k]:
                transpositions += 1
            k += 1
    t = transpositions // 2
    m = float(matches)
    return (m / la + m / lb + (m - t) / m) / 3.0


def jaro_winkler(a: str, b: str, prefix_weight: float = 0.1) -> float:
    """Jaro-Winkler with the standard 0.7 boost threshold and 4-char
    prefix cap (jellyfish semantics)."""
    j = jaro(a, b)
    if j > 0.7:
        prefix = 0
        for ca, cb in zip(a[:4], b[:4]):
            if ca != cb:
                break
            prefix += 1
        j += prefix * prefix_weight * (1.0 - j)
    return j


# ---------------------------------------------------------------------------
# fuzzywuzzy-style token ratios (public algorithm; values in [0,1])
# ---------------------------------------------------------------------------

_NON_ALNUM = re.compile(r"[\W_]+", re.UNICODE)


def _full_process(s: str) -> str:
    return _NON_ALNUM.sub(" ", (s or "").lower()).strip()


def partial_ratio(a: str, b: str) -> float:
    """Best indel ratio of the shorter string against any equal-length
    window of the longer."""
    if not a or not b:
        return 0.0
    shorter, longer = (a, b) if len(a) <= len(b) else (b, a)
    m = len(shorter)
    if m == 0:
        return 0.0
    best = 0.0
    for i in range(len(longer) - m + 1):
        r = indel_ratio(shorter, longer[i : i + m])
        if r > best:
            best = r
            if best == 1.0:
                return 1.0
    return best


def token_sort_ratio(a: str, b: str) -> float:
    sa = " ".join(sorted(_full_process(a).split()))
    sb = " ".join(sorted(_full_process(b).split()))
    return indel_ratio(sa, sb)


def token_set_ratio(a: str, b: str) -> float:
    ta, tb = set(_full_process(a).split()), set(_full_process(b).split())
    if not ta or not tb:
        return 0.0
    inter = " ".join(sorted(ta & tb))
    combined_a = (inter + " " + " ".join(sorted(ta - tb))).strip()
    combined_b = (inter + " " + " ".join(sorted(tb - ta))).strip()
    return max(
        indel_ratio(inter, combined_a),
        indel_ratio(inter, combined_b),
        indel_ratio(combined_a, combined_b),
    )


def wratio(a: str, b: str) -> float:
    """fuzzywuzzy WRatio: base ratio blended with token ratios (x0.95) and,
    for very different lengths, partial ratios (x0.90)."""
    pa, pb = _full_process(a), _full_process(b)
    if not pa or not pb:
        return 0.0
    base = indel_ratio(pa, pb)
    len_ratio = max(len(pa), len(pb)) / max(1, min(len(pa), len(pb)))
    unbase_scale = 0.95
    if len_ratio < 1.5:
        return max(
            base,
            token_sort_ratio(a, b) * unbase_scale,
            token_set_ratio(a, b) * unbase_scale,
        )
    partial_scale = 0.90 if len_ratio < 8 else 0.60
    return max(
        base,
        partial_ratio(pa, pb) * partial_scale,
        _partial_token_sort(pa, pb) * unbase_scale * partial_scale,
        _partial_token_set(pa, pb) * unbase_scale * partial_scale,
    )


def _partial_token_sort(pa: str, pb: str) -> float:
    return partial_ratio(" ".join(sorted(pa.split())), " ".join(sorted(pb.split())))


def _partial_token_set(pa: str, pb: str) -> float:
    ta, tb = set(pa.split()), set(pb.split())
    if not ta or not tb:
        return 0.0
    inter = " ".join(sorted(ta & tb))
    if inter:
        return 1.0  # non-empty intersection is a full partial-set match
    return partial_ratio(" ".join(sorted(ta)), " ".join(sorted(tb)))


# ---------------------------------------------------------------------------
# per-matcher compute_text_similarity equivalents
# ---------------------------------------------------------------------------


@lru_cache(maxsize=1 << 16)
def jaccard_similarity(t1: str, t2: str) -> float:
    """jaccard_matcher.py:60-105: token Jaccard with subset boost 0.75 and
    substring boost 0.80; normalized equality -> 1.0."""
    if not t1 or not t2:
        return 0.0
    n1, n2 = norm_ws(t1), norm_ws(t2)
    if n1 == n2:
        return 1.0
    tok1, tok2 = set(n1.split()), set(n2.split())
    if not tok1 and not tok2:
        return 1.0
    if not tok1 or not tok2:
        return 0.0
    sim = len(tok1 & tok2) / len(tok1 | tok2)
    if tok1 <= tok2 or tok2 <= tok1:
        sim = max(sim, 0.75)
    if n1 in n2 or n2 in n1:
        sim = max(sim, 0.80)
    return sim


@lru_cache(maxsize=1 << 16)
def token_similarity(t1: str, t2: str) -> float:
    """token_matcher.py:63-122: max(token_set, partial, WRatio) with
    substring boost 0.80 and token-subset boost 0.75."""
    if not t1 or not t2:
        return 0.0
    n1, n2 = norm_ws(t1), norm_ws(t2)
    if n1 == n2:
        return 1.0
    sim = max(token_set_ratio(t1, t2), partial_ratio(t1, t2), wratio(t1, t2))
    if n1 in n2 or n2 in n1:
        sim = max(sim, 0.80)
    tok1, tok2 = set(n1.split()), set(n2.split())
    if tok1 and tok2 and (tok1 <= tok2 or tok2 <= tok1):
        sim = max(sim, 0.75)
    return sim


@lru_cache(maxsize=1 << 16)
def levenshtein_similarity(t1: str, t2: str) -> float:
    """levenshtein_matcher.py:62-118: indel ratio on normalized text with
    containment floor 0.80."""
    if not t1 or not t2:
        return 0.0
    n1, n2 = norm_ws(t1), norm_ws(t2)
    if n1 == n2:
        return 1.0
    base = 0.80 if (n1 in n2 or n2 in n1) else 0.0
    return max(base, indel_ratio(n1, n2))


@lru_cache(maxsize=1 << 16)
def jaro_winkler_similarity(t1: str, t2: str) -> float:
    """jaro_winkler_matcher.py:55-90: JW on normalized text with
    containment floor 0.80."""
    if not t1 or not t2:
        return 0.0
    n1, n2 = norm_ws(t1), norm_ws(t2)
    if n1 == n2:
        return 1.0
    base = 0.80 if (n1 in n2 or n2 in n1) else 0.0
    return max(base, jaro_winkler(n1, n2))
