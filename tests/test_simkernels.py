"""Unit tests for the self-contained similarity kernels (hand-computed
values; the third-party libs these reimplement are absent here, for the
reference too)."""

from __future__ import annotations

import pytest

from relation_extraction_using_llms_spark.functions import simkernels as K


def test_lcs_and_indel_ratio():
    assert K.lcs_len("abcde", "ace") == 3
    assert K.lcs_len("", "abc") == 0
    assert K.indel_ratio("abc", "abc") == 1.0
    assert K.indel_ratio("", "") == 1.0
    # python-Levenshtein.ratio("kitten","sitting"): lcs=4 -> 8/13
    assert K.indel_ratio("kitten", "sitting") == pytest.approx(8 / 13)
    assert K.indel_ratio("abcd", "wxyz") == 0.0


def test_jaro_known_values():
    # classic textbook cases
    assert K.jaro("MARTHA", "MARHTA") == pytest.approx(0.944444, abs=1e-5)
    assert K.jaro("DIXON", "DICKSONX") == pytest.approx(0.766667, abs=1e-5)
    assert K.jaro_winkler("MARTHA", "MARHTA") == pytest.approx(0.961111, abs=1e-5)
    assert K.jaro_winkler("DIXON", "DICKSONX") == pytest.approx(0.813333, abs=1e-5)
    assert K.jaro("", "") == 1.0
    assert K.jaro("a", "") == 0.0
    assert K.jaro_winkler("same", "same") == 1.0


def test_jaro_winkler_boost_threshold():
    # below 0.7 jaro, no prefix boost applied (jellyfish semantics)
    a, b = "abcdef", "abzzzz"
    j = K.jaro(a, b)
    assert j <= 0.7
    assert K.jaro_winkler(a, b) == j


def test_token_ratios():
    # identical token multisets in different order
    assert K.token_sort_ratio("b a c", "a b c") == 1.0
    # token_set: subset -> 1.0 (intersection vs itself+diff)
    assert K.token_set_ratio("spark engine", "the spark engine runs") == 1.0
    assert K.token_set_ratio("alpha beta", "gamma delta") < 0.5
    # partial: exact substring window
    assert K.partial_ratio("abc", "zzabczz") == 1.0
    assert K.partial_ratio("", "abc") == 0.0


def test_wratio_bounds_and_monotonicity():
    assert 0.0 <= K.wratio("alpha beta", "beta alpha gamma") <= 1.0
    assert K.wratio("same text", "same text") == 1.0
    assert K.wratio("abc", "") == 0.0
    # long-vs-short goes through the partial branch (x0.9 scale)
    long = "the quick brown fox jumps over the lazy dog " * 2
    assert K.wratio("quick brown fox", long) == pytest.approx(0.9 * 0.95, abs=0.06)
    # extreme length ratio (>8) drops the partial scale to 0.6 (fuzzywuzzy)
    very_long = "the quick brown fox jumps over the lazy dog " * 3
    assert K.wratio("quick brown fox", very_long) == pytest.approx(0.6, abs=0.05)


def test_matcher_similarity_wrappers():
    assert K.jaccard_similarity("A B c", "a b C") == 1.0  # normalized equality
    assert K.jaccard_similarity("a c", "a b c d") == pytest.approx(0.75)  # subset boost
    assert K.jaccard_similarity("iodide transport", "the iodide transport defect") == pytest.approx(0.80)
    assert K.levenshtein_similarity("kitten", "sitting") == pytest.approx(8 / 13)
    assert K.levenshtein_similarity("abc", "zz abc zz") == pytest.approx(0.80)
    assert K.jaro_winkler_similarity("abc", "zz abc zz") >= 0.80
    assert K.token_similarity("fox", "quick brown fox") >= 0.75
    for fn in (
        K.jaccard_similarity,
        K.token_similarity,
        K.levenshtein_similarity,
        K.jaro_winkler_similarity,
    ):
        assert fn("", "x") == 0.0
        assert fn(None, "x") == 0.0
        assert fn("x", "x") == 1.0
