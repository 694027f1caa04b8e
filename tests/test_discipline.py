"""Engineering-discipline audits: no per-row Python UDFs, no RDD maps,
no driver-side collect loops inside operators (input_hint: vectorized
pandas/Arrow UDFs only)."""

from __future__ import annotations

import pathlib
import re

PKG = pathlib.Path(__file__).parent.parent / "relation_extraction_using_llms_spark"

FORBIDDEN = [
    (re.compile(r"\bF\.udf\(|\budf\(lambda"), "row-at-a-time F.udf"),
    (re.compile(r"\.rdd\.map|\.rdd\.flatMap|\bsc\.parallelize"), "RDD map path"),
    (re.compile(r"\.toPandas\(\)"), "driver-side full materialization"),
]

ALLOWED_COLLECT = {
    # none: operators must not collect; tests/bench drive actions.
}


def _py_files():
    return [p for p in PKG.rglob("*.py")]


def test_no_forbidden_constructs():
    offenders = []
    for path in _py_files():
        src = path.read_text()
        for pat, label in FORBIDDEN:
            if pat.search(src):
                offenders.append((str(path), label))
    assert not offenders, offenders


def test_no_collect_inside_operators():
    """Data collects are forbidden; tiny driver-side metadata reads must be
    explicitly marked '# driver-metadata collect'."""
    offenders = []
    for path in _py_files():
        for line in path.read_text().splitlines():
            if ".collect()" in line and "driver-metadata collect" not in line:
                offenders.append((str(path), line.strip()))
    assert not offenders, offenders


def test_pandas_udfs_are_batched():
    """Every mapInPandas/applyInPandas body must take iterator/frame args,
    and the package must import pandas only inside UDF modules (cheap
    executor import)."""
    n_vectorized = 0
    for path in _py_files():
        src = path.read_text()
        n_vectorized += src.count("mapInPandas") + src.count("applyInPandas")
    assert n_vectorized >= 6  # the Python surface is Arrow-batched
