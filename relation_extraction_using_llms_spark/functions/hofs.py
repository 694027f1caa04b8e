"""Helpers for higher-order-function column expressions.

Spark evaluates HOF lambdas interpreted (no whole-stage codegen, no
common-subexpression elimination), and CollapseProject inlines referenced
projections into lambda bodies.  An expression like
``transform(idx, i -> slice(split(text), i, n))`` therefore re-runs the
split once per array ELEMENT — a silent O(len^2) blowup (measured 7x on
the dedup shingle path at 120k docs).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def bind_once(value_expr: Column, body) -> Column:
    """Let-binding for HOF expressions: evaluate ``value_expr`` ONCE per
    row and pass it to ``body`` as a lambda variable.

    Implementation: wrap the value in a one-element array and transform
    over it — the outer transform's argument is evaluated once per row,
    and inside ``body`` the lambda variable is a plain runtime reference
    that the optimizer cannot re-inline.

        shingles = bind_once(
            F.split(F.col("text"), " "),
            lambda t: F.transform(idx(t), lambda i: F.slice(t, i, 3)),
        )
    """
    return F.element_at(F.transform(F.array(value_expr), body), 1)
