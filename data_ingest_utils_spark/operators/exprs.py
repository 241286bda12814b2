"""Shared Column-expression utilities.

Currently one citizen: :func:`let_bind`, the one-element-array
let-binding that keeps interpreted higher-order-function lambdas from
re-evaluating captured expression trees per element.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def let_bind(bound: Column, body) -> Column:
    """Let-bind an expensive expression for use inside a higher-order
    lambda: HOFs run interpreted, so a captured expression TREE is
    re-evaluated on every lambda call — a whole-vector aggregate
    (norm, max-abs) captured in a per-element transform turns O(dim)
    work into O(dim²) per row, and a captured ``split`` in a shingle
    transform turned shingling O(tokens²) per doc (measured 7.5× on
    text.shingles, round 13).  ``transform(array(bound), v ->
    body(v))`` evaluates ``bound`` once and hands the lambda a
    variable reference; byte-identical results.  Bound column
    REFERENCES (``F.col``) are already cheap — only expression trees
    need this."""
    return F.element_at(F.transform(F.array(bound), body), 1)
