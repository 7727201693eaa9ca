"""Expression-level let binding: evaluate an expensive array/struct
expression ONCE per row and reference it many times.

Why this exists: Spark's whole-stage codegen eliminates common
subexpressions within a projection, but NOT inside higher-order-
function lambdas — every reference to an outer expression from a
``transform``/``filter`` lambda body, and every repeated reference
across a collapsed projection's fields, re-evaluates the full subtree
per element. The measured failure mode: winnowing's windowed
``array_min`` over a derived md5-gram array re-ran the O(n·K) gram
hashing for each of the n windows — O(n²) md5 calls per document,
197 s at sf0.1 versus 2.5 s bound (llm/dedup.py).

``let1(value, body)`` rewrites ``body(value)`` as
``transform(array(value), v -> body(v))[0]``: the single-element array
forces one evaluation of ``value`` per row, and the lambda variable is
a cheap slot reference everywhere ``body`` uses it. This stays a pure
Column expression — fully codegen'd, no DataFrame barrier, no
localCheckpoint memory pin — so it composes anywhere, including inside
other lambdas (nest for multiple bindings). Null flows through
unchanged: ``array(NULL)`` is a one-element array holding NULL, and
``body`` sees NULL exactly as it would have.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def let1(value: Column, body: Callable[[Column], Column]) -> Column:
    """``let v = value in body(v)`` — one evaluation of ``value`` per
    row regardless of how many times ``body`` references it."""
    return F.transform(F.array(value), body)[0]
