"""Cache-handle plumbing for operators that persist() intermediates.

Several dedup/similarity operators persist a subtree that both sides of a
self-join consume (signatures, inverted indexes). The persist must outlive
the returned DataFrame's FIRST materialization — unpersisting inside the
operator would forfeit the reuse it exists for — so the operator instead
TAGS the returned DataFrame with its cached intermediates and the caller
releases them once done (round-3 advice: repeated calls in a long-lived
session otherwise accumulate cached blocks until LRU eviction churn).

    pairs = minhash_lsh_pairs(docs)
    pairs.count()          # or write/collect — materialize while cached
    release_cache(pairs)   # drop the pinned blocks

Leaving the cache pinned is harmless for one-shot jobs (executor teardown
frees it); ``release_cache`` matters for long-lived sessions and loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_ATTR = "_cdc_cached"


def tag_cached(out: DataFrame, cached: list[DataFrame]) -> DataFrame:
    """Record ``cached`` (persisted intermediates) on ``out`` for a later
    :func:`release_cache`. Tags compose: re-tagging extends the list."""
    existing = list(getattr(out, _ATTR, []))
    setattr(out, _ATTR, existing + list(cached))
    return out


def release_cache(df: DataFrame, blocking: bool = False) -> int:
    """Unpersist every intermediate an operator cached while building
    ``df``. Call after materializing ``df`` (count/write/collect); the
    DataFrame stays valid afterwards — a re-materialization just
    recomputes. Returns the number of handles released."""
    cached = getattr(df, _ATTR, [])
    for c in cached:
        c.unpersist(blocking=blocking)
    if cached:
        setattr(df, _ATTR, [])
    return len(cached)
