"""Bounded scratch-cache registry for per-query persisted intermediates.

Several operators persist a bounded intermediate frame that multiple
branches of ONE query tree consume (e.g. replication_actions' replica⋈dim
anchor). The persist must outlive the function return — the caller
materializes the lazy result — so an in-function unpersist is impossible,
but never unpersisting accumulates cached blocks across repeated
invocations in one session (bench runs 3×45 queries; endpoint reuse).

The contract here: each operator calls :func:`fresh` on entry, which
releases every frame the SAME operator persisted on its previous
invocation (safely materialized by then — callers consume results before
re-invoking), then registers new persists via :func:`keep`. Cached-block
footprint is thereby bounded at one invocation per operator instead of
growing without limit (ADVICE r5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_SCRATCH: dict[str, list[DataFrame]] = {}


def fresh(tag: str) -> None:
    """Release frames persisted under ``tag`` by a previous invocation."""
    for df in _SCRATCH.pop(tag, []):
        try:
            df.unpersist(False)
        except Exception:
            pass  # session gone / already unpersisted — nothing to free


def keep(tag: str, df: DataFrame) -> DataFrame:
    """Persist ``df`` and register it for release by the next
    same-``tag`` :func:`fresh` call."""
    df = df.persist()
    _SCRATCH.setdefault(tag, []).append(df)
    return df
