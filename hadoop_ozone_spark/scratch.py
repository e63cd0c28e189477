"""Bounded scratch-cache registry for per-query persisted intermediates.

Several operators persist a bounded intermediate frame that multiple
branches of ONE query tree consume (e.g. replication_actions' replica⋈dim
anchor). The persist must outlive the function return — the caller
materializes the lazy result — so an in-function unpersist is impossible,
but never unpersisting accumulates cached blocks across repeated
invocations with CHANGING inputs in one session (streaming per-batch
planning, endpoint reuse over evolving planes) (ADVICE r5).

The contract: each operator calls :func:`fresh` on entry (resets the
tag's slot cursor), then registers each persisted frame via :func:`keep`.
``keep`` compares the new frame against the frame the SAME slot held on
the previous invocation using Spark's own plan-equivalence test
(``analyzed().sameResult``) — the exact test CacheManager uses for cache
dedup:

- same plan (the bench/endpoint replay case) → the previous persisted
  frame is returned and its cache REUSED — repeated identical queries
  keep their steady-state cache hits;
- different plan (new micro-batch, different inputs) → the previous
  generation is unpersisted and replaced, so the cached-block footprint
  stays bounded at one live generation per slot.

Unpersisting only on plan CHANGE matters for a second reason: identical
plans share one CacheManager entry, so unpersisting an old same-plan
frame would silently drop the entry the new frame is using.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_SLOTS: dict[str, list[DataFrame]] = {}
_CURSOR: dict[str, int] = {}


def fresh(tag: str) -> None:
    """Reset ``tag``'s slot cursor at operator entry. Slots beyond the
    count the previous invocation used are released lazily by the next
    :func:`keep` walk; the generation count per slot stays at one."""
    _CURSOR[tag] = 0


def _same_plan(a: DataFrame, b: DataFrame) -> bool:
    try:
        return bool(
            a._jdf.queryExecution().analyzed().sameResult(
                b._jdf.queryExecution().analyzed()
            )
        )
    except Exception:
        return False


def keep(tag: str, df: DataFrame) -> DataFrame:
    """Persist ``df`` in the tag's next slot, reusing the previous
    invocation's cached frame when the plan is semantically identical."""
    i = _CURSOR.get(tag, 0)
    _CURSOR[tag] = i + 1
    slots = _SLOTS.setdefault(tag, [])
    if i < len(slots):
        old = slots[i]
        if _same_plan(old, df):
            return old  # steady-state cache hit across invocations
        try:
            old.unpersist(False)
        except Exception:
            pass  # session gone / already unpersisted
        slots[i] = df.persist()
        return slots[i]
    df = df.persist()
    slots.append(df)
    return df
