"""Bounded retention for operator-internal persisted subtrees.

Several pipeline operators persist a subtree their returned plan
consumes more than once (MinHash signatures, SimHash table, filtered
shingles, winnowing fingerprints, SRP buckets). The caller's first
action is invisible here, so those caches cannot be unpersisted inside
the operator — but never unpersisting leaks one cached DataFrame per
call for the application lifetime (the r3 ADVICE defect class, fixed
for the EMA scan in operators/ema.py).

Policy: each operator calls ``begin_op()`` on entry, releasing every
subtree cached by PREVIOUS operator builds, then registers its own via
``keep()``. Retention is therefore bounded by one operator call.
Callers that build several pipeline queries before materializing any
either accept a recompute of the earlier ones or call the operators in
materialization order; ``release_caches()`` frees everything
explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list = []


def begin_op() -> None:
    """Release subtrees cached by previous operator builds."""
    while _LIVE:
        try:
            _LIVE.pop().unpersist()
        except Exception:  # noqa: BLE001 — session may already be stopped
            pass


def keep(df: DataFrame) -> DataFrame:
    """Persist ``df`` and track it for release at the next ``begin_op``."""
    df = df.persist()
    _LIVE.append(df)
    return df


def release_caches() -> None:
    """Explicitly release every tracked cached subtree."""
    begin_op()
