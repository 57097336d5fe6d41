"""Registry-scoped persist hook for OPERATOR-internal caches.

Invariant 26 (``queries.cached``) scopes persists created inside a
registered query's own builder, but several operators (the MinHash /
SimHash / span-ladder kernels) persist an intermediate internally —
the signature table that feeds both the band explode and the
verification join. Those persists are correct per-call but UNTRACKED:
a long-lived session running many registered queries (the driver's
50-query window, the bench loop) would accumulate one dead
InMemoryRelation per invocation.

``persist_tracked`` is the operators' persist: it always persists, and
when the query registry has installed its tracker (``queries`` does so
at import), the cache also joins the registry's per-query release
list — built-next-query / release_caches() frees it. Standalone
operator use (no registry imported) keeps plain persist semantics.
Unpersisting a tracked frame twice is a Spark no-op, so operators that
already release explicitly (connected_components, the telemetry
probes) can be tracked too."""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame

_TRACKER: Optional[Callable[[DataFrame], None]] = None


def set_tracker(fn: Callable[[DataFrame], None]) -> None:
    global _TRACKER
    _TRACKER = fn


def persist_tracked(df: DataFrame) -> DataFrame:
    df.persist()
    if _TRACKER is not None:
        _TRACKER(df)
    return df
