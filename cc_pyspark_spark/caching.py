"""Cache lifecycle tracking for operator-internal ``persist()`` calls.

Operators like MinHash-LSH, sign-LSH, PageRank, and alternating-star CC
persist intermediate frames because their plans reference the same
subtree several times (band tables are self-joined, signature UDFs feed
both banding and verification, adjacency is reused every iteration).
The *returned* plan still references those cached frames, so the
operator cannot unpersist before the caller materializes the result —
in a long-lived session repeated invocations would otherwise accumulate
cached blocks until LRU eviction pressure (ADVICE r8).

``tracked_persist`` persists at MEMORY_AND_DISK (spill-safe: an
operator-internal cache must never OOM an executor at 100 TB) and
records the frame in a module-level registry; ``release_caches()``
unpersists everything recorded.  Call it once the consuming action has
run — the runner does after each job's write, and ``bench.py`` does
between queries.  Strong references are intentional: a garbage-
collected Python DataFrame wrapper does NOT unpersist its JVM-side
blocks, so a weak registry would silently leak exactly the blocks this
module exists to free.  Releasing early is always *correct* (Spark
recomputes), only slower.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_TRACKED: list[DataFrame] = []


def tracked_persist(
    df: DataFrame,
    level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
) -> DataFrame:
    """persist(level) + register for a later ``release_caches()``."""
    df.persist(level)
    _TRACKED.append(df)
    return df


def release_caches() -> int:
    """Unpersist every tracked frame; returns how many were released.

    Safe to call at any time (plans referencing a released frame simply
    recompute) and after session teardown (errors are swallowed — the
    JVM cache died with the session).
    """
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:  # noqa: BLE001 — session already gone
            pass
    return n


def track_cache(df: DataFrame) -> DataFrame:
    """Register an already-persisted frame for ``release_caches()``.

    Designed for method chains via ``.persist().transform(track_cache)``
    so operator code keeps its declarative shape.
    """
    _TRACKED.append(df)
    return df


def tracked_count() -> int:
    """How many frames are currently registered (for tests/monitoring)."""
    return len(_TRACKED)
