"""Engine-owned lifecycle for ``localCheckpoint`` blocks (r15; r14 VERDICT
"Next round" #5).

``localCheckpoint`` pins its materialized RDD blocks in the session's
storage memory until someone unpersists them.  The query paths declare
checkpoints for multi-consumer intermediates (dedup signature passes, IVF
routing, crawl-loop state, CC label rounds); in a long-lived session those
blocks accumulated without bound — measured in r14 as end-of-session
re-runs degrading to 3-8x their in-loop time, worked around by a bench-side
scrub (``bench.py:release_leaked_blocks``).  This module moves ownership
into the engine:

- :func:`checkpoint` — ``df.localCheckpoint(eager=...)`` plus registration
  of the checkpointed RDD in the ACTIVE QUERY SCOPE.  With no scope active
  (direct library use, streaming state that manages its own lineage) it
  degrades to a bare ``localCheckpoint``.
- :func:`query_scope` — every ``catalog.ALL_QUERIES`` entry runs inside
  one.  Entering a new TOP-LEVEL scope first releases every block left by
  previously finished scopes: by the time the next query is being built,
  the previous query's consumer (its write/collect) has finished.  Nested
  builders (suite entries composing other entries) share the outer scope.
- :func:`release` — immediate targeted release for a checkpoint that is
  fully consumed INSIDE a builder (a collected edge list, a superseded
  iteration state, a frame whose derived result was itself materialized).
  This is the piece that bounds memory WITHIN one query: iterative
  algorithms release round N-1's blocks as soon as round N's checkpoint
  is materialized.

Contract: a DataFrame returned by a catalog query stays valid until the
next catalog query is BUILT — the stage-materialize posture the Pipeline
orchestrator already imposes (each stage's output is consumed before the
next stage starts).  For interleaved multi-query consumption set
``SPARK_GRAFT_KEEP_BLOCKS=1``: checkpoints stay pinned for the session
and the caller owns cleanup (the pre-r15 behavior).
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import DataFrame

__all__ = ["checkpoint", "release", "query_scope", "release_pending"]


def _keep_blocks() -> bool:
    return os.environ.get("SPARK_GRAFT_KEEP_BLOCKS", "").strip().lower() in (
        "1",
        "true",
        "yes",
        "on",
    )


# JVM RDD handles (not DataFrames: holding the py4j RDD object keeps release
# independent of the DataFrame's lifetime and costs one py4j call to drop).
_scope: list | None = None  # collecting while a top-level query builds
_pending: list = []  # finished scopes' RDDs, released at the next entry


def _ckpt_jrdd(df: DataFrame):
    """The JVM RDD a localCheckpointed DataFrame pins, or None.

    ``Dataset.localCheckpoint`` (eager or lazy) returns a Dataset over a
    ``LogicalRDD`` wrapping the internal RDD it marked persistent; that RDD
    is exactly what ``unpersist`` must hit.  Defensive: any plan shape that
    isn't a plain LogicalRDD yields None (caller skips registration).
    """
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() != "LogicalRDD":
            return None
        return plan.rdd()
    except Exception:
        return None


def checkpoint(df: DataFrame, eager: bool = True) -> DataFrame:
    """``df.localCheckpoint(eager=eager)`` with scope-registered blocks."""
    out = df.localCheckpoint(eager=eager)
    if _scope is not None and not _keep_blocks():
        jrdd = _ckpt_jrdd(out)
        if jrdd is not None:
            _scope.append(jrdd)
    return out


def release(df: DataFrame | None) -> None:
    """Immediately unpersist a checkpointed frame's blocks (async).

    For intermediates fully consumed inside a builder: the caller asserts
    nothing will evaluate ``df`` again.  No-op on None, non-checkpoint
    frames, and under ``SPARK_GRAFT_KEEP_BLOCKS=1`` (so an A/B of the
    lifecycle can hold everything pinned).
    """
    if df is None or _keep_blocks():
        return
    jrdd = _ckpt_jrdd(df)
    if jrdd is not None:
        try:
            jrdd.unpersist(False)
        except Exception:
            pass


def release_pending() -> None:
    """Release every block left by already-finished query scopes."""
    global _pending
    stale, _pending = _pending, []
    for jrdd in stale:
        try:
            jrdd.unpersist(False)
        except Exception:
            pass


@contextmanager
def query_scope():
    """Scope one top-level catalog query's checkpoint blocks.

    Entering a NEW top-level scope releases previous scopes' blocks
    (their consumers have finished — catalog queries are consumed before
    the next one is built).  Nested entries inherit the outer scope, so a
    suite's sub-builders register into the suite's scope.
    """
    global _scope, _pending
    if _scope is not None:  # nested builder: share the outer scope
        yield
        return
    if not _keep_blocks():
        release_pending()
    _scope = []
    try:
        yield
    finally:
        _pending.extend(_scope)
        _scope = None
