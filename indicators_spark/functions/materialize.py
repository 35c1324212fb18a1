"""Shared-subtree materialization for returned-lazy operators.

A function that RETURNS a lazy DataFrame whose plan reads one expensive
subtree from several branches has exactly two bad options: ``persist()``
leaks a session-lifetime SQL-cache entry (no clean unpersist point — the
caller consumes the result after the function returned; ADVICE r7), and
no materialization executes the subtree once per branch.  The good
option is an eager ``localCheckpoint``: blocks are GC-freed with the
returned result, the subtree runs once, and nothing outlives the caller.

The one cost is plan OPACITY: a checkpoint truncates lineage to a
``LogicalRDD``, so plan-inspection tests (the CartesianProduct sweep,
exchange pins) would silently stop seeing everything beneath it — and
eager checkpointing at plan-construction time makes "build the plan,
assert on it" tests execute the subtree.  :data:`EAGER` exists for those
tests: monkeypatching it to ``False`` keeps the full lazy plan visible
(strictly MORE plan surface than production, where the cut can only hide
operators the sweep already approved).  Production code never flips it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: Tests monkeypatch this to False so plan sweeps see through the
#: checkpoint cut; production always materializes.
EAGER = True


def shared(df: DataFrame) -> DataFrame:
    """Materialize a shared subtree once (eager localCheckpoint), or
    pass it through untouched when plan-inspection mode is on."""
    if not EAGER:
        return df
    return df.localCheckpoint(eager=True)


def shared_lazy(df: DataFrame) -> DataFrame:
    """Like :func:`shared`, but the checkpoint materializes with the
    FIRST action that consumes it instead of spending a dedicated job
    right now.  For superstep loops whose state is both aggregated
    (driver fold) and carried into the next step, this folds the
    materialization into the aggregation job — half the Spark jobs per
    step, same blocks, same lineage cut.  Only correct when some action
    reads the returned frame before (or instead of) the next state
    build; a frame that is only ever re-derived would silently keep its
    full lineage."""
    if not EAGER:
        return df
    return df.localCheckpoint(eager=False)
