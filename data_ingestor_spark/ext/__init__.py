"""Large-scale training-data pipeline extensions (BASELINE.json north
star): deduplication, similarity search, text analysis, multimodal
column plumbing. All designed shuffle-light for 100 TB: LSH banding
instead of O(n²) pairing, broadcast query vectors, built-in expressions
in the hot path, Pandas UDFs only where arrays must meet numpy.
"""

from __future__ import annotations


def free_local_checkpoint(df) -> None:
    """Release the executor-storage blocks behind a checkpoint handle
    the moment nothing can read it again (r14 optimization, guide §5:
    "unpersist when done").

    Iterative operators (connected components, PageRank, graph walks)
    materialize every round with ``localCheckpoint(eager=True)``; the
    superseded rounds' blocks otherwise linger in executor storage until
    the driver-side handle is garbage-collected AND a JVM GC lets
    ContextCleaner notice (SparkContext holds persisted RDDs weakly, and
    the cleaner's fallback periodic GC fires every 30 min) — at 100 TB
    that is |E|- and |V|-sized dead state competing with execution
    memory for the rest of the job.

    Only call this when the checkpoint is provably dead: a later round's
    EAGER checkpoint has been materialized and the operator's returned
    plan does not reference this one. A localCheckpoint cannot be
    recomputed after its blocks are dropped (lineage is truncated), so a
    wrong call fails loudly with "checkpoint block not found", not with
    wrong results.

    Best-effort by design: ``df`` must be the checkpoint handle itself
    (its analyzed plan is the ``LogicalRDD`` wrapping the persisted
    RDD). Anything else — including reliable ``checkpoint()`` handles,
    whose blocks live in the checkpoint dir, not block storage — is a
    silent no-op, as is any py4j hiccup."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            plan.rdd().unpersist(False)
    except Exception:
        pass
