"""Lineage-cut helper for iterative / multi-consumer plans.

The iterative operators (connected components, pagerank) and the
multi-reference plans (triangle census, SemDeDup medoids) materialize a
small intermediate frame once so each iteration / consumer does not
re-execute the expensive upstream pipeline.  HOW that cut is stored is
an execution-environment decision (VERDICT r7 task #7):

- ``localCheckpoint`` (the default): partitions are stored on the
  EXECUTORS that computed them — no durable-storage round-trip, the
  right call on ``local[N]`` and on clusters with stable executors.
  The cost at scale: it PINS those executors (dynamic allocation cannot
  release them while the checkpoint is referenced) and a lost executor
  loses its partitions with no lineage left to recompute them — the job
  fails instead of self-healing.
- ``checkpoint`` (reliable): partitions are written to the directory
  set via ``sparkContext.setCheckpointDir`` (HDFS/S3) — survives any
  executor loss and releases the executors, at the price of one durable
  write+read.  The frames cut here are tiny relative to their inputs
  (near-dup edge lists, top-K edges, label frames), so the durable
  round-trip is cheap insurance on preemptible/spot clusters.

Knob (runtime-settable, read per cut)::

    spark.conf.set("spark.merl.checkpoint.reliable", "true")
    spark.sparkContext.setCheckpointDir("hdfs://.../checkpoints")

See ARCHITECTURE.md "Lineage cuts" for the full trade discussion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

RELIABLE_CONF = "spark.merl.checkpoint.reliable"


def cut_lineage(df: DataFrame, eager: bool = True) -> DataFrame:
    """Materialize ``df`` and truncate its lineage — executor-local by
    default, durable when ``spark.merl.checkpoint.reliable=true``."""
    spark = df.sparkSession
    reliable = (spark.conf.get(RELIABLE_CONF, "false") or "").lower()
    if reliable == "true":
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
