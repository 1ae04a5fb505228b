"""Lineage truncation for iterative fixpoints and self-overwrite reads.

Iterative DataFrame algorithms (connected components, PageRank, BFS,
k-core, label iteration) must truncate lineage every round or the
physical plan grows without bound.  ``localCheckpoint`` does that with
zero I/O, but it stores the materialized blocks on EXECUTORS: on a real
cluster, losing one executor mid-iteration makes the job unrecoverable
(lineage is already cut, blocks are gone).  Reliable
``DataFrame.checkpoint`` writes the blocks to the fault-tolerant
checkpoint directory instead, surviving executor loss at the cost of a
write per truncation.

``truncate_lineage`` picks automatically:

* if a reliable checkpoint directory is configured — either via
  ``SparkContext.setCheckpointDir`` (the normal cluster-submit path) or
  the ``TSAUG_SPARK_CHECKPOINT_DIR`` environment variable (set once in
  spark-submit ``--conf spark.executorEnv``-free driver env; the helper
  installs it on first use) — every truncation is a reliable
  ``checkpoint``;
* otherwise (the local / test default) it is a ``localCheckpoint``,
  exactly the previous behavior.

Both modes materialize the same rows; tests run the fixpoint operators
under both and assert identical output (tests/test_reliable_checkpoint.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

#: Env override: set to a directory (local path or HDFS/S3 URI on a real
#: cluster) to switch every fixpoint truncation to reliable checkpoints.
ENV_CHECKPOINT_DIR = "TSAUG_SPARK_CHECKPOINT_DIR"


def _reliable_dir(df: DataFrame) -> str | None:
    """The configured reliable checkpoint dir, installing the env-var
    override into the SparkContext on first sight."""
    sc = df.sparkSession.sparkContext
    env_dir = os.environ.get(ENV_CHECKPOINT_DIR)
    current = sc.getCheckpointDir()
    if env_dir and not current:
        sc.setCheckpointDir(env_dir)
        current = sc.getCheckpointDir()
    return current


def truncate_lineage(df: DataFrame, eager: bool = True) -> DataFrame:
    """Cut ``df``'s lineage: reliable ``checkpoint`` when a checkpoint
    dir is configured (cluster-safe — blocks survive executor loss),
    ``localCheckpoint`` otherwise (local default, zero I/O).

    ``eager=False`` defers materialization to the first action, which
    iterative loops use when the same round already runs an action
    (e.g. a convergence aggregate) so the work isn't done twice.
    """
    if _reliable_dir(df) is not None:
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)


def truncate_lineage_lazy(df: DataFrame) -> DataFrame:
    """``truncate_lineage(df, eager=False)`` in ``.transform()`` form."""
    return truncate_lineage(df, eager=False)
