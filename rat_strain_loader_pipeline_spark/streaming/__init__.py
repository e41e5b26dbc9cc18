"""Structured Streaming surface (SURVEY.md §2.8 extension territory)."""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import SparkSession


def stream_state_partitions(spark: SparkSession) -> int:
    """Shuffle/state partition count for micro-batch streaming queries.

    Streaming plans pin ``spark.sql.shuffle.partitions`` at query start
    (no AQE coalescing), and every stateful partition carries fixed
    per-batch overhead — a state-store open/commit, and for the
    applyInPandasWithState operators an Arrow round trip that iterates
    the partition's state even in the empty timeout-finalization batch.
    With partitions = total cores, that fixed cost dominates whenever
    per-batch state is far below memory bounds (the measured case: the
    same stateful query at the same volume ran 40% faster at cores/4
    than at cores, identical output).

    Default: ``defaultParallelism // 4`` — scales with the cluster (250
    state partitions on a 1000-core cluster) instead of hard-coding a
    local value, and keeps per-partition state ~4x larger so the fixed
    per-partition cost amortizes. Deployments whose per-batch state
    approaches executor memory set SPARK_GRAFT_STREAM_STATE_PARTITIONS
    explicitly (state volume, not core count, is the real driver at
    that end — the env override exists precisely because no derivation
    from core count alone can see state size before the query runs).
    """
    env = os.environ.get("SPARK_GRAFT_STREAM_STATE_PARTITIONS")
    if env:
        return max(1, int(env))
    return max(1, spark.sparkContext.defaultParallelism // 4)


@contextmanager
def stream_partition_scope(spark: SparkSession):
    """Scope ``spark.sql.shuffle.partitions`` to the streaming value for
    the duration of one micro-batch query (start + awaitTermination),
    restoring the session default afterwards. Partitioning never
    changes values — grouping is exact and the sketch/state operators
    are merge-exact — only where the fixed per-partition costs land."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(stream_state_partitions(spark)))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
