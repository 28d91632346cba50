"""Deterministic fixed-size batching (reference _BatchElements,
batches_from_executions.py:113-131 — SURVEY G2).

Two strategies:

- ``assign_batches``: global deterministic batch ids via a row_number
  window ordered by a key. This is the ORACLE-CHECKABLE form, but a global
  (unpartitioned) window serializes through one task — use only when
  deterministic ids are semantically required, or partition first.
- partition-local chunking without any sort — the scale path — lives in
  the sink executor (megalista_spark/sinks/executor.py), which is where the
  reference's batching actually matters (API payload limits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_batches(
    df: DataFrame,
    order_by: list[str],
    batch_size: int,
    partition_by: list[str] | None = None,
    batch_col: str = "batch_id",
    iteration_col: str = "iteration",
) -> DataFrame:
    """1-based ``iteration`` per (partition_by) group: rows [1..N] → batch 1,
    [N+1..2N] → batch 2, ... Matches the reference's 1-based Batch.iteration.

    At scale, always pass ``partition_by`` (e.g. the execution/job key) so
    the window is per-group and parallel instead of global.
    """
    if partition_by:
        w = Window.partitionBy(*partition_by).orderBy(*order_by)
    else:
        w = Window.partitionBy().orderBy(*order_by)
    rn = F.row_number().over(w)
    out = df.withColumn(
        batch_col, F.floor((rn - F.lit(1)) / F.lit(batch_size)).cast("bigint")
    )
    return out.withColumn(iteration_col, (F.col(batch_col) + F.lit(1)).cast("bigint"))
