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


# Above this row count, an unpartitioned assign_batches refuses to run:
# a global window serializes every row through ONE task. The threshold is
# deliberately generous for oracle/test workloads and far below anything
# a production table would hit accidentally.
GLOBAL_WINDOW_MAX_ROWS = 10_000_000


def guard_global_window(
    df: DataFrame,
    op: str,
    key_param: str = "key_cols",
    max_global_rows: int = GLOBAL_WINDOW_MAX_ROWS,
) -> None:
    """Shared raise-above-threshold contract for keyless global-window
    operators (the assign_batches rule, factored out): count the frame
    the window would actually sort and refuse to funnel more than
    ``max_global_rows`` rows through one task. Only the keyless path
    pays the count; keyed windows scale and skip the check."""
    n = df.count()
    if n > max_global_rows:
        raise ValueError(
            f"{op} without {key_param} would sort {n} rows through a "
            f"single task — pass {key_param} so the window is per-group "
            "and parallel"
        )


def assign_batches(
    df: DataFrame,
    order_by: list[str],
    batch_size: int,
    partition_by: list[str] | None = None,
    batch_col: str = "batch_id",
    iteration_col: str = "iteration",
    max_global_rows: int = GLOBAL_WINDOW_MAX_ROWS,
) -> DataFrame:
    """1-based ``iteration`` per (partition_by) group: rows [1..N] → batch 1,
    [N+1..2N] → batch 2, ... Matches the reference's 1-based Batch.iteration.

    At scale, always pass ``partition_by`` (e.g. the execution/job key) so
    the window is per-group and parallel instead of global. Without
    ``partition_by`` the input is counted first and anything above
    ``max_global_rows`` raises instead of silently funnelling the table
    through one task (the executor's partition-local chunking is the
    scale path).
    """
    if partition_by:
        w = Window.partitionBy(*partition_by).orderBy(*order_by)
    else:
        guard_global_window(
            df, "assign_batches", key_param="partition_by",
            max_global_rows=max_global_rows,
        )
        w = Window.partitionBy().orderBy(*order_by)
    rn = F.row_number().over(w)
    out = df.withColumn(
        batch_col, F.floor((rn - F.lit(1)) / F.lit(batch_size)).cast("bigint")
    )
    return out.withColumn(iteration_col, (F.col(batch_col) + F.lit(1)).cast("bigint"))
