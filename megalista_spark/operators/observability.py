"""Single-pass pipeline metrics via Spark's CollectMetrics (`observe`).

The corpus-build funnel query (`__spark_entry__.py::corpus_build_pipeline`)
re-aggregates each stage prefix because its contract is one self-contained
DataFrame with a SQL twin. Production does NOT re-run stages to count
them: every stage boundary gets an ``observe`` node — a zero-cost
accumulator inside the SAME job — and the counts are read after the one
action that writes the final corpus. This module is that pattern.

Scale: an observe node adds a CollectMetrics operator — per-partition
partial aggregation of the declared expressions, merged on the driver at
action end. No extra scan, no shuffle, no caching; the 100 TB funnel
pays exactly its write job and gets every intermediate count free.

Cite: reference megalista counts uploaded rows per execution for its run
summary (megalista_dataflow/main.py results flow); this is the same
observability need expressed through Spark's native mechanism instead of
a second pass.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observe_rows(
    df: DataFrame, name: str, registry: dict[str, Observation]
) -> DataFrame:
    """Tap a row counter onto this point of the plan. The count is
    collected during the NEXT action over the returned frame's lineage;
    read it afterwards with ``observed_counts(registry)``."""
    obs = Observation(name)
    registry[name] = obs
    return df.observe(obs, F.count(F.lit(1)).alias("rows"))


def observe_stats(
    df: DataFrame,
    name: str,
    registry: dict[str, Observation],
    exprs: dict[str, "F.Column"],
) -> DataFrame:
    """General form: arbitrary aggregate expressions (counts, sums,
    min/max watermarks) accumulated at this plan point in the same job."""
    obs = Observation(name)
    registry[name] = obs
    return df.observe(obs, *[e.alias(k) for k, e in exprs.items()])


def observed_counts(registry: dict[str, Observation]) -> dict[str, int]:
    """Read the row counters after an action. Raises if no action ran
    (Observation.get blocks until metrics exist)."""
    return {name: obs.get["rows"] for name, obs in registry.items()}


def observed_metrics(registry: dict[str, Observation]) -> dict[str, dict[str, Any]]:
    return {name: dict(obs.get) for name, obs in registry.items()}
