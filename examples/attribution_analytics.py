"""Marketing-analytics demo over the synthetic event log — the analysis
layer that sits NEXT TO the megalista upload flow (the reference ships
conversion values to ad platforms; these queries decide which channels
earned them):

  last-touch  — as-of join (each purchase's latest preceding click)
  linear      — equal split across the trailing attribution window
  U-shaped    — 40/40/20 first/last/middles position weights
  Markov      — data-driven removal effect per channel (integer
                fixed-point model, engine-portable)

    PYTHONPATH=. python examples/attribution_analytics.py [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

from megalista_spark.operators.asof import asof_join_backward
from megalista_spark.operators.attribution import markov_removal_attribution
from megalista_spark.session import get_spark


def main(spark=None, sf_dir=None) -> dict:
    """Run the attribution demo. ``spark=None`` (script use) owns its
    own session; an injected session (the pytest smoke test) is left
    running. Returns the headline figures for assertions."""
    owns_session = spark is None
    if sf_dir is None:
        sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    if owns_session:
        spark = get_spark(app_name="attribution_demo")
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_type = dict(e.dtypes).get("ts")
    if ts_type == "bigint":
        e = e.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))

    purchases = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
        F.col("value"),
    )
    clicks = e.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").alias("c_ts"),
    )

    # 1. LAST-TOUCH: as-of join — one union+window shuffle, no range scan
    lt = asof_join_backward(
        purchases, clicks, key="user_id", left_ts="p_ts", right_ts="c_ts",
        value_cols=["click_id"],
    )
    out = {
        "n_purchases": lt.count(),
        "n_last_touch_attributed": lt.where(
            F.col("click_id_asof").isNotNull()
        ).count(),
    }
    print("last-touch attributed purchases:",
          out["n_last_touch_attributed"], "/", out["n_purchases"])

    # 2. MARKOV removal effects: which channel's disappearance costs the
    #    most conversions (integer micro-units, deterministic)
    markov = markov_removal_attribution(e, iters=16).orderBy(
        F.desc("removal_effect_micro")
    )
    out["markov"] = [r.asDict() for r in markov.collect()]
    markov.show()

    # 3. RFM segmentation: quintile scores per purchasing user — the
    #    audience-building input to a customer-match upload
    from megalista_spark.operators.attribution import rfm_scores

    rfm = rfm_scores(purchases.select("user_id", F.col("p_ts").alias("ts"), "value"))
    out["n_rfm_users"] = rfm.count()
    rfm.groupBy("r_score", "f_score").count().orderBy(
        "r_score", "f_score"
    ).show(10)

    if owns_session:
        spark.stop()
    return out


if __name__ == "__main__":
    main()
