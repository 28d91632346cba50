"""End-to-end ETL run, the megalista workflow on Spark.

Creates a conversions table + a config wiring it to two destinations,
runs the pipeline twice (second run uploads nothing — idempotency), and
prints the run summaries.

    PYTHONPATH=. python examples/run_etl.py
"""

from __future__ import annotations

import json
import tempfile

from megalista_spark.pipeline import run_from_config
from megalista_spark.session import get_spark
from megalista_spark.sinks.transports import MockTransport


def main(spark=None) -> "tuple[list[dict], list[dict]]":
    """Run the two-pass demo. ``spark=None`` (script use) owns its own
    session; an injected session (the pytest smoke test) is left
    running. Returns (run1_summary, run2_summary) so the caller can
    assert the idempotency property (run 2 uploads 0 rows)."""
    owns_session = spark is None
    if owns_session:
        spark = get_spark(app_name="example_etl")
    workdir = tempfile.mkdtemp(prefix="megalista_example_")
    src = f"{workdir}/conversions"

    spark.createDataFrame(
        [
            (f"gclid_{i}", f"2024-03-01T12:00:{i % 60:02d}.000000", str(10.0 + i),
             f"user.{i}@gmail.com", f"+55119999{i:04d}")
            for i in range(100)
        ],
        ["gclid", "time", "amount", "email", "phone"],
    ).write.parquet(src)

    config = {
        "GoogleAdsAccountId": "123-456-7890",
        "Sources": [
            {"Name": "conversions", "Type": "FILE", "FileType": "PARQUET", "Path": src}
        ],
        "Destinations": [
            {"Name": "offline_conv", "Type": "ADS_OFFLINE_CONVERSION",
             "Metadata": ["My Conversion Action"]},
            {"Name": "crm_audience", "Type": "ADS_CUSTOMER_MATCH_CONTACT_INFO_UPLOAD",
             "Metadata": ["My List", "ADD"]},
        ],
        "Connections": [
            {"Enabled": True, "Source": "conversions", "Destination": "offline_conv"},
            {"Enabled": True, "Source": "conversions", "Destination": "crm_audience"},
        ],
    }
    cfg_path = f"{workdir}/config.json"
    with open(cfg_path, "w") as f:
        json.dump(config, f)

    # pre-upload privacy gate: would this audience clear a minimum-size
    # floor under its (email-domain) quasi-identifier?
    from pyspark.sql import functions as F

    from megalista_spark.operators.expectations import k_anonymity_report

    src_df = spark.read.parquet(src).withColumn(
        "email_domain", F.substring_index("email", "@", -1)
    )
    print("=== k-anonymity (email_domain QI, k=10)")
    k_anonymity_report(src_df, ["email_domain"], k=10).show()

    print("=== run 1 (everything fresh)")
    r1 = run_from_config(spark, cfg_path, lambda e: MockTransport())
    print(json.dumps(r1.summary(), indent=2))

    print("=== run 2 (transactional rows already uploaded)")
    r2 = run_from_config(spark, cfg_path, lambda e: MockTransport())
    print(json.dumps(r2.summary(), indent=2))
    print("exit code:", r2.exit_code)
    if owns_session:
        spark.stop()
    return r1.summary(), r2.summary()


if __name__ == "__main__":
    main()
