"""Third-party destination registration — the reference's extension point
(third_party/__init__.py) as a one-call API."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from megalista_spark.models.execution import DestinationType, TransactionalType
from megalista_spark.pipeline import run_from_config
from megalista_spark.registry import register_destination
from megalista_spark.schema.registry import ColumnSpec, DestinationSchema
from megalista_spark.sinks.executor import BATCH_SIZES
from megalista_spark.sinks.transports import MockTransport


def test_register_and_run_custom_destination(spark, tmp_path):
    dtype = register_destination(
        "MY_CRM_UPLOAD",
        schema=DestinationSchema(
            destination_type=DestinationType.ADS_OFFLINE_CONVERSION,  # rebound
            columns=(
                ColumnSpec("uuid", required=True),
                ColumnSpec("crm_value"),
            ),
            transactional_type=TransactionalType.UUID,
        ),
        batch_size=7,
        transform=lambda df: df.withColumn("crm_value", F.upper("crm_value")),
        rate_limit_per_sec=None,
    )
    assert DestinationType["MY_CRM_UPLOAD"] is dtype
    assert BATCH_SIZES[dtype] == 7

    src = str(tmp_path / "crm_src")
    spark.createDataFrame(
        [(f"u{i}", f"val{i}") for i in range(10)], ["uuid", "crm_value"]
    ).write.parquet(src)
    cfg = {
        "Sources": [{"Name": "s", "Type": "FILE", "FileType": "PARQUET", "Path": src}],
        "Destinations": [{"Name": "d", "Type": "MY_CRM_UPLOAD", "Metadata": []}],
        "Connections": [{"Enabled": True, "Source": "s", "Destination": "d"}],
    }
    p = tmp_path / "c.json"
    p.write_text(json.dumps(cfg))

    class RejectUntransformed(MockTransport):
        """Fails the run if the registered transform was not applied —
        transport-side state can't be asserted driver-side (executors get
        copies), so reject bad rows instead."""

        def send(self, payload, context):
            return [r for r in payload if r["crm_value"].startswith("VAL")]

    r = run_from_config(spark, str(p), lambda e: RejectUntransformed())
    assert r.exit_code == 0
    assert r.branches[0].rows_uploaded == 10  # all rows uppercased → accepted

    # transactional: second run uploads nothing
    r2 = run_from_config(spark, str(p), lambda e: RejectUntransformed())
    assert r2.branches[0].rows_read == 0

    # idempotent re-registration
    assert register_destination(
        "MY_CRM_UPLOAD",
        schema=DestinationSchema(dtype, (ColumnSpec("uuid", required=True),)),
    ) is dtype
