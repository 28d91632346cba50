"""CLI entry point — the Spark shape of the reference's `python -m main`
(megalista_dataflow/main.py:53-121).

    python -m megalista_spark --config config.json [--dry-run]

Exit code 1 if any branch recorded an error (reference main.py:106-121).
"""

from __future__ import annotations

import argparse
import json
import sys

from megalista_spark.pipeline import run_from_config
from megalista_spark.session import get_spark
from megalista_spark.sinks.transports import DryRunTransport


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="megalista_spark")
    parser.add_argument("--config", required=True, help="JSON config file path")
    parser.add_argument(
        "--dry-run",
        action="store_true",
        help="accept every row without calling any external API (default: "
        "also dry-run — real API transports are wired per deployment)",
    )
    parser.add_argument("--master", default=None)
    args = parser.parse_args(argv)

    spark = get_spark(app_name="megalista_spark", master=args.master)
    result = run_from_config(spark, args.config, lambda e: DryRunTransport())
    print(json.dumps(result.summary(), indent=2, default=str))
    return result.exit_code


if __name__ == "__main__":
    sys.exit(main())
