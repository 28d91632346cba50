"""Version constant (reference config/version.py — there the value is
stamped by the deploy script; here it identifies the Spark engine)."""

MEGALISTA_SPARK_VERSION = "3.0.0"
