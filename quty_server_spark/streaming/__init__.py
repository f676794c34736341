"""Structured Streaming surface. Importing registers streaming queries."""

from quty_server_spark.streaming import ops  # noqa: F401
