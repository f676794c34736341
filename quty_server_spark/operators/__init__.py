"""Operator modules. Importing this package registers every query."""

from quty_server_spark.operators import (  # noqa: F401
    relational,
    analytics,
    tpch_more,
    pubsub,
    dedup,
    similarity,
    textops,
    multimodal,
    auth,
    udfs,
    sampling,
    pipeline,
    graph,
    retract,
)
from quty_server_spark import streaming  # noqa: F401
from quty_server_spark.sources import formats  # noqa: F401
