from quty_server_spark.plans.registry import QueryRegistry, registry

__all__ = ["QueryRegistry", "registry"]
