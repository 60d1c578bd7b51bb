from data_ingestor_spark.plans.registry import REGISTRY, QuerySpec, load_table, query  # noqa: F401
