from data_ingestor_spark.operators.flatten import flatten_nested, project_whitelist  # noqa: F401
