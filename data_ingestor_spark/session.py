"""SparkSession + config factory.

Reference parity: the reference resolves config from a YAML file with
environment-variable overrides (``config/config.go:38-49`` — viper
``AutomaticEnv`` with ``.`` → ``_`` key mapping) into DB-connection and
runtime (worker count, archive dir) settings. Here the same resolution
order (defaults < YAML < env) feeds a plain dataclass; Spark runtime
knobs go to the SparkSession builder instead of a hand-rolled worker
pool (``mapreduce/mapreduce.go:30-105``).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field, fields

from pyspark.sql import SparkSession

_ENV_PREFIX = "DIS_"


@dataclass
class EngineConfig:
    """Engine configuration (reference ``config.yaml:2-12`` keys, generalized).

    ``jdbc_*`` replaces the reference's DB host/port/user/password/name
    parts (``config/config.go:17-26``); ``worker_count`` maps to
    ``RUNTIME.WORKER_COUNT`` (``config.yaml:11``) and becomes the default
    parallelism hint; ``archive_dir`` maps to ``RUNTIME.FILE_DESTINATION``
    (``config.yaml:12``).
    """

    app_name: str = "data_ingestor_spark"
    master: str = "local[*]"
    shuffle_partitions: int = 32
    worker_count: int = 2
    archive_dir: str = "archive"
    jdbc_url: str | None = None
    jdbc_user: str | None = None
    jdbc_password: str | None = None
    jdbc_driver: str = "org.postgresql.Driver"
    extra_spark_conf: dict[str, str] = field(default_factory=dict)

    @classmethod
    def load(cls, yaml_path: str | None = None) -> "EngineConfig":
        """Defaults < YAML file < ``DIS_*`` env vars (viper-style override)."""
        values: dict = {}
        if yaml_path and os.path.exists(yaml_path):
            import yaml

            with open(yaml_path) as f:
                raw = yaml.safe_load(f) or {}
            values.update({k.lower(): v for k, v in raw.items()})
        for f_ in fields(cls):
            env_key = _ENV_PREFIX + f_.name.upper()
            if env_key in os.environ:
                raw_v: object = os.environ[env_key]
                if f_.type in ("int", int):
                    raw_v = int(raw_v)  # type: ignore[arg-type]
                values[f_.name] = raw_v
        known = {f_.name for f_ in fields(cls)}
        return cls(**{k: v for k, v in values.items() if k in known})


def get_session(config: EngineConfig | None = None) -> SparkSession:
    """Build (or get) the engine's SparkSession.

    Scale posture: AQE on (runtime re-planning, skew-join splitting,
    partition coalescing), shuffle partitions sized explicitly, Arrow
    enabled for the Pandas-UDF paths, UTC session timezone so timestamp
    semantics are engine-independent.
    """
    cfg = config or EngineConfig.load()
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    master = f"local[{cpus}]" if cpus else cfg.master
    builder = (
        SparkSession.builder.master(master)
        .appName(cfg.app_name)
        .config("spark.sql.shuffle.partitions", str(cfg.shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("DIS_DRIVER_MEMORY", "8g"))
    )
    for k, v in cfg.extra_spark_conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
