"""data_ingestor_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference Go ETL ingestor (``CS-PCockrill/data-ingestor``), re-expressed
Spark-first: declarative DataFrame/SQL plans optimized by Catalyst, with
Structured Streaming for the streaming ingest path.

Public surface:

- :func:`data_ingestor_spark.session.get_session` — configured SparkSession.
- :func:`data_ingestor_spark.sources.load` — format-dispatched file loader
  (XML / JSON / Parquet / CSV) with reference-parity options.
- :mod:`data_ingestor_spark.operators.flatten` — reference-exact nested
  array flatten (explode) semantics.
- :mod:`data_ingestor_spark.sinks` — CSV/Excel/JSON exports, atomic JDBC
  publish, input archival.
- :mod:`data_ingestor_spark.plans.queries` — the declared relational query
  library (filters, joins, aggregations, windows, set ops, scalar fns).
- :mod:`data_ingestor_spark.ext` — large-scale pipeline extensions:
  dedup (exact/minhash/simhash), similarity search, text analysis,
  multimodal column plumbing.
"""

from data_ingestor_spark.session import get_session  # noqa: F401

__version__ = "0.1.0"
