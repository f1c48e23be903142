"""dlt_iceberg_spark — a PySpark-native analytics + lakehouse-write engine.

Re-expresses the capabilities of the reference engine (sidequery/dlt-iceberg,
surveyed in SURVEY.md) Spark-first:

- Write side: append / replace / merge{upsert, delete-insert} / hard-delete
  dispositions, partition transforms, inferred schemas, safe casting, schema
  evolution, state ledger — over an atomic snapshot-based lake table format
  (``dlt_iceberg_spark.lake``) because no Iceberg runtime jar ships in this
  environment.  The disposition logic is written against a thin table
  interface so an Iceberg catalog backend can slot in.
- Read side: the dataset/query surface is ``spark.sql`` / DataFrame directly
  (the reference delegates to DuckDB views, sql_client.py:102-149).
- Beyond-reference: large-scale training-data operators (dedup, similarity
  search, text analysis, multimodal plumbing) under ``operators/``.
"""

from dlt_iceberg_spark.session import get_spark, configure_session
from dlt_iceberg_spark.destination import IcebergDestination, iceberg_rest, pipeline

__version__ = "0.1.0"

__all__ = [
    "get_spark",
    "configure_session",
    "IcebergDestination",
    "iceberg_rest",
    "pipeline",
    "__version__",
]
