"""Schema subsystem: type conversion, safe casting, evolution.

Maps the reference's schema_converter.py / schema_casting.py /
schema_evolution.py onto Spark StructTypes.
"""

from dlt_iceberg_spark.schema.converter import (
    arrow_to_spark_type,
    arrow_schema_to_spark,
    dlt_type_to_spark,
    spark_type_to_dlt,
    infer_schema,
)
from dlt_iceberg_spark.schema.casting import cast_dataframe_safe, validate_cast
from dlt_iceberg_spark.schema.evolution import (
    SchemaChange,
    compare_schemas,
    can_promote_type,
    validate_schema_changes,
    evolve_schema_if_needed,
)

__all__ = [
    "arrow_to_spark_type",
    "arrow_schema_to_spark",
    "dlt_type_to_spark",
    "spark_type_to_dlt",
    "infer_schema",
    "cast_dataframe_safe",
    "validate_cast",
    "SchemaChange",
    "compare_schemas",
    "can_promote_type",
    "validate_schema_changes",
    "evolve_schema_if_needed",
]
