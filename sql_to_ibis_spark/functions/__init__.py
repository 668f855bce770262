from sql_to_ibis_spark.functions.registry import (
    AGGREGATE_FUNCTIONS,
    RANKING_FUNCTIONS,
    SCALAR_FUNCTIONS,
    spark_type_for,
)

__all__ = [
    "AGGREGATE_FUNCTIONS",
    "RANKING_FUNCTIONS",
    "SCALAR_FUNCTIONS",
    "spark_type_for",
]
