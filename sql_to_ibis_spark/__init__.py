"""sql_to_ibis_spark — a PySpark-native SQL analytics engine.

A brand-new engine with the query surface of ``zbrookle/sql_to_ibis``
re-expressed Spark-first: SQL parses to a logical AST which compiles to lazy
PySpark DataFrame plans; Catalyst + Tungsten provide optimization and
distributed execution. Extensions beyond the reference: full scalar/agg
function library, streaming helpers, and large-scale training-data pipeline
operators (dedup, similarity search, text analysis, multimodal plumbing).
"""

from sql_to_ibis_spark.engine import (
    SqlEngine,
    query,
    register_temp_table,
    remove_temp_table,
)
from sql_to_ibis_spark.functions.registry import set_fixed_clock
from sql_to_ibis_spark.session import get_spark

__version__ = "0.1.0"

__all__ = [
    "SqlEngine",
    "get_spark",
    "query",
    "register_temp_table",
    "remove_temp_table",
    "set_fixed_clock",
    "__version__",
]
