from sql_to_ibis_spark.plans import ast
from sql_to_ibis_spark.plans.parser import parse

__all__ = ["ast", "parse"]
