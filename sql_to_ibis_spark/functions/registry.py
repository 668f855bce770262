"""Function registry: SQL function name → PySpark Column builder.

Everything here stays JVM-side (``pyspark.sql.functions``) so expressions
remain inside whole-stage codegen — no Python UDFs in the scalar path.

The reference's function surface is tiny: the six aggregate families
(``sql_to_ibis/parsing/aggregation_aliases.py:1-10``), RANK/DENSE_RANK
(``parsing/transformers.py:601-660``), COALESCE (``transformers.py:662-664``),
NOW/TODAY (``transformers.py:371-387``). We cover all of it and extend with
the standard scalar/aggregate/window library users expect; extensions are
marked below and validated against the DuckDB oracle where DuckDB agrees.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sql_to_ibis_spark.errors import InvalidQueryException

ColumnBuilder = Callable[..., Column]


def _arity_error(name: str, got: int, expected: str) -> InvalidQueryException:
    return InvalidQueryException(
        f"Function {name}() takes {expected} argument(s), got {got}"
    )


# --------------------------------------------------------------- aggregates
# name → unary aggregate builder. COUNT/COUNT(*)/COUNT(DISTINCT) get special
# handling in the compiler (star + distinct flags).

AGGREGATE_FUNCTIONS: dict[str, ColumnBuilder] = {
    # multidimensional-grouping indicators (ROLLUP/CUBE/GROUPING SETS).
    # Cast to BIGINT: Spark returns tinyint/bigint-varying widths here while
    # ANSI engines (DuckDB/Postgres) return int64 — keep schemas honest.
    "grouping": lambda *c: F.grouping(*c).cast("bigint"),
    "grouping_id": lambda *c: F.grouping_id(*c).cast("bigint"),
    # reference surface (aggregation_aliases.py)
    "sum": F.sum,
    "avg": F.avg,
    "mean": F.avg,
    "min": F.min,
    "minimum": F.min,
    "max": F.max,
    "maximum": F.max,
    "count": F.count,
    # extensions
    "stddev": F.stddev_samp,
    "stddev_samp": F.stddev_samp,
    "stddev_pop": F.stddev_pop,
    "variance": F.var_samp,
    "var_samp": F.var_samp,
    "var_pop": F.var_pop,
    "median": F.median,
    "mode": F.mode,
    "first": F.first,
    "last": F.last,
    "any_value": F.any_value,
    "approx_count_distinct": F.approx_count_distinct,
    # sketch-style approximations: the scale path when exactness isn't
    # needed (HLL / quantile-sketch aggregations, no full shuffle of
    # distinct values)
    "approx_percentile": F.percentile_approx,
    "percentile_approx": F.percentile_approx,
    "percentile": F.percentile,  # exact interpolated (ANSI percentile_cont)
    "hll_sketch_estimate": F.approx_count_distinct,
    "bool_and": F.bool_and,
    "bool_or": F.bool_or,
    "bit_and": F.bit_and,
    "bit_or": F.bit_or,
    "product": F.product,
    "skewness": F.skewness,
    "kurtosis": F.kurtosis,
    "collect_list": F.collect_list,
    "array_agg": F.collect_list,
    "collect_set": F.collect_set,
    "string_agg": lambda c, sep=None: F.listagg(
        c, sep if sep is not None else F.lit(",")),
    "listagg": lambda c, sep=None: F.listagg(
        c, sep if sep is not None else F.lit(",")),
    # two-column statistical aggregates (ANSI/DuckDB-compatible)
    "corr": F.corr,
    "covar_samp": F.covar_samp,
    "covar_pop": F.covar_pop,
    "regr_slope": F.regr_slope,
    "regr_intercept": F.regr_intercept,
    "regr_r2": F.regr_r2,
    "regr_count": F.regr_count,
    "regr_avgx": F.regr_avgx,
    "regr_avgy": F.regr_avgy,
}

# aggregates that require a numeric input (reference raises
# UnsupportedColumnOperation — transformers.py:231-237)
NUMERIC_ONLY_AGGREGATES = {"sum", "avg", "mean", "stddev", "stddev_samp",
                           "stddev_pop", "variance", "var_samp", "var_pop",
                           "median", "product", "skewness", "kurtosis"}


def _bi(fn: ColumnBuilder) -> ColumnBuilder:
    """Widen an int-returning builder to BIGINT. Spark returns INT (or
    narrower) for ranks, date parts, lengths, and sizes where ANSI engines
    (DuckDB/Postgres BIGINT conventions) return int64 — widening engine-side
    keeps result schemas aligned with the SQL oracle at zero runtime cost
    (the cast folds into the same codegen stage)."""
    return lambda *args: fn(*args).cast("bigint")


# ------------------------------------------------------------------ ranking
# window-only functions; arity = (min_args, max_args)

RANKING_FUNCTIONS: dict[str, tuple[ColumnBuilder, int, int]] = {
    # reference surface
    "rank": (F.rank, 0, 0),
    "dense_rank": (F.dense_rank, 0, 0),
    # extensions (absent in reference — SURVEY §2.5 "Not present" list)
    "row_number": (F.row_number, 0, 0),
    "percent_rank": (F.percent_rank, 0, 0),
    "cume_dist": (F.cume_dist, 0, 0),
    "ntile": (F.ntile, 1, 1),
    "lag": (F.lag, 1, 3),
    "lead": (F.lead, 1, 3),
    "first_value": (F.first, 1, 1),
    "last_value": (F.last, 1, 1),
    "nth_value": (F.nth_value, 2, 2),
}

# value functions are frame-sensitive in Spark (F.first/F.last/F.nth_value
# evaluate over the window frame, like aggregates); ranking/offset functions
# are not and must reject an explicit frame clause
FRAME_SENSITIVE_VALUE_FUNCTIONS = {"first_value", "last_value", "nth_value"}


# ------------------------------------------------------------------ scalars

def _log(*args: Column) -> Column:
    if len(args) == 1:
        return F.log(args[0])
    return F.log(args[0], args[1])  # log(base, expr)


def _round(*args: Column) -> Column:
    if len(args) == 1:
        return F.round(args[0], 0)
    return F.round(args[0], args[1])


def _substr(*args: Column) -> Column:
    if len(args) == 2:
        # substring to end of string
        return F.substring(args[0], args[1], 1_000_000_000)
    if len(args) == 3:
        return F.substring(args[0], args[1], args[2])
    raise _arity_error("substring", len(args), "2 or 3")


# --------------------------------------------------------- injectable clock
# NOW()/TODAY() (reference semantics: parsing/transformers.py:371-387 maps
# them to the wall clock at query time) are the only nondeterministic scalar
# surfaces. A pinnable clock makes them hash-checkable against a SQL oracle
# and lets pipelines replay deterministically; production leaves it unset.

_FIXED_CLOCK: str | None = None


def set_fixed_clock(timestamp: str | None) -> None:
    """Pin NOW()/TODAY() to a fixed timestamp (``'YYYY-MM-DD HH:MM:SS'``);
    ``None`` restores the wall clock. Evaluated at compile time of each
    query, so previously-compiled DataFrames are unaffected."""
    global _FIXED_CLOCK
    _FIXED_CLOCK = timestamp


def _now() -> Column:
    if _FIXED_CLOCK is not None:
        return F.lit(_FIXED_CLOCK).cast("timestamp")
    return F.current_timestamp()


def _today() -> Column:
    if _FIXED_CLOCK is not None:
        return F.to_date(F.lit(_FIXED_CLOCK).cast("timestamp"))
    return F.current_date()


SCALAR_FUNCTIONS: dict[str, ColumnBuilder] = {
    # reference surface
    "coalesce": F.coalesce,
    "now": _now,
    "today": _today,
    # --- string (extensions) ---
    "lower": F.lower,
    "upper": F.upper,
    "length": _bi(F.length),
    "char_length": _bi(F.char_length),
    "trim": F.trim,
    "ltrim": F.ltrim,
    "rtrim": F.rtrim,
    "reverse": F.reverse,
    "concat": F.concat,
    "concat_ws": F.concat_ws,
    "replace": F.replace,
    "substring": _substr,
    "substr": _substr,
    "left": F.left,
    "right": F.right,
    "lpad": F.lpad,
    "rpad": F.rpad,
    "split": F.split,
    "split_part": F.split_part,
    "instr": _bi(F.instr),
    "strpos": _bi(F.instr),
    "position": _bi(F.instr),
    "contains": F.contains,
    "starts_with": F.startswith,
    "ends_with": F.endswith,
    "regexp_extract": F.regexp_extract,
    "regexp_replace": F.regexp_replace,
    "regexp_count": F.regexp_count,
    "regexp_like": F.regexp_like,
    "repeat": F.repeat,
    "initcap": F.initcap,
    "md5": F.md5,
    "sha2": F.sha2,
    "hash": F.hash,
    "xxhash64": F.xxhash64,
    "format_string": F.format_string,
    # --- math (extensions) ---
    "abs": F.abs,
    "round": _round,
    "floor": F.floor,
    "ceil": F.ceil,
    "ceiling": F.ceil,
    "sqrt": F.sqrt,
    "cbrt": F.cbrt,
    "exp": F.exp,
    "ln": F.log,
    "log": _log,
    "log2": F.log2,
    "log10": F.log10,
    "pow": F.pow,
    "power": F.pow,
    "mod": lambda a, b: a % b,
    "pmod": F.pmod,
    "sign": F.signum,
    "greatest": F.greatest,
    "least": F.least,
    "sin": F.sin,
    "cos": F.cos,
    "tan": F.tan,
    "asin": F.asin,
    "acos": F.acos,
    "atan": F.atan,
    "atan2": F.atan2,
    "degrees": F.degrees,
    "radians": F.radians,
    "pi": lambda: F.lit(3.141592653589793),
    "random": F.rand,
    "rand": F.rand,
    "isnan": F.isnan,
    # --- null handling (extensions) ---
    "nullif": F.nullif,
    "ifnull": F.ifnull,
    "nvl": F.ifnull,
    "nvl2": F.nvl2,
    "if": F.when,  # if(cond, a, b) handled via lambda below
    # --- date/time (extensions) ---
    "year": _bi(F.year),
    "month": _bi(F.month),
    "day": _bi(F.dayofmonth),
    "dayofmonth": _bi(F.dayofmonth),
    "dayofweek": _bi(F.dayofweek),
    "dayofyear": _bi(F.dayofyear),
    "weekofyear": _bi(F.weekofyear),
    "quarter": _bi(F.quarter),
    "hour": _bi(F.hour),
    "minute": _bi(F.minute),
    "second": _bi(F.second),
    "date_trunc": F.date_trunc,
    "to_date": F.to_date,
    "to_timestamp": F.to_timestamp,
    "date_add": F.date_add,
    "date_sub": F.date_sub,
    "datediff": _bi(F.datediff),
    "date_diff": _bi(F.datediff),
    "add_months": F.add_months,
    "last_day": F.last_day,
    "months_between": F.months_between,
    "unix_timestamp": F.unix_timestamp,
    "from_unixtime": F.from_unixtime,
    "date_format": F.date_format,
    "make_date": F.make_date,
    "epoch_ms": lambda c: (c.cast("double") * 1000).cast("long"),
    # --- JSON (extensions; events.props is a JSON string column) ---
    "get_json_object": F.get_json_object,
    "json_extract": F.get_json_object,
    "json_array_length": _bi(F.json_array_length),
    "json_object_keys": F.json_object_keys,
    "to_json": F.to_json,
    # --- array (extensions; embeddings are array<float>) ---
    "array": F.array,
    "array_length": _bi(F.size),
    "size": _bi(F.size),
    "cardinality": _bi(F.size),
    "array_contains": F.array_contains,
    "array_distinct": F.array_distinct,
    "array_join": F.array_join,
    "array_max": F.array_max,
    "array_min": F.array_min,
    "array_sort": F.array_sort,
    "slice": F.slice,
    "element_at": F.element_at,
    "explode": F.explode,
    "posexplode": F.posexplode,
    "sequence": F.sequence,
    "flatten": F.flatten,
    "arrays_zip": F.arrays_zip,
}

SCALAR_FUNCTIONS["if"] = lambda cond, a, b: F.when(cond, a).otherwise(b)
SCALAR_FUNCTIONS["iif"] = SCALAR_FUNCTIONS["if"]


# ----------------------------------------------------------------- type map
# SURVEY §1.3: reference TYPENAME tokens (grammar/sql.lark:87-106) normalized
# through GIVEN_TYPE_TO_IBIS (conversions/conversions.py:3-11) → Spark types.

_TYPE_MAP: dict[str, T.DataType] = {
    "object": T.StringType(),
    "varchar": T.StringType(),
    "char": T.StringType(),
    "string": T.StringType(),
    "text": T.StringType(),
    "category": T.StringType(),   # pandas-ism; documented widening
    "int8": T.ByteType(),
    "tinyint": T.ByteType(),
    "int16": T.ShortType(),
    "smallint": T.ShortType(),
    "int32": T.IntegerType(),
    "int": T.IntegerType(),
    "integer": T.IntegerType(),
    "int64": T.LongType(),
    "bigint": T.LongType(),
    "float16": T.FloatType(),     # no half-float in Spark; documented widening
    "float32": T.FloatType(),
    "real": T.FloatType(),
    "float": T.DoubleType(),      # SQL-standard float → double (divergence
                                  # from reference's ibis float32 reading is
                                  # deliberate; see SURVEY §1.3)
    "float64": T.DoubleType(),
    "double": T.DoubleType(),
    "bool": T.BooleanType(),
    "boolean": T.BooleanType(),
    "datetime64": T.TimestampType(),
    "datetime": T.TimestampType(),
    "timestamp": T.TimestampType(),
    "date": T.DateType(),
    "time": T.StringType(),       # no TIME type in Spark; documented mapping
    "binary": T.BinaryType(),
    "blob": T.BinaryType(),
}


def spark_type_for(type_name: str) -> T.DataType:
    name = type_name.lower().strip()
    if name.startswith("decimal(") or name.startswith("numeric("):
        params = name[name.index("(") + 1 : -1].split(",")
        precision = int(params[0])
        scale = int(params[1]) if len(params) > 1 else 0
        return T.DecimalType(precision, scale)
    if name in ("decimal", "numeric"):
        return T.DecimalType(38, 18)
    if name not in _TYPE_MAP:
        raise InvalidQueryException(f"Unknown type name {type_name!r} in CAST")
    return _TYPE_MAP[name]
