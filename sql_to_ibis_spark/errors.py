"""Exception types for the PySpark SQL engine.

Mirrors the error surface of the reference implementation
(``sql_to_ibis/exceptions/sql_exception.py:9-59``) so that callers porting
from the reference see the same failure modes, while remaining an
independent implementation.
"""

from __future__ import annotations


class SqlEngineError(Exception):
    """Base class for all engine errors."""


class InvalidQueryException(SqlEngineError):
    """The SQL text could not be parsed or is semantically invalid.

    Parity: reference raises ``InvalidQueryException`` on Lark parse errors
    (``sql_select_query.py:138-152``).
    """

    def __init__(self, message: str, line: int | None = None, column: int | None = None):
        if line is not None:
            message = f"{message} (line {line}, column {column})"
        super().__init__(message)
        self.line = line
        self.column = column


class TableNotFoundError(SqlEngineError):
    """A table referenced in FROM is not registered in the catalog.

    Parity: reference ``TableExprDoesNotExist``.
    """

    def __init__(self, table_name: str):
        super().__init__(f"Table '{table_name}' is not registered")
        self.table_name = table_name


class ColumnNotFoundError(SqlEngineError):
    """A column could not be resolved against any table in scope.

    Parity: reference ``ColumnNotFoundError``
    (``parsing/transformers.py:167-193``).
    """

    def __init__(self, column_name: str, tables: list[str] | None = None,
                 known_columns: list[str] | None = None):
        scope = f" in tables {sorted(tables)}" if tables else ""
        hint = ""
        if known_columns:
            import difflib

            close = difflib.get_close_matches(
                column_name.lower(),
                {c.lower(): c for c in known_columns}, n=3, cutoff=0.6)
            if close:
                originals = {c.lower(): c for c in known_columns}
                names = ", ".join(repr(originals[c]) for c in close)
                hint = f" — did you mean {names}?"
        super().__init__(f"Column '{column_name}' not found{scope}{hint}")
        self.column_name = column_name


class AmbiguousColumnException(SqlEngineError):
    """An unqualified column name is owned by more than one table in scope.

    Parity: reference ``AmbiguousColumnException``
    (``sql_select_query.py:161-168``, ``sql/sql_objects.py:36-53``).
    """

    def __init__(self, column_name: str, tables: set[str]):
        super().__init__(
            f"Column '{column_name}' is ambiguous: present in tables "
            f"{sorted(tables)}; qualify it as <table>.{column_name}"
        )
        self.column_name = column_name
        self.tables = tables


class UnsupportedColumnOperation(SqlEngineError):
    """An operation was applied to a column type that does not support it.

    Parity: reference raises on e.g. SUM over a non-numeric column
    (``parsing/transformers.py:231-237``, ``tests/test_errors.py:73-75``).
    """

    def __init__(self, operation: str, column: str, dtype: str):
        super().__init__(
            f"Cannot apply {operation} to column '{column}' of type {dtype}"
        )


class NeedsAggOrGroupQueryException(SqlEngineError):
    """A selected column is neither aggregated nor in GROUP BY.

    Parity: reference ``InvalidQueryException``/``NeedsAggOrGroupQueryException``
    (``parsing/sql_parser.py:392-409,710-717``).
    """

    def __init__(self, column_name: str):
        super().__init__(
            f"Column '{column_name}' must appear in GROUP BY or be used in an "
            f"aggregate function"
        )
