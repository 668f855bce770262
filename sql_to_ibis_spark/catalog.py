"""Case-insensitive table catalog.

Replaces the reference's class-level global registry (``TableInfo`` dicts at
``sql_to_ibis/sql_select_query.py:155-204``) with an instance-scoped object —
no globals, no deepcopy-per-query, no reset hooks. Ambiguity of unqualified
columns is resolved per-query by the compiler against the FROM-clause scope,
which matches SQL semantics and avoids the reference's cross-query ambiguity
leakage problem (``tests/utils.py:76-114`` exists purely to guard it).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from sql_to_ibis_spark.errors import TableNotFoundError
from sql_to_ibis_spark.sources.table_stats import TableStats


@dataclass
class CatalogEntry:
    name: str  # true, case-preserved name
    df: DataFrame
    # parquet-footer stats (exact rows, per-column min/max) — None for
    # temp tables / non-parquet sources; consumers treat None as unknown
    stats: "TableStats | None" = None
    # informational constraints (warehouse RELY-style): declared by the
    # user, TRUSTED by the planner for join elimination, never enforced
    # at write time (SqlEngine.validate_constraints() runs the real
    # checks on demand). primary_key = lowercase column names that are
    # jointly UNIQUE and NON-NULL. Each foreign key (cols, ref_table,
    # ref_cols) declares: cols are NON-NULL and every row matches
    # EXACTLY ONE ref_table row on ref_cols (stricter than SQL's FK,
    # which permits NULLs — the planner needs row preservation).
    primary_key: "tuple[str, ...] | None" = None
    foreign_keys: "list[tuple[tuple[str, ...], str, tuple[str, ...]]]" \
        = field(default_factory=list)


class Catalog:
    """Registry of name → DataFrame with case-insensitive lookup and
    case-preserving registration."""

    def __init__(self) -> None:
        self._tables: dict[str, CatalogEntry] = {}

    def register(self, name: str, df: DataFrame, replace: bool = True,
                 stats: "TableStats | None" = None) -> None:
        if not isinstance(df, DataFrame):
            raise TypeError(
                f"register_temp_table expects a pyspark DataFrame, got {type(df).__name__}"
            )
        key = name.lower()
        if not replace and key in self._tables:
            raise ValueError(f"Table '{name}' is already registered")
        self._tables[key] = CatalogEntry(name=name, df=df, stats=stats)

    def remove(self, name: str) -> None:
        key = name.lower()
        if key not in self._tables:
            raise TableNotFoundError(name)
        del self._tables[key]

    def get(self, name: str) -> CatalogEntry:
        key = name.lower()
        if key not in self._tables:
            raise TableNotFoundError(name)
        return self._tables[key]

    def __contains__(self, name: str) -> bool:
        return name.lower() in self._tables

    def names(self) -> list[str]:
        return [e.name for e in self._tables.values()]
