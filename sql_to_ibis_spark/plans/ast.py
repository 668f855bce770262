"""Logical-plan AST nodes.

The parser (``plans/parser.py``) produces these; the compiler
(``plans/compiler.py``) lowers them to PySpark DataFrame operations where
Catalyst performs all optimization and physical planning.

Node inventory corresponds to the reference's value-object layer
(``sql_to_ibis/sql/sql_value_objects.py``) but is a fresh design: plain
dataclasses forming an immutable tree, no engine state inside nodes.
"""

from __future__ import annotations

from dataclasses import dataclass, field


class Node:
    """Base for all AST nodes."""


# ---------------------------------------------------------------- expressions


class Expr(Node):
    pass


@dataclass
class ColumnRef(Expr):
    name: str
    table: str | None = None  # qualifier: table name or alias


@dataclass
class Star(Expr):
    """``*`` or ``table.*`` in a select list; ``exclude`` holds
    ``* EXCLUDE (col, ...)`` column names (extension, DuckDB-style)."""

    table: str | None = None
    exclude: "list[str] | None" = None


@dataclass
class NumberLit(Expr):
    value: int | float


@dataclass
class StringLit(Expr):
    value: str


@dataclass
class BoolLit(Expr):
    value: bool


@dataclass
class NullLit(Expr):
    pass


@dataclass
class IntervalLit(Expr):
    """``INTERVAL n unit`` (extension; not in reference grammar)."""

    value: float
    unit: str  # second/minute/hour/day/week/month/year


@dataclass
class BinaryOp(Expr):
    op: str  # + - * / % || = != < <= > >= <=> and or
    left: Expr
    right: Expr


@dataclass
class UnaryOp(Expr):
    op: str  # - + not
    operand: Expr


@dataclass
class IsNull(Expr):
    operand: Expr
    negated: bool = False


@dataclass
class Between(Expr):
    operand: Expr
    low: Expr
    high: Expr
    negated: bool = False


@dataclass
class InList(Expr):
    operand: Expr
    items: list[Expr] = field(default_factory=list)
    negated: bool = False


@dataclass
class InSubquery(Expr):
    operand: Expr
    subquery: "SelectNode | SetOpNode" = None
    negated: bool = False


@dataclass
class ExistsSubquery(Expr):
    """EXISTS (subquery) — extension beyond the reference surface."""

    subquery: "SelectNode | SetOpNode" = None
    negated: bool = False


@dataclass
class ScalarSubquery(Expr):
    """``(SELECT single_value)`` in an expression — uncorrelated scalar
    subquery (extension; SURVEY §2.10 'Not present: ... scalar subqueries').
    Compiled to a broadcast cross join, never a driver-side collect."""

    subquery: "SelectNode | SetOpNode" = None


@dataclass
class QuantifiedCompare(Expr):
    """``x <op> ANY/ALL/SOME (subquery)`` — quantified comparison
    (extension; SOME normalizes to ANY at parse time). Lowered in the
    compiler to IN / NOT IN for the equality forms and to aggregate
    scalar subqueries (count/min/max/null-count) for the ordered forms,
    so correlated subqueries ride the existing decorrelation machinery."""

    op: str                 # '=', '!=', '>', '>=', '<', '<='
    operand: Expr = None
    quantifier: str = "any"  # 'any' | 'all'
    subquery: "SelectNode | SetOpNode" = None


@dataclass
class ScalarRef(Expr):
    """Internal marker: a scalar-subquery value materialized as a joined
    column. Produced by the compiler's rewrite, never by the parser."""

    name: str


@dataclass
class GroupTotalSubquery(Expr):
    """Internal marker: an uncorrelated scalar subquery that aggregates
    the SAME FROM+WHERE as the enclosing grouped query (TPC-H q11's
    HAVING threshold, share-of-total projections). Lowered by the
    aggregation compiler into a window total over the outer's own grouped
    frame — the per-group partials are re-aggregated with merge functions
    — instead of re-executing the whole join/scan a second time.
    ``item`` is the subquery's select item with inner aliases already
    retargeted to the outer's. Produced by the compiler's rewrite, never
    by the parser."""

    item: Expr = None


@dataclass
class ScalarSubqueryField(Expr):
    """Internal marker: output column ``index`` of a MULTI-column scalar
    subquery. Several fields referencing the SAME ``subquery`` object (by
    identity) bind to ONE aggregation pass + ONE join — this is how the
    quantified-comparison lowering emits its (count, extremum, null-count)
    triple in a single scan of the inner relation instead of three.
    Produced by the compiler's rewrite, never by the parser."""

    subquery: "SelectNode | SetOpNode" = None
    index: int = 0


@dataclass
class Like(Expr):
    """LIKE / ILIKE / RLIKE — extension beyond the reference surface."""

    operand: Expr
    pattern: Expr
    negated: bool = False
    case_insensitive: bool = False
    regexp: bool = False


@dataclass
class Case(Expr):
    whens: list[tuple[Expr, Expr]] = field(default_factory=list)
    else_: Expr | None = None


@dataclass
class Cast(Expr):
    operand: Expr
    type_name: str  # normalized lowercase SQL type name


@dataclass
class FuncCall(Expr):
    name: str  # lowercase
    args: list[Expr] = field(default_factory=list)
    distinct: bool = False
    is_star: bool = False  # count(*)
    # SQL:2003 agg FILTER (WHERE cond): only matching rows are aggregated
    filter_where: Expr | None = None
    # IGNORE NULLS on lag/lead/first_value/last_value/nth_value
    ignore_nulls: bool = False


@dataclass
class FrameBound(Node):
    kind: str  # 'unbounded_preceding' | 'unbounded_following' | 'current_row' | 'offset' | 'interval'
    offset: int = 0  # signed: negative = preceding, positive = following
    # kind == 'interval': RANGE BETWEEN INTERVAL n unit PRECEDING/FOLLOWING
    # over a timestamp ORDER BY key; offset holds the sign (-1/+1)
    interval: "IntervalLit | None" = None


@dataclass
class WindowSpec(Node):
    partition_by: list[Expr] = field(default_factory=list)
    order_by: list["OrderItem"] = field(default_factory=list)
    frame_type: str | None = None  # 'rows' | 'range' | None (→ reference default)
    frame_start: FrameBound | None = None
    frame_end: FrameBound | None = None
    ref: str | None = None  # named-window reference (WINDOW w AS (...))


@dataclass
class WindowFunc(Expr):
    func: FuncCall
    window: WindowSpec


# ------------------------------------------------------------------ relations


class Relation(Node):
    pass


@dataclass
class TableRef(Relation):
    name: str
    alias: str | None = None


@dataclass
class SubqueryRef(Relation):
    query: "SelectNode | SetOpNode"
    alias: str
    # derived-column alias list: FROM (SELECT ...) t(a, b) (extension)
    columns: "list[str] | None" = None


@dataclass
class ValuesRef(Relation):
    """``FROM (VALUES (1, 'a'), (2, 'b')) t(id, name)`` — inline table
    constructor (extension; not in reference grammar). Default column
    names col0, col1, … match DuckDB."""

    rows: list[list[Expr]]
    alias: str
    columns: "list[str] | None" = None


@dataclass
class TableFuncRef(Relation):
    """``FROM fn(args...)`` — table-function source (Python UDTF or builtin
    like range(n)). Extension; the reference has no UDTF surface at all
    (SURVEY §2.9)."""

    name: str  # lowercase
    args: list[Expr] = field(default_factory=list)
    alias: str | None = None


@dataclass
class UnnestRef(Relation):
    """``FROM t, UNNEST(t.arr) AS u(x)`` — lateral array expansion
    (extension; compiles to ``explode``). The argument may reference
    columns of relations earlier in the FROM list."""

    expr: Expr = None
    alias: str = ""
    columns: "list[str] | None" = None


@dataclass
class PivotRef(Relation):
    """SQL-standard pivot: ``<rel> PIVOT (fn(arg) FOR col IN (v1, ...))``.
    Groups by every column not referenced in the clause (DuckDB
    semantics)."""
    source: Relation
    agg_func: str
    agg_arg: Expr
    pivot_col: str
    values: list[Expr] = field(default_factory=list)
    alias: str | None = None


@dataclass
class UnpivotRef(Relation):
    """``<rel> UNPIVOT [INCLUDE NULLS] (val FOR key IN (c1, c2, ...))``;
    NULL value rows drop by default (DuckDB semantics)."""
    source: Relation
    value_name: str
    key_name: str
    columns: list[str] = field(default_factory=list)
    alias: str | None = None
    include_nulls: bool = False


@dataclass
class Join(Relation):
    left: Relation
    right: Relation
    kind: str  # inner | left | right | full | cross | asof | asof_left
    condition: Expr | None = None  # None for cross


# -------------------------------------------------------------------- queries


@dataclass
class SelectItem(Node):
    expr: Expr
    alias: str | None = None


@dataclass
class OrderItem(Node):
    expr: Expr
    ascending: bool = True
    nulls_first: bool | None = None  # None = engine default


@dataclass
class SelectNode(Node):
    items: list[SelectItem] = field(default_factory=list)
    relations: list[Relation] = field(default_factory=list)  # comma list → cross join
    where: Expr | None = None
    group_by: list[Expr] = field(default_factory=list)
    # None = plain GROUP BY; 'rollup' | 'cube' | 'grouping_sets' (extensions)
    group_mode: str | None = None
    grouping_sets: list[list[Expr]] = field(default_factory=list)
    group_by_all: bool = False  # GROUP BY ALL (keys derived from SELECT list)
    having: Expr | None = None
    qualify: Expr | None = None  # QUALIFY (filter on window results)
    order_by: list[OrderItem] = field(default_factory=list)
    limit: int | None = None
    offset: int | None = None
    distinct: bool = False
    # DISTINCT ON (exprs): first row per group under ORDER BY (extension)
    distinct_on: list[Expr] = field(default_factory=list)
    windows: dict[str, WindowSpec] = field(default_factory=dict)  # WINDOW clause


@dataclass
class SetOpNode(Node):
    op: str  # union | union_all | intersect | except | except_all
    left: "SelectNode | SetOpNode" = None
    right: "SelectNode | SetOpNode" = None
    order_by: list[OrderItem] = field(default_factory=list)
    limit: int | None = None
    offset: int | None = None


@dataclass
class ShowTablesNode(Node):
    """``SHOW TABLES`` — catalog introspection (extension)."""


@dataclass
class DescribeNode(Node):
    """``DESCRIBE <table>`` — schema introspection (extension)."""

    table: str = ""


@dataclass
class ExplainNode(Node):
    """``EXPLAIN [FORMATTED|EXTENDED|SIMPLE|CODEGEN|COST] <query>`` — plan
    introspection without execution (extension)."""

    query: Node = None
    mode: str = "formatted"


@dataclass
class WithNode(Node):
    """``WITH name AS (query) [, ...] body`` — common table expressions
    (extension: absent from the reference grammar entirely; SURVEY §2.10
    'Not present: ... CTEs')."""

    ctes: list[tuple[str, "SelectNode | SetOpNode | WithNode"]] = field(
        default_factory=list)
    body: "SelectNode | SetOpNode | WithNode" = None
