"""Recursive-descent / Pratt SQL parser.

Covers the reference SQL dialect (``sql_to_ibis/grammar/sql.lark`` — SELECT,
joins, aggregation, HAVING, windows, set ops, subqueries, CASE/CAST/COALESCE,
BETWEEN/IN/IS NULL) and fixes the reference's parser gaps by design: OFFSET is
honored (the reference parses-and-drops it, ``parsing/sql_parser.py:193-207``),
boolean literals work (grammar stubs in the reference, ``sql.lark:136-137``),
and named extensions (LIKE, EXISTS, NOT, interval literals, NULLS FIRST/LAST,
optional CASE ELSE, simple-form CASE) are added.

Hand-written: no parser generator, no grammar file. Expressions use Pratt
precedence climbing; statements use plain recursive descent.
"""

from __future__ import annotations

from sql_to_ibis_spark.errors import InvalidQueryException
from sql_to_ibis_spark.plans import ast
from sql_to_ibis_spark.plans.lexer import (
    EOF,
    IDENT,
    NUMBER,
    OP,
    QIDENT,
    STRING,
    Token,
    tokenize,
)

# Keywords that may not be used as bare (no-AS) aliases or bare identifiers.
RESERVED = {
    "select", "from", "where", "group", "having", "order", "limit", "offset",
    "union", "intersect", "except", "join", "inner", "left", "right", "full",
    "outer", "cross", "on", "and", "or", "not", "as", "asc", "desc", "case",
    "when", "then", "else", "end", "between", "in", "is", "null", "like",
    "ilike", "rlike", "exists", "distinct", "all", "cast", "over", "partition",
    "rows", "range", "unbounded", "preceding", "following", "current", "by",
    "interval", "using", "natural", "window", "true", "false", "with",
    "qualify",
}

_JOIN_TYPES = {"inner", "left", "right", "full", "cross"}

_INTERVAL_UNITS = {
    "second", "seconds", "minute", "minutes", "hour", "hours",
    "day", "days", "week", "weeks", "month", "months", "year", "years",
    "millisecond", "milliseconds",
}

_COMPARISON_OPS = {"=", "!=", "<>", "<", "<=", ">", ">=", "<=>"}


def parse(sql: str) -> ast.SelectNode | ast.SetOpNode | ast.WithNode:
    return _Parser(tokenize(sql)).parse_statement()


def parse_number(text: str) -> int | float:
    """Safe numeric literal parse (the reference uses ``eval``,
    ``parsing/transformers.py:82-90`` — we don't)."""
    try:
        return int(text)
    except ValueError:
        return float(text)


class _Parser:
    def __init__(self, tokens: list[Token]):
        self._toks = tokens
        self._pos = 0

    # ------------------------------------------------------------- utilities

    @property
    def cur(self) -> Token:
        return self._toks[self._pos]

    def peek(self, offset: int = 1) -> Token:
        return self._toks[min(self._pos + offset, len(self._toks) - 1)]

    def advance(self) -> Token:
        tok = self.cur
        self._pos += 1
        return tok

    def at_kw(self, *kws: str) -> bool:
        return self.cur.kind == IDENT and self.cur.text.lower() in kws

    def accept_kw(self, *kws: str) -> bool:
        if self.at_kw(*kws):
            self.advance()
            return True
        return False

    def expect_kw(self, kw: str) -> Token:
        if not self.at_kw(kw):
            self._fail(f"expected {kw.upper()}")
        return self.advance()

    def at_op(self, *ops: str) -> bool:
        return self.cur.kind == OP and self.cur.text in ops

    def accept_op(self, *ops: str) -> bool:
        if self.at_op(*ops):
            self.advance()
            return True
        return False

    def expect_op(self, op: str) -> Token:
        if not self.at_op(op):
            self._fail(f"expected '{op}'")
        return self.advance()

    def _fail(self, message: str) -> None:
        tok = self.cur
        got = tok.text if tok.kind != EOF else "<end of input>"
        raise InvalidQueryException(
            f"Invalid SQL: {message}, got {got!r}", tok.line, tok.column
        )

    # ------------------------------------------------------------ statements

    def parse_statement(self) -> ast.Node:
        if self.at_kw("show"):
            self.advance()
            self.expect_kw("tables")
            node: ast.Node = ast.ShowTablesNode()
        elif self.at_kw("describe", "desc") and self.peek().kind in (
                IDENT, QIDENT):
            self.advance()
            node = ast.DescribeNode(table=self.advance().text)
        elif self.at_kw("explain"):
            self.advance()
            mode = "formatted"
            if self.at_kw("formatted", "extended", "simple", "codegen",
                          "cost", "analyze"):
                mode = self.advance().text.lower()
            node = ast.ExplainNode(query=self._parse_with_or_set_expr(),
                                   mode=mode)
        else:
            node = self._parse_with_or_set_expr()
        self.accept_op(";")
        if self.cur.kind != EOF:
            self._fail("unexpected trailing input")
        return node

    def _parse_with_or_set_expr(self):
        if not self.at_kw("with"):
            return self.parse_set_expr()
        self.advance()
        if self.at_kw("recursive"):
            self._fail("WITH RECURSIVE is not supported")
        ctes: list[tuple[str, object]] = []
        while True:
            if self.cur.kind not in (IDENT, QIDENT):
                self._fail("expected CTE name after WITH")
            name = self.advance().text
            self.expect_kw("as")
            self.expect_op("(")
            ctes.append((name, self._parse_with_or_set_expr()))
            self.expect_op(")")
            if not self.accept_op(","):
                break
        return ast.WithNode(ctes=ctes, body=self.parse_set_expr())

    def parse_set_expr(self) -> ast.SelectNode | ast.SetOpNode:
        """union/except level (INTERSECT binds tighter, SQL-standard).

        A trailing ORDER BY / LIMIT / OFFSET applies to the whole set
        expression (SQL-standard; the reference instead binds them to the
        nearest operand — parenthesize an operand to get that behavior).
        """
        left = self._parse_intersect_term()
        while self.at_kw("union", "except"):
            op_kw = self.advance().text.lower()
            is_all = self.accept_kw("all")
            if not is_all:
                self.accept_kw("distinct")
            op = {"union": "union_all" if is_all else "union",
                  "except": "except_all" if is_all else "except"}[op_kw]
            right = self._parse_intersect_term()
            left = ast.SetOpNode(op=op, left=left, right=right)
        if not left.order_by:
            left.order_by = self._parse_order_by_opt()
            limit, offset = self._parse_limit_offset_opt()
            if left.limit is None:
                left.limit = limit
            if left.offset is None:
                left.offset = offset
        return left

    def _parse_intersect_term(self) -> ast.SelectNode | ast.SetOpNode:
        left = self._parse_query_primary()
        while self.at_kw("intersect"):
            self.advance()
            is_all = self.accept_kw("all")
            if not is_all:
                self.accept_kw("distinct")
            right = self._parse_query_primary()
            left = ast.SetOpNode(op="intersect_all" if is_all else "intersect",
                                 left=left, right=right)
        return left

    def _parse_query_primary(self) -> ast.SelectNode | ast.SetOpNode:
        if self.at_op("("):
            self.advance()
            node = self.parse_set_expr()
            self.expect_op(")")
            return node
        node = self.parse_select(allow_order=False)
        # reference-parity: ORDER BY / LIMIT may appear on a set operand
        # without parentheses (`a ORDER BY x LIMIT 5 UNION b`,
        # reference test_set_ops.py); they bind to the operand when another
        # set operand follows, else to the whole set expression
        # (SQL-standard) via parse_set_expr's trailing-clause handling
        if self.at_kw("order", "limit"):
            save = self._pos
            order = self._parse_order_by_opt()
            limit, offset = self._parse_limit_offset_opt()
            if self.at_kw("union", "except", "intersect"):
                node.order_by, node.limit, node.offset = order, limit, offset
            else:
                self._pos = save
        return node

    def parse_select(self, allow_order: bool = True) -> ast.SelectNode:
        self.expect_kw("select")
        node = ast.SelectNode()
        node.distinct = self.accept_kw("distinct")
        if node.distinct and self.at_kw("on") and self.peek().text == "(":
            # DISTINCT ON (exprs): Postgres/DuckDB first-row-per-group
            self.advance()
            self.expect_op("(")
            node.distinct_on = self._parse_expr_list()
            self.expect_op(")")
            node.distinct = False
        self.accept_kw("all")
        node.items = self._parse_select_items()
        if self.accept_kw("from"):
            node.relations = self._parse_from_relations()
        if self.accept_kw("where"):
            node.where = self.parse_expr()
        if self.at_kw("group"):
            self.advance()
            self.expect_kw("by")
            if self.at_kw("all"):
                self.advance()
                node.group_by_all = True
            else:
                self._parse_group_by_into(node)
        if self.accept_kw("having"):
            node.having = self.parse_expr()
        if self.at_kw("qualify"):
            self.advance()
            node.qualify = self.parse_expr()
        if self.at_kw("window"):
            self.advance()
            while True:
                if self.cur.kind not in (IDENT, QIDENT):
                    self._fail("expected window name after WINDOW")
                wname = self.advance().text
                self.expect_kw("as")
                node.windows[wname.lower()] = self._parse_window_spec()
                if not self.accept_op(","):
                    break
        if allow_order:
            node.order_by = self._parse_order_by_opt()
            node.limit, node.offset = self._parse_limit_offset_opt()
        return node

    def _parse_group_by_into(self, node: ast.SelectNode) -> None:
        """GROUP BY list | ROLLUP(...) | CUBE(...) | GROUPING SETS((...), ...)
        — multidimensional grouping is an extension (SURVEY §2.4 'Not
        present: grouping sets / cube / rollup')."""
        if self.at_kw("rollup", "cube") and self.peek().text == "(":
            node.group_mode = self.advance().text.lower()
            self.expect_op("(")
            node.group_by = self._parse_expr_list()
            self.expect_op(")")
            return
        if self.at_kw("grouping") and self.peek().text.lower() == "sets":
            self.advance()
            self.advance()
            node.group_mode = "grouping_sets"
            self.expect_op("(")
            seen: list[ast.Expr] = []

            def add_key(e: ast.Expr) -> None:
                for s in seen:
                    if s == e:
                        return
                seen.append(e)

            while True:
                group: list[ast.Expr] = []
                if self.accept_op("("):
                    if not self.at_op(")"):
                        group = self._parse_expr_list()
                    self.expect_op(")")
                else:
                    group = [self.parse_expr()]
                node.grouping_sets.append(group)
                for e in group:
                    add_key(e)
                if not self.accept_op(","):
                    break
            self.expect_op(")")
            node.group_by = seen
            return
        node.group_by = self._parse_expr_list()

    def _parse_select_items(self) -> list[ast.SelectItem]:
        items = [self._parse_select_item()]
        while self.accept_op(","):
            items.append(self._parse_select_item())
        return items

    def _parse_select_item(self) -> ast.SelectItem:
        if self.at_op("*"):
            self.advance()
            return ast.SelectItem(expr=ast.Star(
                exclude=self._parse_star_exclude_opt()))
        # table.* (qualifier may be quoted)
        if self.cur.kind in (IDENT, QIDENT) and self.peek().kind == OP \
                and self.peek().text == "." and self.peek(2).kind == OP \
                and self.peek(2).text == "*":
            table = self.advance().text
            self.advance()  # .
            self.advance()  # *
            return ast.SelectItem(expr=ast.Star(
                table=table, exclude=self._parse_star_exclude_opt()))
        expr = self.parse_expr()
        alias = self._parse_alias_opt()
        return ast.SelectItem(expr=expr, alias=alias)

    def _parse_star_exclude_opt(self) -> list[str] | None:
        """``* EXCLUDE (col, ...)`` — column exclusion (DuckDB-compatible
        extension; EXCLUDE avoids the EXCEPT set-op ambiguity)."""
        if not self.at_kw("exclude"):
            return None
        self.advance()
        self.expect_op("(")
        cols = []
        while True:
            if self.cur.kind not in (IDENT, QIDENT):
                self._fail("expected column name in EXCLUDE list")
            cols.append(self.advance().text)
            if not self.accept_op(","):
                break
        self.expect_op(")")
        return cols

    def _parse_alias_opt(self) -> str | None:
        if self.accept_kw("as"):
            if self.cur.kind in (IDENT, QIDENT):
                return self.advance().text
            self._fail("expected alias after AS")
        if self.cur.kind == QIDENT:
            return self.advance().text
        if self.cur.kind == IDENT and self.cur.text.lower() not in RESERVED:
            # PIVOT/UNPIVOT are soft keywords: `FROM t PIVOT (...)` must not
            # read PIVOT as t's alias (an alias genuinely named pivot is
            # still fine anywhere `(` / INCLUDE can't follow)
            if self.cur.text.lower() in ("pivot", "unpivot") and (
                    self.peek().text == "("
                    or self.peek().text.lower() == "include"):
                return None
            return self.advance().text
        return None

    def _parse_column_alias_list_opt(self) -> list[str] | None:
        """Optional derived-column alias list ``(a, b, c)`` after a FROM
        alias (extension)."""
        if not self.at_op("("):
            return None
        self.advance()
        cols = []
        while True:
            if self.cur.kind not in (IDENT, QIDENT):
                self._fail("expected column name in alias list")
            cols.append(self.advance().text)
            if not self.accept_op(","):
                break
        self.expect_op(")")
        return cols

    # ----------------------------------------------------------------- FROM

    def _parse_from_relations(self) -> list[ast.Relation]:
        rels = [self._parse_join_chain()]
        while self.accept_op(","):
            rels.append(self._parse_join_chain())
        return rels

    def _parse_join_chain(self) -> ast.Relation:
        left = self._parse_relation_primary()
        while True:
            if self.at_kw("cross") and self.peek().text.lower() == "join":
                self.advance()
                self.advance()
                right = self._parse_relation_primary()
                left = ast.Join(left=left, right=right, kind="cross")
                continue
            # ASOF [INNER|LEFT [OUTER]] JOIN — DuckDB-compatible syntax;
            # 'asof' stays a soft keyword (valid as an identifier elsewhere)
            if self.at_kw("asof") and self.peek().text.lower() in (
                    "join", "left", "inner"):
                self.advance()
                kind = "asof"
                if self.accept_kw("left"):
                    kind = "asof_left"
                    self.accept_kw("outer")
                else:
                    self.accept_kw("inner")
                self.expect_kw("join")
                right = self._parse_relation_primary()
                self.expect_kw("on")
                condition = self.parse_expr()
                left = ast.Join(left=left, right=right, kind=kind,
                                condition=condition)
                continue
            kind = None
            if self.at_kw("join"):
                kind = "inner"
                self.advance()
            elif self.at_kw("inner", "left", "right", "full") \
                    and self.peek().text.lower() in ("join", "outer"):
                kind = self.advance().text.lower()
                self.accept_kw("outer")
                self.expect_kw("join")
            if kind is None:
                return left
            right = self._parse_relation_primary()
            self.expect_kw("on")
            condition = self.parse_expr()
            left = ast.Join(left=left, right=right, kind=kind, condition=condition)

    def _parse_relation_primary(self) -> ast.Relation:
        rel = self._parse_relation_atom()
        while True:
            if self.at_kw("pivot") and self.peek().text == "(":
                self.advance()
                self.expect_op("(")
                if self.cur.kind != IDENT:
                    self._fail("expected aggregate function in PIVOT")
                fn = self.advance().text.lower()
                self.expect_op("(")
                arg = self.parse_expr()
                self.expect_op(")")
                self.expect_kw("for")
                if self.cur.kind not in (IDENT, QIDENT):
                    self._fail("expected pivot column after FOR")
                col = self.advance().text
                self.expect_kw("in")
                self.expect_op("(")
                vals = self._parse_expr_list()
                self.expect_op(")")
                self.expect_op(")")
                alias = self._parse_alias_opt()
                rel = ast.PivotRef(source=rel, agg_func=fn, agg_arg=arg,
                                   pivot_col=col, values=vals, alias=alias)
                continue
            if self.at_kw("unpivot") and (
                    self.peek().text == "("
                    or self.peek().text.lower() == "include"):
                self.advance()
                include_nulls = False
                if self.accept_kw("include"):
                    self.expect_kw("nulls")
                    include_nulls = True
                self.expect_op("(")
                if self.cur.kind not in (IDENT, QIDENT):
                    self._fail("expected value column name in UNPIVOT")
                vname = self.advance().text
                self.expect_kw("for")
                if self.cur.kind not in (IDENT, QIDENT):
                    self._fail("expected key column name in UNPIVOT")
                kname = self.advance().text
                self.expect_kw("in")
                self.expect_op("(")
                cols = []
                while True:
                    if self.cur.kind not in (IDENT, QIDENT):
                        self._fail("expected column name in UNPIVOT IN list")
                    cols.append(self.advance().text)
                    if not self.accept_op(","):
                        break
                self.expect_op(")")
                self.expect_op(")")
                alias = self._parse_alias_opt()
                rel = ast.UnpivotRef(source=rel, value_name=vname,
                                     key_name=kname, columns=cols,
                                     alias=alias,
                                     include_nulls=include_nulls)
                continue
            return rel

    def _parse_relation_atom(self) -> ast.Relation:
        if self.at_op("("):
            self.advance()
            if self.at_kw("values"):
                # inline table constructor: (VALUES (..), (..)) t(a, b)
                self.advance()
                rows: list[list[ast.Expr]] = []
                while True:
                    self.expect_op("(")
                    rows.append(self._parse_expr_list())
                    self.expect_op(")")
                    if not self.accept_op(","):
                        break
                self.expect_op(")")
                alias = self._parse_alias_opt()
                if alias is None:
                    self._fail("VALUES table constructor requires an alias")
                cols = self._parse_column_alias_list_opt()
                return ast.ValuesRef(rows=rows, alias=alias, columns=cols)
            inner = self.parse_set_expr()
            self.expect_op(")")
            alias = self._parse_alias_opt()
            if alias is None:
                # a PIVOT/UNPIVOT postfix replaces the relation anyway, so
                # the usual mandatory-alias rule relaxes (DuckDB-compatible)
                if self.at_kw("pivot", "unpivot"):
                    alias = "__pivot_src"
                else:
                    self._fail(
                        "derived table (subquery in FROM) requires an alias")
            cols = self._parse_column_alias_list_opt()
            return ast.SubqueryRef(query=inner, alias=alias, columns=cols)
        if self.at_kw("unnest"):
            # lateral array expansion: FROM t, UNNEST(t.arr) AS u(x)
            self.advance()
            self.expect_op("(")
            expr = self.parse_expr()
            self.expect_op(")")
            alias = self._parse_alias_opt()
            if alias is None:
                self._fail("UNNEST requires an alias")
            cols = self._parse_column_alias_list_opt()
            if cols is not None and len(cols) != 1:
                self._fail("UNNEST alias list must name exactly 1 column")
            return ast.UnnestRef(expr=expr, alias=alias, columns=cols)
        if self.cur.kind in (IDENT, QIDENT):
            name = self.advance().text
            # table function: FROM fn(args...) (UDTF / builtin range)
            if self.at_op("(") :
                self.advance()
                args: list[ast.Expr] = []
                if not self.at_op(")"):
                    args = self._parse_expr_list()
                self.expect_op(")")
                alias = self._parse_alias_opt()
                return ast.TableFuncRef(name=name.lower(), args=args,
                                        alias=alias)
            alias = self._parse_alias_opt()
            return ast.TableRef(name=name, alias=alias)
        self._fail("expected table name or subquery in FROM")

    # ------------------------------------------------------ order/limit bits

    def _parse_order_by_opt(self) -> list[ast.OrderItem]:
        if not self.at_kw("order"):
            return []
        self.advance()
        self.expect_kw("by")
        return self._parse_order_items()

    def _parse_order_items(self) -> list[ast.OrderItem]:
        items = [self._parse_order_item()]
        while self.accept_op(","):
            items.append(self._parse_order_item())
        return items

    def _parse_order_item(self) -> ast.OrderItem:
        expr = self.parse_expr()
        ascending = True
        if self.accept_kw("desc"):
            ascending = False
        else:
            self.accept_kw("asc")
        nulls_first: bool | None = None
        if self.accept_kw("nulls"):
            if self.accept_kw("first"):
                nulls_first = True
            elif self.accept_kw("last"):
                nulls_first = False
            else:
                self._fail("expected FIRST or LAST after NULLS")
        return ast.OrderItem(expr=expr, ascending=ascending, nulls_first=nulls_first)

    def _parse_limit_offset_opt(self) -> tuple[int | None, int | None]:
        limit = offset = None
        if self.accept_kw("limit"):
            limit = self._parse_int("LIMIT")
        if self.accept_kw("offset"):
            offset = self._parse_int("OFFSET")
            if limit is None and self.accept_kw("limit"):
                limit = self._parse_int("LIMIT")
        return limit, offset

    def _parse_int(self, clause: str) -> int:
        if self.cur.kind != NUMBER:
            self._fail(f"expected integer after {clause}")
        value = parse_number(self.advance().text)
        if not isinstance(value, int):
            self._fail(f"{clause} requires an integer")
        return value

    def _parse_expr_list(self) -> list[ast.Expr]:
        exprs = [self.parse_expr()]
        while self.accept_op(","):
            exprs.append(self.parse_expr())
        return exprs

    # ----------------------------------------------------------- expressions
    # Pratt precedence: OR < AND < NOT < comparison/IS/IN/BETWEEN/LIKE
    #                   < || < additive < multiplicative < unary < primary

    def parse_expr(self) -> ast.Expr:
        return self._parse_or()

    def _parse_or(self) -> ast.Expr:
        left = self._parse_and()
        while self.at_kw("or"):
            self.advance()
            left = ast.BinaryOp(op="or", left=left, right=self._parse_and())
        return left

    def _parse_and(self) -> ast.Expr:
        left = self._parse_not()
        while self.at_kw("and"):
            self.advance()
            left = ast.BinaryOp(op="and", left=left, right=self._parse_not())
        return left

    def _parse_not(self) -> ast.Expr:
        if self.at_kw("not"):
            self.advance()
            return ast.UnaryOp(op="not", operand=self._parse_not())
        return self._parse_comparison()

    def _parse_comparison(self) -> ast.Expr:
        left = self._parse_concat()
        while True:
            if self.cur.kind == OP and self.cur.text in _COMPARISON_OPS:
                op = self.advance().text
                if op == "<>":
                    op = "!="
                if self.at_kw("any", "all", "some") \
                        and self.peek().text == "(":
                    quant = self.advance().text.lower()
                    self.expect_op("(")
                    sub = self._parse_with_or_set_expr()
                    self.expect_op(")")
                    left = ast.QuantifiedCompare(
                        op=op, operand=left,
                        quantifier="any" if quant == "some" else quant,
                        subquery=sub)
                    continue
                left = ast.BinaryOp(op=op, left=left, right=self._parse_concat())
                continue
            if self.at_kw("is"):
                self.advance()
                negated = self.accept_kw("not")
                self.expect_kw("null")
                left = ast.IsNull(operand=left, negated=negated)
                continue
            negated = False
            if self.at_kw("not") and self.peek().text.lower() in (
                    "between", "in", "like", "ilike", "rlike"):
                self.advance()
                negated = True
            if self.at_kw("between"):
                self.advance()
                low = self._parse_concat()
                self.expect_kw("and")
                high = self._parse_concat()
                left = ast.Between(operand=left, low=low, high=high, negated=negated)
                continue
            if self.at_kw("in"):
                self.advance()
                left = self._parse_in_rhs(left, negated)
                continue
            if self.at_kw("like", "ilike", "rlike"):
                kw = self.advance().text.lower()
                pattern = self._parse_concat()
                left = ast.Like(
                    operand=left, pattern=pattern, negated=negated,
                    case_insensitive=(kw == "ilike"), regexp=(kw == "rlike"),
                )
                continue
            if negated:
                self._fail("expected BETWEEN, IN or LIKE after NOT")
            return left

    def _parse_in_rhs(self, operand: ast.Expr, negated: bool) -> ast.Expr:
        self.expect_op("(")
        if self.at_kw("select", "with") or self.at_op("("):
            sub = self._parse_with_or_set_expr()
            self.expect_op(")")
            # reference grammar permits a (meaningless) alias after an
            # IN-subquery: `x IN (SELECT ...) t1` — accept and discard
            self._parse_alias_opt()
            return ast.InSubquery(operand=operand, subquery=sub, negated=negated)
        items = self._parse_expr_list()
        self.expect_op(")")
        return ast.InList(operand=operand, items=items, negated=negated)

    def _parse_concat(self) -> ast.Expr:
        left = self._parse_additive()
        while self.at_op("||"):
            self.advance()
            left = ast.BinaryOp(op="||", left=left, right=self._parse_additive())
        return left

    def _parse_additive(self) -> ast.Expr:
        left = self._parse_multiplicative()
        while self.at_op("+", "-"):
            op = self.advance().text
            left = ast.BinaryOp(op=op, left=left, right=self._parse_multiplicative())
        return left

    def _parse_multiplicative(self) -> ast.Expr:
        left = self._parse_unary()
        while self.at_op("*", "/", "%"):
            op = self.advance().text
            left = ast.BinaryOp(op=op, left=left, right=self._parse_unary())
        return left

    def _parse_unary(self) -> ast.Expr:
        if self.at_op("-"):
            self.advance()
            operand = self._parse_unary()
            if isinstance(operand, ast.NumberLit):
                return ast.NumberLit(value=-operand.value)
            return ast.UnaryOp(op="-", operand=operand)
        if self.at_op("+"):
            self.advance()
            return self._parse_unary()
        return self._parse_primary()

    # --------------------------------------------------------------- primary

    def _parse_primary(self) -> ast.Expr:
        tok = self.cur
        if tok.kind == NUMBER:
            self.advance()
            return ast.NumberLit(value=parse_number(tok.text))
        if tok.kind == STRING:
            self.advance()
            return ast.StringLit(value=tok.text)
        if self.at_op("("):
            self.advance()
            if self.at_kw("select", "with"):
                sub = self._parse_with_or_set_expr()
                self.expect_op(")")
                return ast.ScalarSubquery(subquery=sub)
            expr = self.parse_expr()
            self.expect_op(")")
            return expr
        if self.at_op("*"):
            # only valid inside count(*) — FuncCall path handles it
            self._fail("'*' is only valid in COUNT(*) or as a select item")
        if tok.kind == QIDENT:
            return self._parse_column_or_call()
        if tok.kind != IDENT:
            self._fail("expected expression")

        kw = tok.text.lower()
        if kw == "case":
            return self._parse_case()
        if kw == "cast":
            return self._parse_cast()
        if kw == "exists":
            self.advance()
            self.expect_op("(")
            sub = self.parse_set_expr()
            self.expect_op(")")
            return ast.ExistsSubquery(subquery=sub)
        if kw == "null":
            self.advance()
            return ast.NullLit()
        if kw == "true":
            self.advance()
            return ast.BoolLit(value=True)
        if kw == "false":
            self.advance()
            return ast.BoolLit(value=False)
        if kw == "interval":
            return self._parse_interval()
        if kw == "substring" and self.peek().kind == OP \
                and self.peek().text == "(":
            # ANSI SUBSTRING(x FROM a [FOR b]) (plain substring(x, a, b)
            # is handled by the generic call path)
            save = self._pos
            self.advance()
            self.advance()
            operand = self.parse_expr()
            if not self.at_kw("from"):
                self._pos = save
            else:
                self.advance()
                start = self.parse_expr()
                args = [operand, start]
                if self.accept_kw("for"):
                    args.append(self.parse_expr())
                else:
                    args.append(ast.NumberLit(value=2147483647))
                self.expect_op(")")
                return ast.FuncCall(name="substring", args=args)
        if kw == "position" and self.peek().kind == OP \
                and self.peek().text == "(":
            # ANSI POSITION(needle IN haystack)
            save = self._pos
            self.advance()
            self.advance()
            # concat-level parse: IN must stay unconsumed as the separator
            needle = self._parse_concat()
            if not self.at_kw("in"):
                self._pos = save
            else:
                self.advance()
                haystack = self.parse_expr()
                self.expect_op(")")
                # instr-style (haystack, needle) argument order
                return ast.FuncCall(name="instr", args=[haystack, needle])
        if kw == "trim" and self.peek().kind == OP and self.peek().text == "(":
            # ANSI TRIM([BOTH|LEADING|TRAILING] [chars] FROM x)
            save = self._pos
            self.advance()
            self.advance()
            side = "both"
            if self.at_kw("both", "leading", "trailing"):
                side = self.advance().text.lower()
            chars: ast.Expr | None = None
            if not self.at_kw("from"):
                if self.at_op(")"):  # plain trim(x) fell through oddly
                    self._pos = save
                else:
                    chars = self.parse_expr()
            if self.at_kw("from"):
                self.advance()
                operand = self.parse_expr()
                self.expect_op(")")
                fname = {"both": "trim", "leading": "ltrim",
                         "trailing": "rtrim"}[side]
                args = [operand] if chars is None else [operand, chars]
                return ast.FuncCall(name=fname, args=args)
            self._pos = save
        if kw == "extract" and self.peek().kind == OP \
                and self.peek().text == "(":
            # ANSI EXTRACT(unit FROM expr) → unit(expr)
            self.advance()
            self.advance()
            if self.cur.kind != IDENT:
                self._fail("expected time unit in EXTRACT")
            unit = self.advance().text.lower()
            self.expect_kw("from")
            operand = self.parse_expr()
            self.expect_op(")")
            return ast.FuncCall(name=unit, args=[operand])
        if kw == "timestamp" and self.peek().kind == OP and self.peek().text == "(":
            # TIMESTAMP('YYYY-MM-DD'[, 'HH:MM:SS']) literal (reference
            # grammar sql.lark:147-156)
            self.advance()
            self.advance()
            if self.cur.kind != STRING:
                self._fail("TIMESTAMP() expects string literal arguments")
            date_part = self.advance().text
            time_part = None
            if self.accept_op(","):
                if self.cur.kind != STRING:
                    self._fail("TIMESTAMP() expects string literal arguments")
                time_part = self.advance().text
            self.expect_op(")")
            text = date_part if time_part is None else f"{date_part} {time_part}"
            return ast.Cast(operand=ast.StringLit(value=text), type_name="timestamp")
        return self._parse_column_or_call()

    def _parse_column_or_call(self) -> ast.Expr:
        name_tok = self.advance()
        name = name_tok.text
        # function call
        if name_tok.kind == IDENT and self.at_op("("):
            return self._parse_func_call(name)
        # qualified column: qualifier.column
        if self.at_op(".") and self.peek().kind in (IDENT, QIDENT):
            self.advance()
            col = self.advance().text
            return ast.ColumnRef(name=col, table=name)
        if name_tok.kind == IDENT and name.lower() in RESERVED:
            self._fail(f"unexpected keyword {name!r} in expression")
        return ast.ColumnRef(name=name)

    def _parse_func_call(self, name: str) -> ast.Expr:
        fname = name.lower()
        self.expect_op("(")
        distinct = False
        is_star = False
        args: list[ast.Expr] = []
        if self.at_op("*"):
            self.advance()
            is_star = True
        elif not self.at_op(")"):
            distinct = self.accept_kw("distinct")
            args = self._parse_expr_list()
        self.expect_op(")")
        call = ast.FuncCall(name=fname, args=args, distinct=distinct, is_star=is_star)
        # SQL:2003 FILTER (WHERE cond) — only treat as the clause when the
        # '(' follows, so `count(x) filter` can still be an alias
        if self.at_kw("filter") and self.peek().kind == OP \
                and self.peek().text == "(":
            self.advance()
            self.advance()
            self.expect_kw("where")
            call.filter_where = self.parse_expr()
            self.expect_op(")")
        # IGNORE NULLS / RESPECT NULLS (lag/lead/first_value/last_value/
        # nth_value); RESPECT NULLS is the default → parsed and dropped
        if self.at_kw("ignore", "respect") and \
                self.peek().kind == IDENT and \
                self.peek().text.lower() == "nulls":
            call.ignore_nulls = self.advance().text.lower() == "ignore"
            self.advance()
        if self.at_kw("over"):
            self.advance()
            # OVER w → named-window reference (resolved at compile time
            # against the WINDOW clause; reference stubs this — sql.lark:144)
            if self.cur.kind in (IDENT, QIDENT) and \
                    self.cur.text.lower() not in RESERVED:
                return ast.WindowFunc(
                    func=call,
                    window=ast.WindowSpec(ref=self.advance().text.lower()),
                )
            return ast.WindowFunc(func=call, window=self._parse_window_spec())
        return call

    def _parse_window_spec(self) -> ast.WindowSpec:
        self.expect_op("(")
        spec = ast.WindowSpec()
        if self.at_kw("partition"):
            self.advance()
            self.expect_kw("by")
            spec.partition_by = self._parse_expr_list()
        if self.at_kw("order"):
            self.advance()
            self.expect_kw("by")
            spec.order_by = self._parse_order_items()
        if self.at_kw("rows", "range"):
            spec.frame_type = self.advance().text.lower()
            if self.accept_kw("between"):
                spec.frame_start = self._parse_frame_bound()
                self.expect_kw("and")
                spec.frame_end = self._parse_frame_bound()
            else:
                spec.frame_start = self._parse_frame_bound()
                # bare start bound → end = CURRENT ROW (reference
                # sql_clause_objects.py:68-72 default Following(0))
                spec.frame_end = ast.FrameBound(kind="current_row")
        self.expect_op(")")
        return spec

    def _parse_frame_bound(self) -> ast.FrameBound:
        if self.accept_kw("unbounded"):
            if self.accept_kw("preceding"):
                return ast.FrameBound(kind="unbounded_preceding")
            self.expect_kw("following")
            return ast.FrameBound(kind="unbounded_following")
        if self.at_kw("current"):
            self.advance()
            self.expect_kw("row")
            return ast.FrameBound(kind="current_row")
        if self.cur.kind == NUMBER:
            n = self._parse_int("frame bound")
            if self.accept_kw("preceding"):
                return ast.FrameBound(kind="offset", offset=-n)
            self.expect_kw("following")
            return ast.FrameBound(kind="offset", offset=n)
        if self.at_kw("interval"):
            # RANGE BETWEEN INTERVAL 'n' unit PRECEDING ... (time frames
            # over a timestamp ORDER BY key; extension — reference grammar
            # has no frames at all)
            iv = self._parse_interval()
            if self.accept_kw("preceding"):
                return ast.FrameBound(kind="interval", offset=-1, interval=iv)
            self.expect_kw("following")
            return ast.FrameBound(kind="interval", offset=1, interval=iv)
        self._fail("expected frame bound")

    def _parse_case(self) -> ast.Expr:
        self.expect_kw("case")
        # simple form: CASE operand WHEN v THEN r ... (extension)
        operand = None
        if not self.at_kw("when"):
            operand = self.parse_expr()
        whens: list[tuple[ast.Expr, ast.Expr]] = []
        while self.accept_kw("when"):
            cond = self.parse_expr()
            if operand is not None:
                cond = ast.BinaryOp(op="=", left=operand, right=cond)
            self.expect_kw("then")
            whens.append((cond, self.parse_expr()))
        if not whens:
            self._fail("CASE requires at least one WHEN clause")
        else_ = None
        if self.accept_kw("else"):
            else_ = self.parse_expr()
        self.expect_kw("end")
        return ast.Case(whens=whens, else_=else_)

    def _parse_cast(self) -> ast.Expr:
        self.expect_kw("cast")
        self.expect_op("(")
        operand = self.parse_expr()
        self.expect_kw("as")
        type_name = self._parse_type_name()
        self.expect_op(")")
        return ast.Cast(operand=operand, type_name=type_name)

    def _parse_type_name(self) -> str:
        if self.cur.kind != IDENT:
            self._fail("expected type name")
        base = self.advance().text.lower()
        if base == "double" and self.at_kw("precision"):
            self.advance()
            return "double"
        if self.at_op("("):
            self.advance()
            params = [str(self._parse_int("type parameter"))]
            while self.accept_op(","):
                params.append(str(self._parse_int("type parameter")))
            self.expect_op(")")
            if base in ("decimal", "numeric"):
                return f"decimal({','.join(params)})"
            return base  # varchar(n)/char(n) length is ignored
        return base

    def _parse_interval(self) -> ast.Expr:
        self.expect_kw("interval")
        if self.cur.kind == NUMBER:
            value = parse_number(self.advance().text)
        elif self.cur.kind == STRING:
            text = self.advance().text.strip()
            parts = text.split()
            value = parse_number(parts[0])
            if len(parts) == 2:
                unit = parts[1].lower()
                if unit not in _INTERVAL_UNITS:
                    self._fail(f"unknown interval unit {unit!r}")
                return ast.IntervalLit(value=value, unit=unit.rstrip("s"))
        else:
            self._fail("expected number after INTERVAL")
        if self.cur.kind != IDENT or self.cur.text.lower() not in _INTERVAL_UNITS:
            self._fail("expected interval unit (second/minute/hour/day/...)")
        unit = self.advance().text.lower().rstrip("s")
        return ast.IntervalLit(value=value, unit=unit)
