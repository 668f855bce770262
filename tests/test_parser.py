"""Parser/AST unit tests — no Spark session needed."""

import pytest

from sql_to_ibis_spark.errors import InvalidQueryException
from sql_to_ibis_spark.plans import ast
from sql_to_ibis_spark.plans.parser import parse


def test_simple_select():
    node = parse("SELECT a, b FROM t")
    assert isinstance(node, ast.SelectNode)
    assert [i.expr.name for i in node.items] == ["a", "b"]
    assert node.relations[0].name == "t"


def test_star_and_table_star():
    node = parse("select *, t.* from t")
    assert isinstance(node.items[0].expr, ast.Star)
    assert node.items[1].expr.table == "t"


def test_alias_forms():
    node = parse('SELECT a AS x, b y, c AS "space name" FROM t')
    assert [i.alias for i in node.items] == ["x", "y", "space name"]


def test_math_precedence():
    node = parse("SELECT 1 + 2 * 3 - 2")
    e = node.items[0].expr
    # ((1 + (2*3)) - 2)
    assert isinstance(e, ast.BinaryOp) and e.op == "-"
    assert isinstance(e.left, ast.BinaryOp) and e.left.op == "+"
    assert isinstance(e.left.right, ast.BinaryOp) and e.left.right.op == "*"


def test_comparison_and_boolean():
    node = parse("SELECT a FROM t WHERE x > 1 AND y = 'z' OR NOT w < 2")
    w = node.where
    assert isinstance(w, ast.BinaryOp) and w.op == "or"
    assert w.left.op == "and"
    assert isinstance(w.right, ast.UnaryOp) and w.right.op == "not"


def test_between_in_isnull_like():
    node = parse(
        "SELECT a FROM t WHERE a BETWEEN 1 AND 2 AND b IN (1,2,3) "
        "AND c IS NOT NULL AND d NOT IN ('x') AND e LIKE 'a%' AND f NOT BETWEEN 3 AND 4"
    )
    kinds = []
    def walk(e):
        if isinstance(e, ast.BinaryOp) and e.op == "and":
            walk(e.left); walk(e.right)
        else:
            kinds.append(type(e).__name__)
    walk(node.where)
    assert kinds == ["Between", "InList", "IsNull", "InList", "Like", "Between"]


def test_case_cast_coalesce():
    node = parse(
        "SELECT CASE WHEN a > 1 THEN 'hi' ELSE 'lo' END, CAST(b AS int), COALESCE(c, 0) FROM t"
    )
    assert isinstance(node.items[0].expr, ast.Case)
    assert node.items[1].expr.type_name == "int"
    assert node.items[2].expr.name == "coalesce"


def test_case_requires_when():
    with pytest.raises(InvalidQueryException):
        parse("SELECT CASE END FROM t")


def test_join_kinds():
    node = parse(
        "SELECT * FROM a JOIN b ON a.x = b.x LEFT OUTER JOIN c ON b.y = c.y "
        "CROSS JOIN d"
    )
    j = node.relations[0]
    assert isinstance(j, ast.Join) and j.kind == "cross"
    assert j.left.kind == "left"
    assert j.left.left.kind == "inner"


def test_comma_from_is_cross():
    node = parse("SELECT * FROM a, b")
    assert len(node.relations) == 2


def test_group_having_order_limit_offset():
    node = parse(
        "SELECT a, sum(b) FROM t GROUP BY a HAVING sum(b) > 1 "
        "ORDER BY a DESC LIMIT 10 OFFSET 5"
    )
    assert len(node.group_by) == 1
    assert node.having is not None
    assert node.order_by[0].ascending is False
    assert node.limit == 10 and node.offset == 5


def test_setop_chain_and_trailing_order():
    node = parse("SELECT a FROM t UNION ALL SELECT a FROM u ORDER BY a LIMIT 3")
    assert isinstance(node, ast.SetOpNode) and node.op == "union_all"
    assert node.order_by and node.limit == 3
    assert not node.left.order_by and node.left.limit is None


def test_intersect_binds_tighter():
    node = parse("SELECT a FROM t UNION SELECT a FROM u INTERSECT SELECT a FROM v")
    assert node.op == "union"
    assert node.right.op == "intersect"


def test_subquery_requires_alias():
    with pytest.raises(InvalidQueryException):
        parse("SELECT * FROM (SELECT a FROM t)")
    node = parse("SELECT * FROM (SELECT a FROM t) s")
    assert node.relations[0].alias == "s"


def test_in_subquery():
    node = parse("SELECT a FROM t WHERE a IN (SELECT b FROM u)")
    assert isinstance(node.where, ast.InSubquery)


def test_window_frames():
    node = parse(
        "SELECT sum(a) OVER (PARTITION BY p ORDER BY o ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) FROM t"
    )
    w = node.items[0].expr.window
    assert w.frame_type == "rows"
    assert w.frame_start.offset == -2
    assert w.frame_end.kind == "current_row"


def test_bare_frame_bound_implies_current_row_end():
    node = parse("SELECT sum(a) OVER (ORDER BY o ROWS 3 PRECEDING) FROM t")
    w = node.items[0].expr.window
    assert w.frame_start.offset == -3 and w.frame_end.kind == "current_row"


def test_rank_over():
    node = parse("SELECT rank() OVER (PARTITION BY p ORDER BY o DESC) FROM t")
    e = node.items[0].expr
    assert isinstance(e, ast.WindowFunc) and e.func.name == "rank"
    assert e.window.order_by[0].ascending is False


def test_count_star_and_distinct():
    node = parse("SELECT count(*), count(distinct a) FROM t")
    assert node.items[0].expr.is_star
    assert node.items[1].expr.distinct


def test_timestamp_literal():
    node = parse("SELECT TIMESTAMP('2021-01-01', '10:00:00')")
    e = node.items[0].expr
    assert isinstance(e, ast.Cast) and e.type_name == "timestamp"
    assert e.operand.value == "2021-01-01 10:00:00"


def test_boolean_literals_work():
    # the reference's grammar stubs these (sql.lark:136-137); we support them
    node = parse("SELECT true, false, NULL")
    assert node.items[0].expr.value is True
    assert node.items[1].expr.value is False
    assert isinstance(node.items[2].expr, ast.NullLit)


def test_quoted_identifiers():
    node = parse('SELECT "Equip Slots", t."Lv 50 HP" FROM t')
    assert node.items[0].expr.name == "Equip Slots"
    assert node.items[1].expr.table == "t"


def test_comments_and_semicolon():
    node = parse("SELECT a -- comment\nFROM t /* block */ ;")
    assert node.relations[0].name == "t"


def test_trailing_garbage_rejected():
    with pytest.raises(InvalidQueryException):
        parse("SELECT a FROM t wat wat")


def test_negative_numbers_fold():
    node = parse("SELECT -5, -a FROM t")
    assert node.items[0].expr.value == -5
    assert isinstance(node.items[1].expr, ast.UnaryOp)


def test_parse_error_has_position():
    with pytest.raises(InvalidQueryException) as exc:
        parse("SELECT FROM t")
    assert "line 1" in str(exc.value)
