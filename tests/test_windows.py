"""Window functions: aggregates over windows with frames, ranking family."""


def test_cumulative_sum_default_frame(oracle):
    # default frame = RANGE UNBOUNDED PRECEDING → CURRENT ROW
    oracle("SELECT o_orderkey, sum(o_totalprice) OVER "
           "(PARTITION BY o_custkey ORDER BY o_orderkey) AS running FROM orders")


def test_partition_only_window_is_whole_partition(oracle):
    oracle("SELECT o_orderkey, sum(o_totalprice) OVER (PARTITION BY o_custkey) AS tot "
           "FROM orders")


def test_global_window_no_partition(oracle):
    oracle("SELECT o_orderkey, max(o_totalprice) OVER () AS mx FROM orders")


def test_rows_frame(oracle):
    oracle("SELECT o_orderkey, avg(o_totalprice) OVER "
           "(PARTITION BY o_custkey ORDER BY o_orderkey "
           "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS mavg FROM orders")


def test_rows_frame_bare_preceding(oracle):
    oracle("SELECT o_orderkey, sum(o_totalprice) OVER "
           "(ORDER BY o_orderkey ROWS 3 PRECEDING) AS s FROM orders")


def test_rows_unbounded_following(oracle):
    oracle("SELECT o_orderkey, count(*) OVER "
           "(PARTITION BY o_custkey ORDER BY o_orderkey "
           "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS remaining FROM orders")


def test_range_frame_numeric(oracle):
    oracle("SELECT l_orderkey, sum(l_quantity) OVER "
           "(PARTITION BY l_orderkey ORDER BY l_linenumber "
           "RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS s FROM lineitem "
           "WHERE l_orderkey < 100")


def test_rank_and_dense_rank(oracle):
    oracle("SELECT o_custkey, o_orderkey, "
           "rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rnk, "
           "dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS drnk "
           "FROM orders")


def test_row_number_deterministic(oracle):
    oracle("SELECT o_orderkey, row_number() OVER (ORDER BY o_orderkey) AS rn FROM orders")


def test_lag_lead(oracle):
    oracle("SELECT o_orderkey, "
           "lag(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS prev, "
           "lead(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS nxt "
           "FROM orders")


def test_window_in_expression(oracle):
    oracle("SELECT o_orderkey, o_totalprice / sum(o_totalprice) OVER "
           "(PARTITION BY o_custkey) AS share FROM orders")


def test_window_with_where(oracle):
    oracle("SELECT o_orderkey, rank() OVER (ORDER BY o_totalprice DESC) AS rnk "
           "FROM orders WHERE o_orderstatus = 'F'")


def test_ntile(oracle):
    oracle("SELECT o_orderkey, ntile(4) OVER (ORDER BY o_orderkey) AS quartile "
           "FROM orders")


# ---- value functions (first_value / last_value / nth_value) are
# frame-sensitive: they must honor an explicit frame clause, and their
# default frame is RANGE UNBOUNDED PRECEDING..CURRENT ROW when ordered ----


def test_first_value_default_frame(oracle):
    oracle("SELECT o_orderkey, first_value(o_totalprice) OVER "
           "(PARTITION BY o_custkey ORDER BY o_orderkey) AS fv FROM orders")


def test_last_value_default_frame_is_current_row(oracle):
    # the SQL-standard surprise: without an explicit frame, last_value
    # sees only up to the current row's peers
    oracle("SELECT o_orderkey, last_value(o_totalprice) OVER "
           "(PARTITION BY o_custkey ORDER BY o_orderkey) AS lv FROM orders")


def test_last_value_full_frame(oracle):
    oracle("SELECT o_orderkey, last_value(o_totalprice) OVER "
           "(PARTITION BY o_custkey ORDER BY o_orderkey "
           "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS lv "
           "FROM orders")


def test_nth_value_full_frame(oracle):
    oracle("SELECT o_orderkey, nth_value(o_totalprice, 2) OVER "
           "(PARTITION BY o_custkey ORDER BY o_orderkey "
           "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS nv "
           "FROM orders")


def test_first_value_explicit_rows_frame(oracle):
    oracle("SELECT o_orderkey, first_value(o_totalprice) OVER "
           "(PARTITION BY o_custkey ORDER BY o_orderkey "
           "ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS fv FROM orders")


def test_rank_with_frame_clause_rejected(engine):
    import pytest

    from sql_to_ibis_spark.errors import InvalidQueryException

    for fn in ["rank()", "dense_rank()", "row_number()", "lag(o_orderkey)"]:
        with pytest.raises(InvalidQueryException):
            engine.query(
                f"SELECT {fn} OVER (ORDER BY o_orderkey "
                "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS x "
                "FROM orders")


# ---- RANGE BETWEEN INTERVAL frames over timestamp order keys ----


def test_range_interval_preceding(oracle):
    oracle("SELECT event_id, count(*) OVER "
           "(PARTITION BY user_id ORDER BY ts "
           "RANGE BETWEEN INTERVAL '1' HOUR PRECEDING AND CURRENT ROW) AS n "
           "FROM events WHERE user_id < 50")


def test_range_interval_both_sides(oracle):
    oracle("SELECT event_id, CAST(sum(CAST(value AS decimal(18,4))) OVER "
           "(PARTITION BY user_id ORDER BY ts "
           "RANGE BETWEEN INTERVAL '30' MINUTE PRECEDING "
           "AND INTERVAL '30' MINUTE FOLLOWING) AS double) AS s "
           "FROM events WHERE user_id < 50")


def test_range_interval_string_form(oracle):
    oracle("SELECT event_id, count(*) OVER "
           "(PARTITION BY user_id ORDER BY ts "
           "RANGE BETWEEN INTERVAL '2 hours' PRECEDING AND CURRENT ROW) AS n "
           "FROM events WHERE user_id < 50",
           "SELECT event_id, count(*) OVER "
           "(PARTITION BY user_id ORDER BY ts "
           "RANGE BETWEEN INTERVAL '2 hours' PRECEDING AND CURRENT ROW) AS n "
           "FROM events WHERE user_id < 50")


def test_range_interval_rows_rejected(engine):
    import pytest

    from sql_to_ibis_spark.errors import InvalidQueryException

    with pytest.raises(InvalidQueryException):
        engine.query("SELECT count(*) OVER (ORDER BY ts "
                     "ROWS BETWEEN INTERVAL '1' HOUR PRECEDING AND CURRENT ROW"
                     ") AS n FROM events")
