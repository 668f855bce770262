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
