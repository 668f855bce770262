"""Z-order clustering + size-targeted writes (sources/layout.py).

The claims under test are the scale claims: a Z-ordered layout makes
parquet footers min/max-tight on EVERY clustered column, so file-level
stats pruning works for selective predicates on any of them — where an
arbitrary (hash-shuffled) layout prunes nothing. Measured here from the
footers themselves via ``file_prune_fraction`` (no Spark scan involved,
fully deterministic given the layout)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from sql_to_ibis_spark.sources import layout


def test_interleave_bits_known_values():
    # col0 bucket 0b11, col1 bucket 0b01 → bits interleave as
    # z = sum over i of (b0_i << (2i)) | (b1_i << (2i+1))
    b0 = np.array([0b11], dtype=np.int64)
    b1 = np.array([0b01], dtype=np.int64)
    z = layout._interleave_bits([b0, b1], bits_per_col=2)
    # bit0 of col0 → pos 0, bit0 of col1 → pos 1, bit1 of col0 → pos 2,
    # bit1 of col1 → pos 3: 1 + 2 + 4 + 0 = 7
    assert z.tolist() == [0b0111]
    # single column degenerates to identity
    ident = np.arange(16, dtype=np.int64)
    assert layout._interleave_bits([ident], 4).tolist() == list(range(16))


def test_interleave_locality():
    # adjacent z-keys must stay adjacent in every column: max coordinate
    # spread within any 64-key z-window of an 8x8 grid is bounded (the
    # hyper-rectangle property the file layout relies on)
    g = np.arange(256, dtype=np.int64)
    b0, b1 = g % 16, g // 16
    z = layout._interleave_bits([b0, b1], 4)
    order = np.argsort(z)
    for start in range(0, 256, 64):
        w = order[start:start + 64]
        assert b0[w].max() - b0[w].min() <= 8
        assert b1[w].max() - b1[w].min() <= 8


def _grid_df(spark, n=200_000):
    # two INDEPENDENT uniform columns in random row order — the worst case
    # for incidental clustering
    return (spark.range(n)
            .select(F.col("id"),
                    F.pmod(F.xxhash64("id"), F.lit(1000)).alias("a"),
                    F.pmod(F.xxhash64(F.col("id") + 7), F.lit(1000))
                    .alias("b"))
            .repartition(16))


def test_zorder_prunes_both_columns(spark, tmp_path):
    df = _grid_df(spark)
    plain, zord = str(tmp_path / "plain"), str(tmp_path / "zord")
    df.write.parquet(plain)
    layout.write_zordered(df, zord, ["a", "b"], target_files=64)

    # same rows, layout only
    back = spark.read.parquet(zord)
    assert back.count() == df.count()
    assert (back.select(F.sum("a"), F.sum("b")).collect()
            == df.select(F.sum("a"), F.sum("b")).collect())

    for col in ("a", "b"):
        probe = 500
        p_plain = layout.file_prune_fraction(plain, col, probe)
        p_z = layout.file_prune_fraction(zord, col, probe)
        # hash-shuffled files all span ~the full domain
        assert p_plain > 0.9, f"{col}: plain layout unexpectedly pruned"
        # 64 files on a 256x256 bucket lattice → a point predicate on one
        # column should touch ~sqrt(64)=8 of 64 files; allow slack
        assert p_z <= 0.35, (
            f"{col}: z-order read fraction {p_z}, want <=0.35")


def test_zorder_string_column_equality_pruning(spark, tmp_path):
    n = 100_000
    df = (spark.range(n)
          .select(F.concat(F.lit("user_"),
                           F.pmod(F.xxhash64("id"), F.lit(500))
                           .cast("string")).alias("u"),
                  F.col("id").alias("v"))
          .repartition(16))
    plain, zord = str(tmp_path / "plain"), str(tmp_path / "zord")
    df.write.parquet(plain)
    layout.write_zordered(df, zord, ["u"], target_files=32)
    # string bounds exist in footers; clustered files are tight enough
    # that one user's rows live in few files
    p_plain = layout.file_prune_fraction(plain, "u", "user_250")
    p_z = layout.file_prune_fraction(zord, "u", "user_250")
    assert p_plain > 0.9
    assert p_z <= 0.25, f"string z-order read fraction {p_z}"


def test_zorder_null_and_timestamp(spark, tmp_path):
    df = (spark.range(50_000)
          .select(
              F.when(F.col("id") % 100 == 0, None)
              .otherwise(F.col("id")).alias("k"),
              F.timestamp_seconds(F.col("id") * 60).alias("ts"))
          .repartition(8))
    zord = str(tmp_path / "z")
    layout.write_zordered(df, zord, ["k", "ts"], target_files=16)
    back = spark.read.parquet(zord)
    assert back.count() == 50_000
    assert back.filter(F.col("k").isNull()).count() == 500
    assert layout.file_prune_fraction(zord, "k", 25_000) <= 0.5


def test_write_sized_parquet_responds_to_target(spark, tmp_path):
    # ~30 MB of shuffle data; 2 MB vs 8 MB targets must produce clearly
    # different file counts, ordered the right way
    df = spark.range(1_500_000).select(
        "id", F.sha2(F.col("id").cast("string"), 256).alias("pad"))
    small, big = str(tmp_path / "small"), str(tmp_path / "big")
    key = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    before_conf = spark.conf.get(key, None)
    layout.write_sized_parquet(df, small, target_file_mb=2)
    layout.write_sized_parquet(df, big, target_file_mb=8)
    import glob as g
    n_small = len(g.glob(f"{small}/*.parquet"))
    n_big = len(g.glob(f"{big}/*.parquet"))
    assert n_small > n_big >= 1, (n_small, n_big)
    # conf restored
    assert spark.conf.get(key, None) == before_conf


def test_snapshot_zordered_swaps_registration(spark, tmp_path):
    from sql_to_ibis_spark import SqlEngine

    eng = SqlEngine(spark)
    df = _grid_df(spark, 50_000)
    eng.register_temp_table(df, "grid")
    before = eng.query(
        "SELECT count(*) AS n, sum(a) AS sa FROM grid").collect()
    eng.snapshot_zordered("grid", ["a", "b"], target_files=16,
                          snapshot_name=f"zt_{tmp_path.name}",
                          refresh=True)
    after = eng.query(
        "SELECT count(*) AS n, sum(a) AS sa FROM grid").collect()
    assert before == after
    # stats were re-collected over the snapshot files
    st = eng.catalog.get("grid").stats
    assert st is not None and st.rows == 50_000


def test_with_zorder_key_errors(spark):
    df = spark.range(10)
    with pytest.raises(ValueError):
        layout.with_zorder_key(df, [])
    with pytest.raises(ValueError):
        layout.with_zorder_key(df, ["nope"])
