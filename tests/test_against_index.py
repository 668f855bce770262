"""Incremental / cross-corpus dedup (r14): a NEW shard deduped AGAINST a
frozen corpus's MinHash-LSH band index — production pipelines dedup each
incoming shard against the existing corpus, not the corpus against
itself.

Pins: planted cross-corpus near-dups are found and verified; a shard
with no overlap yields nothing; the probe join elides the index-side
shuffle when the index is snapshot-bucketed on the band key.
"""

from __future__ import annotations

import pytest

from sql_to_ibis_spark import SqlEngine
from sql_to_ibis_spark.operators import dedup
from tests.conftest import SF_DIR


@pytest.fixture()
def corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "completely different text about spark execution engines"),
        (3, "yet another unrelated document mentioning parquet footers"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_planted_cross_dup_found(spark, corpus):
    shard = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog again and "
               "again"),                      # near-identical to doc 1
         (101, "fresh novel content with no counterpart in the corpus")],
        "doc_id long, text string")
    index = dedup.build_minhash_index(corpus)
    cands = dedup.against_index(shard, index)
    got = {(r["id_a"], r["id_b"]) for r in cands.collect()}
    assert (100, 1) in got
    assert all(a == 100 for a, _ in got)
    # exact verification over the union
    union = corpus.unionByName(shard)
    ver = dedup.ngram_jaccard_verify(
        union, cands.select("id_a", "id_b"), threshold=0.8).collect()
    assert {(r["id_a"], r["id_b"]) for r in ver} == {(100, 1)}


def test_disjoint_shard_yields_nothing(spark, corpus):
    shard = spark.createDataFrame(
        [(200, "zzz qqq completely novel tokens xyzzy plugh")],
        "doc_id long, text string")
    index = dedup.build_minhash_index(corpus)
    assert dedup.against_index(shard, index).count() == 0


def test_bucketed_index_probes_without_index_shuffle(spark):
    # deployment shape: the frozen index snapshot-bucketed on the band
    # key — the probe equi join reads the bucketed scan's partitioning,
    # so ONLY the shard side exchanges
    from sql_to_ibis_spark.sources.readers import read_parquet

    eng = SqlEngine(spark)
    eng.register_dir(SF_DIR)
    docs = read_parquet(spark, f"{SF_DIR}/documents.parquet")
    from pyspark.sql import functions as F

    frozen = docs.filter(F.col("doc_id") % 7 != 0)
    shard = docs.filter(F.col("doc_id") % 7 == 0)
    eng.register_temp_table(dedup.build_minhash_index(frozen),
                            "band_index")
    eng.snapshot_bucketed("band_index", ["band", "bh"], num_buckets=8,
                          refresh=True)
    index = eng.catalog.get("band_index").df
    # at test scale the tiny shard would broadcast (also zero index-side
    # shuffle, trivially); disable broadcast to pin the at-scale shape —
    # a shuffle join whose index side reads bucketed, no exchange
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        cands = dedup.against_index(shard, index)
        plan = cands._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan, plan
        # exactly ONE band-key exchange: the shard side; the bucketed
        # index scan feeds the join directly
        assert plan.count("Exchange hashpartitioning(band") == 1, plan
        bucketed = {(r["id_a"], r["id_b"]) for r in cands.collect()}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10m")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold",
                       "64m")
    # ground truth unchanged by the layout
    stock = {(r["id_a"], r["id_b"])
             for r in dedup.against_index(
                 shard, dedup.build_minhash_index(frozen)).collect()}
    assert stock == bucketed
