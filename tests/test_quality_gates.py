"""Quantitative gates for the heuristic/approximate operators.

Each test plants ground truth (known near-duplicates, known-language
documents, clustered embeddings) and asserts a recall/precision/accuracy
floor, so a regression in minhash banding, simhash bit-packing, LSH
bucketing, IVF probing, or the language heuristic fails loudly instead of
silently degrading output quality.
"""

from __future__ import annotations

import random
import warnings

import numpy as np
import pytest
from pyspark.sql import functions as F

from sql_to_ibis_spark.operators import dedup, similarity, text

VOCAB = [f"word{i:03d}" for i in range(500)]


def _doc(rng: random.Random, n_words: int = 120) -> str:
    return " ".join(rng.choice(VOCAB) for _ in range(n_words))


def _perturb(rng: random.Random, doc: str, n_edits: int) -> str:
    words = doc.split()
    for _ in range(n_edits):
        words[rng.randrange(len(words))] = rng.choice(VOCAB)
    return " ".join(words)


@pytest.fixture(scope="module")
def planted_docs(spark):
    """60 base docs; ids 0..29 each have a near-dup at id+1000 (2-word edit
    → 5-shingle jaccard ≈ 0.85); ids 30..59 are unrelated singletons."""
    rng = random.Random(1234)
    rows = []
    for i in range(60):
        base = _doc(rng)
        rows.append((i, base))
        if i < 30:
            rows.append((i + 1000, _perturb(rng, base, 2)))
    return spark.createDataFrame(rows, ["doc_id", "text"]).persist()


def test_minhash_lsh_recall_and_precision(planted_docs):
    cands = dedup.minhash_lsh_candidates(planted_docs).collect()
    got = {(r["id_a"], r["id_b"]) for r in cands}
    truth = {(i, i + 1000) for i in range(30)}
    recall = len(got & truth) / len(truth)
    assert recall >= 0.9, f"planted-dup recall {recall:.2f} < 0.9"
    # precision of the strong candidates: est_jaccard >= 0.5 should be
    # planted pairs only (unrelated random docs share ~no shingles)
    strong = {(r["id_a"], r["id_b"]) for r in cands if r["est_jaccard"] >= 0.5}
    false_strong = strong - truth
    assert not false_strong, f"false strong candidates: {false_strong}"


def test_ngram_jaccard_exact_value(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e g")], ["doc_id", "text"])
    cands = spark.createDataFrame([(1, 2)], ["id_a", "id_b"])
    out = dedup.ngram_jaccard_verify(df, cands, threshold=0.0).collect()
    # shingles: {abcde, bcdef} vs {abcde, bcdeg} → jaccard = 1/3
    assert out[0]["jaccard"] == pytest.approx(0.3333, abs=1e-4)


def test_ngram_jaccard_verify_recall(planted_docs):
    cands = dedup.minhash_lsh_candidates(planted_docs).select("id_a", "id_b")
    verified = dedup.ngram_jaccard_verify(planted_docs, cands, threshold=0.7)
    got = {(r["id_a"], r["id_b"]) for r in verified.collect()}
    truth = {(i, i + 1000) for i in range(30)}
    recall = len(got & truth) / len(truth)
    assert recall >= 0.9, f"verified-dup recall {recall:.2f} < 0.9"
    assert not (got - truth), f"false verified pairs: {got - truth}"


def test_simhash_recall_on_single_edit_dups(spark):
    rng = random.Random(99)
    rows = []
    for i in range(30):
        base = _doc(rng)
        rows.append((i, base))
        rows.append((i + 1000, _perturb(rng, base, 1)))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {(r["id_a"], r["id_b"])
           for r in dedup.simhash_buckets(df).collect()}
    truth = {(i, i + 1000) for i in range(30)}
    recall = len(got & truth) / len(truth)
    assert recall >= 0.8, f"simhash recall {recall:.2f} < 0.8"


def test_dedup_clusters_collapses_planted_chains(spark):
    # chains A~B~C where only adjacent pairs are near-dups: transitivity
    # must still collapse each chain to ONE survivor
    rng = random.Random(7)
    rows = []
    for i in range(10):
        a = _doc(rng)
        b = _perturb(rng, a, 2)
        c = _perturb(rng, b, 2)
        rows += [(i * 10, a), (i * 10 + 1, b), (i * 10 + 2, c)]
    for i in range(20):  # unrelated singletons
        rows.append((5000 + i, _doc(rng)))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = dedup.dedup_clusters(df, jaccard_threshold=0.7)
    n = out.count()
    # 10 chains → 10 survivors, plus 20 singletons
    assert n == 30, f"expected 30 survivors, got {n}"


def test_connected_components_warns_when_not_converged(spark):
    # a 12-node chain cannot converge in 2 min-label iterations
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], ["id_a", "id_b"])
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        dedup.connected_components(pairs, max_iterations=2,
                                   local_threshold=0).count()
    assert any("did not converge" in str(w.message) for w in caught)


def test_connected_components_chain_converges(spark):
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], ["id_a", "id_b"])
    labels = dedup.connected_components(pairs).collect()
    assert all(r["component"] == 0 for r in labels)


def test_connected_components_log_rounds_on_long_chain(spark):
    # Scale evidence for the pointer-jumping design: a path graph of
    # diameter d must converge in O(log d) rounds, not O(d). For a 96-node
    # chain (d = 95), plain min-label propagation needs 95 rounds; with
    # pointer jumping the label horizon at least doubles per round, so
    # ceil(log2(95)) + 2 = 9 rounds is a hard ceiling. A graph of diameter
    # 2^20 would need ~22 — the default cap of 20 handles any near-dup
    # cluster a real corpus produces (dup clusters are dense, not paths).
    n = 96
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], ["id_a", "id_b"])
    stats: dict = {}
    labels = dedup.connected_components(pairs, max_iterations=20,
                                        stats=stats,
                                        local_threshold=0).collect()
    assert all(r["component"] == 0 for r in labels)
    assert stats["converged"]
    assert stats["mode"] == "distributed"
    import math

    bound = math.ceil(math.log2(n - 1)) + 2
    assert stats["iterations"] <= bound, (
        f"pointer jumping took {stats['iterations']} rounds on a "
        f"{n}-node chain; O(log d) bound is {bound}")


# ------------------------------------------------------------- embeddings

DIM = 32


@pytest.fixture(scope="module")
def planted_embs(spark):
    """ids 0..19 each have a near-identical twin at id+1000 (cos > 0.999);
    ids 20..79 are random unit vectors (pairwise cos ≪ 0.9)."""
    rng = np.random.default_rng(42)
    rows = []
    for i in range(80):
        v = rng.standard_normal(DIM)
        v /= np.linalg.norm(v)
        rows.append((i, [float(x) for x in v]))
        if i < 20:
            w = v + 1e-3 * rng.standard_normal(DIM)
            w /= np.linalg.norm(w)
            rows.append((i + 1000, [float(x) for x in w]))
    return spark.createDataFrame(rows, ["vec_id", "embedding"]).persist()


def test_embedding_near_dup_recall(planted_embs):
    got = {(r["id_a"], r["id_b"])
           for r in similarity.embedding_near_duplicates(
               planted_embs, threshold=0.99, dim=DIM).collect()}
    truth = {(i, i + 1000) for i in range(20)}
    recall = len(got & truth) / len(truth)
    assert recall >= 0.9, f"embedding near-dup recall {recall:.2f} < 0.9"
    assert not (got - truth), f"false near-dup pairs: {got - truth}"


def test_lsh_ann_finds_twin_as_top_neighbor(planted_embs):
    out = similarity.lsh_ann_candidates(
        planted_embs, dim=DIM, n_planes=8, k=1).collect()
    top = {r["query_id"]: r["neighbor_id"] for r in out if r["rank"] == 1}
    hits = sum(1 for i in range(20) if top.get(i) == i + 1000)
    assert hits >= 16, f"LSH ANN twin-hit {hits}/20 < 16"


@pytest.fixture(scope="module")
def clustered_embs(spark):
    """8 well-separated clusters × 30 members for the IVF recall gate."""
    rng = np.random.default_rng(7)
    centers = rng.standard_normal((8, DIM)) * 4
    rows = []
    vid = 0
    for c in range(8):
        for _ in range(30):
            v = centers[c] + 0.1 * rng.standard_normal(DIM)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(rows, ["vec_id", "embedding"]).persist()


def test_ivf_recall_at_production_nprobe(clustered_embs):
    # nprobe < nlist (the approximate production config): top-10 of a
    # clustered query must still be found because its cluster is probed
    exact = [r["vec_id"] for r in similarity.cosine_topk_vs_query(
        clustered_embs, query_vec_id=0, k=10).collect()]
    approx = [r["vec_id"] for r in similarity.ivf_ann_topk(
        clustered_embs, query_vec_id=0, k=10, nlist=8, nprobe=2).collect()]
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.8, f"IVF recall@10 {recall:.2f} < 0.8 at nprobe=2/nlist=8"


def test_ivf_batch_matches_single_query(clustered_embs):
    # the batched API (one index build, many probes) must agree with the
    # single-query path per query
    qids = [0, 30, 60]
    batch = similarity.ivf_ann_topk_batch(
        clustered_embs, query_vec_ids=qids, k=5, nlist=8, nprobe=2)
    by_q = {}
    for r in batch.collect():
        by_q.setdefault(r["query_id"], []).append((r["vec_id"], r["sim"]))
    for q in qids:
        single = [(r["vec_id"], r["sim"]) for r in similarity.ivf_ann_topk(
            clustered_embs, query_vec_id=q, k=5, nlist=8, nprobe=2
        ).select("vec_id", "sim").collect()]
        assert by_q[q] == single, f"batch/single mismatch for query {q}"


def test_ivf_batch_many_queries_one_plan(spark):
    # a realistic query batch (1000 queries) must compile to ONE joined
    # plan — the old per-query implementation built 1000 plans chained by
    # unionAll (driver bottleneck + plan-size bomb at batch scale)
    rng = np.random.default_rng(11)
    rows = [(i, [float(x) for x in rng.standard_normal(DIM)])
            for i in range(1000)]
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qids = list(range(1000))
    lazy, assigned = similarity._ivf_batch_plan(
        embs, qids, k=3, nlist=8, nprobe=2, id_col="vec_id",
        vec_col="embedding")
    try:
        plan = lazy._jdf.queryExecution().optimizedPlan().toString()
        assert "Union" not in plan, "batched IVF must not union per-query plans"
        assert plan.count("Join") == 1, plan
        counts = {r["query_id"]: r["n"]
                  for r in lazy.groupBy("query_id")
                             .agg(F.count(F.lit(1)).alias("n")).collect()}
        assert len(counts) == 1000
        assert all(n == 3 for n in counts.values())
    finally:
        assigned.unpersist()


def test_ivf_batch_missing_query_raises(clustered_embs):
    with pytest.raises(ValueError, match="not found"):
        similarity.ivf_ann_topk_batch(clustered_embs,
                                      query_vec_ids=[999999], k=3)


# ------------------------------------------------------------- null rows
# Real corpora have null text/embedding rows; the Arrow-batched kernels must
# propagate NULL (as the earlier pure-JVM expressions did), never crash the
# batch, and never pair null docs with each other.


def test_minhash_lsh_null_text_rows(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "a b c d e f g"), (3, None), (4, None)],
        ["doc_id", "text"])
    pairs = dedup.minhash_lsh_candidates(df).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in got
    assert all(3 not in p and 4 not in p for p in got), (
        f"null docs must not pair: {got}")


def test_simhash_null_text_rows(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g h i j"), (2, "a b c d e f g h i j"),
         (3, None), (4, None)],
        ["doc_id", "text"])
    got = {(r["id_a"], r["id_b"])
           for r in dedup.simhash_buckets(df, max_hamming=3).collect()}
    assert (1, 2) in got
    assert all(3 not in p and 4 not in p for p in got)


def test_dedup_clusters_with_null_text(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "a b c d e f g"), (3, None)],
        ["doc_id", "text"])
    kept = sorted(r["doc_id"]
                  for r in dedup.dedup_clusters(df).select("doc_id").collect())
    assert kept == [1, 3]  # dup collapsed, null row kept untouched


def test_embedding_ops_null_rows(spark):
    rng = np.random.default_rng(3)
    rows = []
    for i in range(30):
        v = rng.standard_normal(DIM)
        v /= np.linalg.norm(v)
        rows.append((i, [float(x) for x in v]))
    rows.append((0 + 1000, rows[0][1]))  # exact twin of id 0
    rows.append((9990, None))
    rows.append((9991, None))
    schema = "vec_id long, embedding array<double>"
    embs = spark.createDataFrame(rows, schema)
    near = {(r["id_a"], r["id_b"])
            for r in similarity.embedding_near_duplicates(
                embs, threshold=0.99, dim=DIM).collect()}
    assert (0, 1000) in near
    assert all(9990 not in p and 9991 not in p for p in near)
    ann = similarity.lsh_ann_candidates(embs, dim=DIM, n_planes=6, k=3)
    ann_ids = {r["query_id"] for r in ann.collect()}
    assert 9990 not in ann_ids and 9991 not in ann_ids
    assigned, _ = similarity.build_ivf_index(embs, nlist=4)
    ids = {r["id"] for r in assigned.select("id").collect()}
    assert 9990 not in ids and 9991 not in ids  # nulls not indexed


# ------------------------------------------------------------ language id

_SAMPLES = {
    "en": "the quick fox and the lazy dog that was in the yard with a ball",
    "de": "der hund und die katze sind nicht in das haus mit einem ball",
    "fr": "le chien et le chat sont dans la maison avec une balle pour les enfants",
    "es": "el perro y el gato que no están en la casa con una pelota para los",
    "zh": "这是一个关于猫和狗的故事 它们住在一个小房子里",
}


def test_language_id_accuracy(spark):
    rows = []
    i = 0
    for lang, sent in _SAMPLES.items():
        for _ in range(5):
            rows.append((i, sent, lang))
            i += 1
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = text.language_id(df).collect()
    correct = sum(1 for r in out if r["lang_pred"] == r["lang"])
    acc = correct / len(out)
    assert acc >= 0.9, f"language-id accuracy {acc:.2f} < 0.9"


def test_quality_score_orders_good_above_garbage(spark):
    df = spark.createDataFrame(
        [(1, "A well formed English sentence with normal words and length, "
             "followed by another one that keeps a sane punctuation ratio."),
         (2, "$$$ ### ~~~ @@@@ !!!! %%% ^^^ &&& *** ((( ))) ___ +++ === ~~~")],
        ["doc_id", "text"])
    scores = {r["doc_id"]: r["quality_score"]
              for r in text.quality_score(df).collect()}
    assert scores[1] > scores[2]


def test_curate_documents_planted_end_to_end(spark):
    """Plant one of each failure mode and assert exactly the right
    survivors come out of the full curation composition."""
    from sql_to_ibis_spark.operators import curate

    rng = random.Random(11)
    base = ("the quick brown fox jumps over the lazy dog and then it runs "
            "into the forest where " + _doc(rng, 60))
    near = base.replace("lazy", "sleepy")          # near-dup of base
    rows = [
        (1, base),
        (2, base),                                  # exact duplicate
        (3, near),                                  # near duplicate
        (4, "$$$ ### !!! ~~~ %%% ^^^ &&& *** ((("),  # garbage quality
        (5, "der hund und die katze sind nicht in das haus und der "
            "mann ist mit das auto und die frau ist für das kind "
            + " und der die das" * 10),             # German
        (6, "a completely different english document about " + _doc(rng, 60)),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = curate.curate_documents(df, min_quality=0.2, languages=["en"],
                                  jaccard_threshold=0.6)
    ids = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    # survivors: 1 (canonical of {1,2,3}) and 6; garbage/German/dups gone
    assert ids == [1, 6], f"unexpected survivors {ids}"
    row = {r["doc_id"]: r for r in out.collect()}
    assert row[1]["lang_pred"] == "en" and row[1]["n_tokens"] > 0
