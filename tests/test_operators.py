"""Pipeline operator tests: dedup, similarity, text analysis, multimodal.

Correctness is checked against hand-computable small inputs and DuckDB where
SQL can express the semantics; determinism is asserted for everything (these
run in distributed pipelines where nondeterminism is a correctness bug).
"""

import pytest
from pyspark.sql import functions as F

from sql_to_ibis_spark.operators import dedup, multimodal, similarity, text


@pytest.fixture(scope="module")
def docs(engine):
    return engine.catalog.get("documents").df


@pytest.fixture(scope="module")
def embs(engine):
    return engine.catalog.get("embeddings").df


# ------------------------------------------------------------------- dedup

def test_exact_dedup_keeps_first(spark):
    df = spark.createDataFrame(
        [(1, "a  b"), (2, "A B"), (3, "c")], ["id", "txt"]
    )
    out = dedup.exact_dedup(df, ["txt_norm"], "id", normalize_col="txt")
    rows = {r["id"] for r in out.collect()}
    assert rows == {1, 3}  # "a  b" and "A B" normalize equal; id=1 survives


def test_exact_dedup_plain_key(spark):
    df = spark.createDataFrame([(1, "x"), (2, "x"), (3, "y")], ["id", "k"])
    assert dedup.exact_dedup(df, ["k"], "id").count() == 2


def test_minhash_finds_near_duplicates(spark):
    base = "the quick brown fox jumps over the lazy dog again and again ok"
    rows = [(1, base), (2, base + " yes"), (3, "completely different words "
            "about spark engines and distributed queries at scale")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = dedup.minhash_lsh_candidates(df).collect()
    ids = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in ids
    assert all(3 not in p for p in ids)


def test_minhash_deterministic(docs):
    a = sorted(map(tuple, dedup.minhash_lsh_candidates(docs)
                   .select("id_a", "id_b").collect()))
    b = sorted(map(tuple, dedup.minhash_lsh_candidates(docs)
                   .select("id_a", "id_b").collect()))
    assert a == b and len(a) > 0


def test_minhash_est_jaccard_close_to_exact(docs):
    cands = dedup.minhash_lsh_candidates(docs)
    verified = dedup.ngram_jaccard_verify(docs, cands.select("id_a", "id_b"),
                                          threshold=0.0)
    joined = cands.join(verified, ["id_a", "id_b"]).collect()
    assert len(joined) > 0
    for r in joined:
        assert abs(r["est_jaccard"] - r["jaccard"]) < 0.35  # 64-perm estimate


def test_simhash_near_dup_low_hamming(spark):
    base = ("one two three four five six seven eight nine ten eleven twelve "
            "thirteen fourteen fifteen sixteen")
    rows = [(1, base), (2, base),  # identical → hamming 0, always bucketed
            (3, "alpha beta gamma delta epsilon zeta eta theta iota kappa")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in dedup.simhash_buckets(df).collect()}
    assert pairs[(1, 2)] == 0
    assert (1, 3) not in pairs or pairs[(1, 3)] > 3


# -------------------------------------------------------------- similarity

def test_cosine_topk_matches_duckdb(embs, ddb):
    actual = similarity.cosine_topk_vs_query(embs, query_vec_id=0, k=10).collect()
    expected = ddb.execute("""
        SELECT e.vec_id, round(list_cosine_similarity(
            CAST(e.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])), 4) AS sim
        FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
        WHERE e.vec_id != 0 ORDER BY sim DESC, e.vec_id LIMIT 10
    """).fetchall()
    assert [(r["vec_id"], r["sim"]) for r in actual] == \
        [(v, pytest.approx(s, abs=2e-4)) for v, s in expected]


def test_cosine_self_similarity_is_one(spark):
    df = spark.createDataFrame([(0, [1.0, 2.0, 3.0]), (1, [1.0, 2.0, 3.0]),
                                (2, [-1.0, -2.0, -3.0])],
                               ["vec_id", "embedding"])
    out = {r["vec_id"]: r["sim"]
           for r in similarity.cosine_topk_vs_query(df, 0, 2).collect()}
    assert out[1] == pytest.approx(1.0)
    assert out[2] == pytest.approx(-1.0)


def test_lsh_ann_produces_bucketed_neighbors(embs):
    # 4 hyperplanes → 16 buckets over 500 random vectors (~31 per bucket);
    # every vector sharing a bucket gets ranked by exact cosine
    out = similarity.lsh_ann_candidates(embs, n_planes=4, k=5)
    per_query = out.groupBy("query_id").count().collect()
    assert len(per_query) > 400  # nearly every vector has bucket-mates
    assert all(r["count"] <= 5 for r in per_query)
    ranked = out.filter(F.col("query_id") == 0).orderBy("rank").collect()
    sims = [r["sim"] for r in ranked]
    assert sims == sorted(sims, reverse=True)


def test_lsh_signature_deterministic(embs):
    sig = embs.select(similarity.lsh_signature(F.col("embedding"), 64).alias("s"))
    a = [r["s"] for r in sig.collect()]
    b = [r["s"] for r in sig.collect()]
    assert a == b


# -------------------------------------------------------------------- text

def test_token_stats_vs_duckdb(docs, ddb):
    actual = {r["doc_id"]: (r["n_tokens"], r["alpha_ratio"])
              for r in text.token_stats(docs).collect()}
    for doc_id, nt, ar in ddb.execute("""
        SELECT doc_id, len(regexp_split_to_array(trim(text), '\\s+')),
               round(CAST(length(regexp_replace(text,'[^a-zA-Z]','','g')) AS double)
                     / NULLIF(length(text),0), 6)
        FROM documents""").fetchall():
        assert actual[doc_id][0] == nt
        assert actual[doc_id][1] == pytest.approx(ar, abs=1e-5)


def test_fingerprint_matches_duckdb_md5(docs, ddb):
    actual = {r["doc_id"]: r["fp"] for r in text.fingerprint(docs).collect()}
    for doc_id, fp in ddb.execute("""
        SELECT doc_id, md5(lower(trim(regexp_replace(text,'\\s+',' ','g'))))
        FROM documents""").fetchall():
        assert actual[doc_id] == fp


def test_language_id_detects_real_languages(spark):
    rows = [(1, "the cat and the dog went to the house and it is good"),
            (2, "der hund und die katze sind nicht in das haus für immer"),
            (3, "le chat et le chien sont dans la maison pour un jour"),
            (4, "el perro y el gato es una casa para los amigos con amor"),
            (5, "今天 天气 很好 我们 去 公园")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r["lang_pred"] for r in text.language_id(df).collect()}
    assert out == {1: "en", 2: "de", 3: "fr", 4: "es", 5: "zh"}


def test_quality_score_ranges(docs):
    rows = text.quality_score(docs).collect()
    assert all(0.0 <= r["quality_score"] <= 1.0 for r in rows)
    assert all(r["n_tokens"] > 0 for r in rows)


def test_bpe_ish_token_count(spark):
    df = spark.createDataFrame([(1, "hello world, it's 42 degrees!")],
                               ["doc_id", "text"])
    r = text.bpe_ish_token_count(df).collect()[0]
    # hello | world | , | it | ' | s | 42 | degrees | !  → 9 bpe-ish pieces
    assert r["word_tokens"] == 5
    assert r["bpe_ish_tokens"] == 9


def test_rolling_hash_fingerprints_deterministic(docs):
    a = text.rolling_hash_fingerprints(docs).count()
    b = text.rolling_hash_fingerprints(docs).count()
    assert a == b and a > 0


# -------------------------------------------------------------- multimodal

@pytest.fixture(scope="module")
def blobs(docs):
    return docs.select("doc_id", F.encode(F.col("text"), "utf-8").alias("blob"))


def test_blob_metadata(blobs):
    out = multimodal.attach_blob_metadata(blobs, "blob")
    row = out.filter(F.col("doc_id") == 0).collect()[0]
    assert row["blob_bytes"] > 0 and len(row["blob_sha"]) == 64


def test_decode_images_stub_schema_and_determinism(blobs):
    out = multimodal.decode_images(blobs, use_stub_decoder=True)
    assert [f.name for f in out.schema.fields] == \
        ["doc_id", "width", "height", "channels", "mean_pixel"]
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, multimodal.decode_images(
        blobs, use_stub_decoder=True).collect()))
    assert a == b and len(a) == blobs.count()


def test_decode_images_without_stub_raises(blobs):
    with pytest.raises(Exception) as exc:
        multimodal.decode_images(blobs).collect()
    assert "NotImplementedError" in str(exc.value) or \
        isinstance(exc.value, NotImplementedError)


def test_audio_frame_sampling(blobs):
    out = multimodal.sample_audio_frames(blobs, frames=3, use_stub_decoder=True)
    counts = out.groupBy("doc_id").count().collect()
    assert all(r["count"] == 3 for r in counts)


def test_blob_dedup(spark):
    df = spark.createDataFrame(
        [(1, b"same"), (2, b"same"), (3, b"other")], ["doc_id", "blob"]
    )
    assert multimodal.exact_blob_dedup(df).count() == 2


def test_ivf_probe_all_matches_brute_force(embs):
    from sql_to_ibis_spark.operators import similarity

    exact = [r["vec_id"] for r in
             similarity.cosine_topk_vs_query(embs, 0, k=10).collect()]
    ivf = [r["vec_id"] for r in
           similarity.ivf_ann_topk(embs, 0, k=10, nlist=4, nprobe=4).collect()]
    # probing every cell makes IVF exhaustive → exact ranking
    assert ivf == exact


def test_ivf_partial_probe_recall(embs):
    from sql_to_ibis_spark.operators import similarity

    exact = {r["vec_id"] for r in
             similarity.cosine_topk_vs_query(embs, 0, k=10).collect()}
    got = similarity.ivf_ann_topk(embs, 0, k=10, nlist=8, nprobe=2).collect()
    assert len(got) == 10
    # random near-orthogonal corpus is ANN's worst case; still expect
    # meaningful recall from 2/8 cells
    assert len({r["vec_id"] for r in got} & exact) >= 5


def test_ivf_unknown_query_raises(embs):
    from sql_to_ibis_spark.operators import similarity

    import pytest as _pytest
    with _pytest.raises(ValueError):
        similarity.ivf_ann_topk(embs, query_vec_id=10**9)


def test_connected_components_chain_and_islands(spark):
    from sql_to_ibis_spark.operators import dedup

    # chain 1-2-3-4, pair (10,11), singleton 20 appears in no pair
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a: long, id_b: long")
    got = {r["id"]: r["component"]
           for r in dedup.connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_transitive_star(spark):
    from sql_to_ibis_spark.operators import dedup

    # star around 100 plus a bridge merging two stars
    edges = [(100, i) for i in range(101, 106)] + \
            [(200, i) for i in range(201, 206)] + [(105, 201)]
    pairs = spark.createDataFrame(edges, "id_a: long, id_b: long")
    got = {r["id"]: r["component"]
           for r in dedup.connected_components(pairs).collect()}
    assert set(got.values()) == {100}


def test_connected_components_local_matches_distributed(spark):
    """The size-gated driver-side union-find must produce exactly the
    distributed result (same nodes, same min-member component labels)."""
    from sql_to_ibis_spark.operators import dedup

    import random
    rng = random.Random(7)
    edges = [(rng.randrange(200), rng.randrange(200)) for _ in range(150)]
    pairs = spark.createDataFrame(edges, "id_a: long, id_b: long")
    s_local: dict = {}
    s_dist: dict = {}
    local = {(r["id"], r["component"])
             for r in dedup.connected_components(
                 pairs, stats=s_local).collect()}
    dist = {(r["id"], r["component"])
            for r in dedup.connected_components(
                pairs, stats=s_dist, local_threshold=0).collect()}
    assert s_local["mode"] == "local" and s_local["converged"]
    assert s_dist["mode"] == "distributed"
    assert local == dist


def test_connected_components_local_string_ids(spark):
    from sql_to_ibis_spark.operators import dedup

    pairs = spark.createDataFrame(
        [("b", "c"), ("a", "b"), ("x", "y")], "id_a: string, id_b: string")
    got = {r["id"]: r["component"]
           for r in dedup.connected_components(pairs).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_connected_components_byte_budget_forces_distributed(spark):
    """r10: the local-solve admission is byte-aware — wide string ids
    must take the distributed path even when the PAIR count is tiny
    (2M long pairs ≈ 32 MB, but 2M wide-string pairs can be 10× that
    on the driver), and both paths must agree."""
    from sql_to_ibis_spark.operators import dedup

    wide = [("doc_" + "x" * 200 + str(i), "doc_" + "x" * 200 + str(i + 1))
            for i in range(50)]
    pairs = spark.createDataFrame(wide, "id_a: string, id_b: string")
    s_forced: dict = {}
    # 50 pairs × ~(400 chars + 112 B overhead) ≫ a 1 KB budget
    forced = {(r["id"], r["component"])
              for r in dedup.connected_components(
                  pairs, stats=s_forced, local_bytes_budget=1024).collect()}
    assert s_forced["mode"] == "distributed"
    s_local: dict = {}
    local = {(r["id"], r["component"])
             for r in dedup.connected_components(
                 pairs, stats=s_local).collect()}
    assert s_local["mode"] == "local"
    assert forced == local


def test_dedup_clusters_end_to_end(spark):
    from sql_to_ibis_spark.operators import dedup

    base = ("the quick brown fox jumps over the lazy dog and then runs "
            "far away into the deep dark forest tonight")
    rows = [
        (1, base), (2, base + " extra"), (3, base),  # near-dup cluster
        (4, "completely different content about spark distributed "
            "query engines and large scale data processing pipelines"),
        (5, "yet another unrelated document mentioning nothing similar "
            "to the others with its own unique words entirely"),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    out = dedup.dedup_clusters(df, jaccard_threshold=0.5)
    kept = sorted(r["doc_id"] for r in out.collect())
    # cluster {1,2,3} collapses to min id 1; 4 and 5 survive untouched
    assert kept == [1, 4, 5]


def test_curate_documents_end_to_end(docs):
    from sql_to_ibis_spark.operators import curate

    out = curate.curate_documents(docs, min_quality=0.4,
                                  jaccard_threshold=0.7)
    got = out.toPandas()
    n_in = docs.count()
    assert 0 < len(got) <= n_in
    assert {"quality_score", "lang_pred", "n_tokens"} <= set(got.columns)
    assert (got["quality_score"] >= 0.4).all()
    # no surviving exact duplicates by normalized text
    from sql_to_ibis_spark.operators.dedup import normalized_text
    from pyspark.sql import functions as F
    norms = out.select(normalized_text(F.col("text")).alias("n"))
    assert norms.count() == norms.distinct().count()


def test_curate_language_filter(docs):
    from sql_to_ibis_spark.operators import curate

    out = curate.curate_documents(docs, min_quality=0.0, languages=["en"],
                                  with_token_stats=False)
    langs = {r["lang_pred"] for r in out.select("lang_pred").distinct().collect()}
    assert langs <= {"en"}


def test_term_frequencies_vs_duckdb(docs, ddb):
    from sql_to_ibis_spark.operators import text as text_ops

    got = text_ops.term_frequencies(docs, top_k=30).toPandas()
    expected = ddb.execute(r"""
        SELECT term, count(*) AS n FROM (
          SELECT unnest(regexp_split_to_array(
            lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS term
          FROM documents) t
        WHERE term != ''
        GROUP BY term ORDER BY n DESC, term LIMIT 30
    """).fetchdf()
    assert list(got["term"]) == list(expected["term"])
    assert list(got["n"]) == list(expected["n"])


# ---------------------------------------------- real BMP / WAV decoders


def test_bmp_roundtrip_local():
    blob = multimodal.encode_bmp(7, 5, 200)  # width with row padding (7*3=21)
    w, h, c, mean = multimodal.decode_bmp(blob)
    assert (w, h, c) == (7, 5, 3)
    assert mean == 200.0  # padding bytes must NOT leak into the mean


def test_bmp_decode_distributed(spark, docs):
    synth = multimodal.synthesize_bmp_blobs(docs.limit(64))
    out = multimodal.decode_images(synth).collect()
    assert len(out) == 64
    for r in out:
        i = r["doc_id"]
        assert r["width"] == 4 + i % 16
        assert r["height"] == 4 + (i // 16) % 16
        assert r["channels"] == 3
        assert r["mean_pixel"] == float(i % 256)


def test_png_roundtrip_all_filters_and_channels():
    import numpy as np

    rng = np.random.default_rng(0)
    for ch in (3, 4):
        for ft in range(5):  # None/Sub/Up/Average/Paeth (RFC 2083 §6)
            px = rng.integers(0, 256, size=(7, 5, ch), dtype=np.uint8)
            w, h, c, mean = multimodal.decode_png(
                multimodal.encode_png(px, ft))
            assert (w, h, c) == (5, 7, ch)
            assert mean == pytest.approx(px.mean(), abs=1e-9), (ft, ch)


def test_png_rejects_non_png_and_exotic():
    import numpy as np

    with pytest.raises(ValueError):
        multimodal.decode_png(b"\x89PNGnope")
    # palette/16-bit/interlaced variants must raise, not mis-decode
    blob = bytearray(multimodal.encode_png(
        np.zeros((4, 4, 3), np.uint8)))
    blob[24] = 16  # bit depth byte inside IHDR
    import struct as _s
    import zlib as _z
    # recompute the IHDR CRC so the chunk is structurally valid
    blob[29:33] = _s.pack(">I", _z.crc32(bytes(blob[12:29])) & 0xFFFFFFFF)
    with pytest.raises(ValueError):
        multimodal.decode_png(bytes(blob))


def test_png_decode_distributed(spark, docs):
    synth = multimodal.synthesize_png_blobs(docs.limit(64))
    out = multimodal.decode_images(synth).collect()
    assert len(out) == 64
    for r in out:
        i = r["doc_id"]
        assert r["width"] == 4 + i % 16
        assert r["height"] == 4 + (i // 16) % 16
        assert r["channels"] == 3
        assert r["mean_pixel"] == float(i % 256)


def test_wav_roundtrip_local():
    import numpy as np

    samples = np.full(16000, 1000, dtype=np.int16)
    blob = multimodal.encode_wav(samples)
    rate, channels, decoded = multimodal.decode_wav(blob)
    assert (rate, channels) == (16000, 1)
    assert np.array_equal(decoded, samples)


def test_wav_rms_distributed(spark):
    import numpy as np

    rows = []
    for i, amp in enumerate([0, 1000, 20000]):
        samples = np.full(8000, amp, dtype=np.int16)
        rows.append((i, bytearray(multimodal.encode_wav(samples))))
    df = spark.createDataFrame(rows, ["doc_id", "blob"])
    out = multimodal.sample_audio_frames(df, frames=4)
    got = {(r["doc_id"], r["frame_idx"]): r["rms"] for r in out.collect()}
    assert len(got) == 12
    for (i, _), rms in got.items():
        assert rms == pytest.approx([0.0, 1000.0, 20000.0][i])


def test_non_bmp_without_stub_still_raises(blobs):
    with pytest.raises(Exception) as exc:
        multimodal.decode_images(blobs).collect()
    assert "BMP" in str(exc.value) or isinstance(exc.value, NotImplementedError)


# ------------------------------------------------------- sampling / splits


def test_split_train_eval_deterministic_and_disjoint(docs):
    from sql_to_ibis_spark.operators import sampling

    train, ev = sampling.split_train_eval(docs, "doc_id", eval_per_mille=100)
    n, nt, ne = docs.count(), train.count(), ev.count()
    assert nt + ne == n
    # ~10% eval with binomial slack
    assert 0.05 * n < ne < 0.15 * n
    # determinism: same membership on recompute
    ev_ids = {r["doc_id"] for r in ev.select("doc_id").collect()}
    _, ev2 = sampling.split_train_eval(docs, "doc_id", eval_per_mille=100)
    assert {r["doc_id"] for r in ev2.select("doc_id").collect()} == ev_ids


def test_tag_split_matches_split(docs):
    from pyspark.sql import functions as F

    from sql_to_ibis_spark.operators import sampling

    tagged = sampling.tag_split(docs, "doc_id", eval_per_mille=100)
    _, ev = sampling.split_train_eval(docs, "doc_id", eval_per_mille=100)
    assert tagged.filter(F.col("split") == "eval").count() == ev.count()


def test_top_n_per_key_exact_quota_and_deterministic(docs):
    from sql_to_ibis_spark.operators import sampling

    out = sampling.top_n_per_key(docs, "lang", 5, "doc_id")
    counts = {r["lang"]: r["count"]
              for r in out.groupBy("lang").count().collect()}
    full = {r["lang"]: r["count"]
            for r in docs.groupBy("lang").count().collect()}
    for lang, c in counts.items():
        assert c == min(5, full[lang])
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(r["doc_id"] for r in
               sampling.top_n_per_key(docs, "lang", 5, "doc_id").collect())
    assert a == b
    # different salt redraws a different sample
    c = sorted(r["doc_id"] for r in
               sampling.top_n_per_key(docs, "lang", 5, "doc_id",
                                      salt="other").collect())
    assert a != c


def test_stratified_sample_bounds(docs):
    from sql_to_ibis_spark.operators import sampling

    langs = [r["lang"] for r in docs.select("lang").distinct().collect()]
    out = sampling.stratified_sample(docs, "lang", {l: 0.5 for l in langs},
                                     seed=7)
    n, k = docs.count(), out.count()
    assert 0.35 * n < k < 0.65 * n
    # seeded: same seed, same sample
    again = sampling.stratified_sample(docs, "lang", {l: 0.5 for l in langs},
                                       seed=7)
    assert out.count() == again.count()


def test_stratified_sample_deterministic_exact_and_portable(docs):
    from sql_to_ibis_spark.operators import sampling

    fracs = {"en": 0.1, "de": 0.5, "fr": 0.5}
    out = sampling.stratified_sample_deterministic(
        docs, "lang", fracs, id_col="doc_id")
    rows = out.collect()
    # strata absent from fractions are dropped entirely
    assert {r["lang"] for r in rows} <= set(fracs)
    # identical rows on rerun (pure function of id+salt, not RNG state)
    ids = sorted(r["doc_id"] for r in rows)
    again = sorted(r["doc_id"] for r in sampling.stratified_sample_deterministic(
        docs, "lang", fracs, id_col="doc_id").collect())
    assert ids == again
    # fraction bounds hold per stratum (md5 uniformity, generous band)
    import collections
    per = collections.Counter(r["lang"] for r in rows)
    totals = collections.Counter(
        r["lang"] for r in docs.select("lang").collect())
    for lang, frac in fracs.items():
        if totals[lang] >= 30:
            got = per[lang] / totals[lang]
            assert abs(got - frac) < 0.25
    # frac >= 1.0 keeps every row of the stratum
    full = sampling.stratified_sample_deterministic(
        docs, "lang", {"en": 1.0}, id_col="doc_id")
    assert full.count() == totals["en"]
    # membership is reproducible OUTSIDE Spark: same md5-threshold rule in
    # plain Python selects the same ids (the cross-engine audit property)
    import hashlib
    expect = sorted(
        r["doc_id"] for r in docs.select("doc_id", "lang").collect()
        if r["lang"] in fracs
        and hashlib.md5(f"{r['doc_id']}strat".encode()).hexdigest()[:8]
        < format(int(fracs[r["lang"]] * 16 ** 8), "08x"))
    assert ids == expect


# ---------------------------------------------- chunking / PII redaction


def test_chunk_documents_overlap_and_coverage(spark):
    df = spark.createDataFrame([(1, "abcdefghij" * 10)], ["doc_id", "text"])
    out = text.chunk_documents(df, chunk_chars=40, overlap=10).collect()
    chunks = {r["chunk_idx"]: r["chunk_text"] for r in out}
    assert chunks[0] == ("abcdefghij" * 10)[0:40]
    # stride = 30: next chunk starts at offset 30 (10-char overlap)
    assert chunks[1] == ("abcdefghij" * 10)[30:70]
    # concatenating de-overlapped chunks reconstructs the document
    rebuilt = chunks[0] + "".join(
        chunks[i][10:] for i in range(1, len(chunks)))
    assert rebuilt == "abcdefghij" * 10


def test_chunk_short_doc_single_chunk(spark):
    df = spark.createDataFrame([(1, "short")], ["doc_id", "text"])
    out = text.chunk_documents(df, chunk_chars=512, overlap=64).collect()
    assert len(out) == 1 and out[0]["chunk_text"] == "short"


def test_chunk_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        text.chunk_documents(df, chunk_chars=10, overlap=10)


def test_redact_pii_patterns(spark):
    df = spark.createDataFrame(
        [(1, "mail me at john.doe@example.com or call 555-123-4567; "
             "see https://example.com/x?y=1 ssn 123-45-6789"),
         (2, "nothing sensitive here")],
        ["doc_id", "text"])
    got = {r["doc_id"]: r for r in text.redact_pii(df).collect()}
    red = got[1]["text_redacted"]
    assert "<EMAIL>" in red and "<URL>" in red and "<PHONE>" in red \
        and "<SSN>" in red
    assert "john.doe" not in red and "555-123-4567" not in red
    assert got[1]["n_redactions"] == 4
    assert got[2]["n_redactions"] == 0
    assert got[2]["text_redacted"] == "nothing sensitive here"


def test_redact_pii_gates_pass_through_near_misses(spark):
    # rows that OPEN a substring gate but contain no actual match must come
    # through byte-identical with zero redactions (the gates are an
    # optimization, never a filter)
    rows = [
        (1, "version 2 of chapter 3 has 4 figures"),        # digits, no phone
        (2, "a well-known hyphen-ated side-note"),          # dashes, no SSN
        (3, "ssn-ish 123-45-678 and short call 55-123-4567"),  # near misses
        (4, "at sign in email-less text @ large"),          # '@', no email
        (5, "httpx is not a url scheme here: http"),        # 'http', no URL
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in text.redact_pii(df).collect()}
    for doc_id, original in rows:
        assert got[doc_id]["n_redactions"] == 0
        assert got[doc_id]["text_redacted"] == original


def test_redact_pii_single_gate_char_still_matches(spark):
    # each pattern must still fire when only its own gate chars appear
    df = spark.createDataFrame(
        [(1, "dial 555.123.4567 now"),      # digit gate, dot separators
         (2, "id 987-65-4321 on file")],    # dash gate
        ["doc_id", "text"])
    got = {r["doc_id"]: r for r in text.redact_pii(df).collect()}
    assert got[1]["text_redacted"] == "dial <PHONE> now"
    assert got[1]["n_redactions"] == 1
    assert got[2]["text_redacted"] == "id <SSN> on file"
    assert got[2]["n_redactions"] == 1


def test_repetition_signals_planted(spark):
    rows = [
        # "buy now" repeated 5× in 10 words → top bigram covers most chars
        (1, "buy now buy now buy now buy now buy now"),
        # all-distinct words → zero duplicate trigrams
        (2, "alpha beta gamma delta epsilon zeta"),
        # exact trigram repetition: "a b c a b c" has 4 trigrams, 3 distinct
        (3, "a b c a b c"),
        (4, "one"),          # too short for any bigram/trigram
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           text.repetition_signals(df).collect()}
    assert got[1]["top_bigram"] == "buy now"
    assert got[1]["top_bigram_char_frac"] > 0.8
    assert got[2]["dup_trigram_frac"] == 0.0
    assert got[3]["dup_trigram_frac"] == pytest.approx(0.25, abs=1e-6)
    assert got[4]["top_bigram"] is None
    assert got[4]["top_bigram_char_frac"] == 0.0


def test_duplicate_line_stats_planted(spark):
    rows = [
        (1, "hello world\nhello world\nunique line"),   # 1 of 3 lines repeats
        (2, "a\nb\nc"),                                  # no repeats
        (3, "same\nsame\nsame\nsame"),                   # 3 of 4 repeat
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           text.duplicate_line_stats(df).collect()}
    assert got[1]["dup_line_frac"] == pytest.approx(1 / 3, abs=1e-6)
    assert got[2]["dup_line_frac"] == 0.0
    assert got[3]["dup_line_frac"] == 0.75
    assert got[3]["dup_line_char_frac"] == 0.75


def test_repetition_signals_no_python_udf(docs):
    from tests.test_plan_quality import plan_of
    plan = plan_of(text.repetition_signals(docs))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_decontaminate_planted_overlap(spark):
    # train doc 1 shares an 8-gram run with eval doc 100; train doc 2 shares
    # nothing (distinct vocabulary)
    shared = "one two three four five six seven eight"
    train = spark.createDataFrame(
        [(1, f"prefix words {shared} suffix words"),
         (2, "totally different vocabulary with no benchmark overlap here")],
        "doc_id long, text string")
    ev = spark.createDataFrame(
        [(100, f"benchmark question {shared} benchmark answer")],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           dedup.decontaminate(train, ev, shingle_size=8).collect()}
    assert got[1]["contaminated"] is True
    assert got[1]["n_contaminated_ngrams"] >= 1
    assert got[2]["contaminated"] is False
    assert got[2]["n_contaminated_ngrams"] == 0


def test_decontaminate_min_overlap_threshold(spark):
    shared = "one two three four five six seven eight"
    train = spark.createDataFrame(
        [(1, f"prefix {shared} suffix")], "doc_id long, text string")
    ev = spark.createDataFrame(
        [(100, shared)], "doc_id long, text string")
    out = dedup.decontaminate(train, ev, shingle_size=8, min_overlap=99)
    row = out.collect()[0]
    # the count survives; only the flag moves with the threshold
    assert row["n_contaminated_ngrams"] >= 1
    assert row["contaminated"] is False


def test_decontaminate_eval_side_broadcasts(docs):
    from tests.test_plan_quality import plan_of
    ev = docs.filter(F.col("doc_id") < 10)
    tr = docs.filter(F.col("doc_id") >= 10)
    plan = plan_of(dedup.decontaminate(tr, ev), "simple")
    assert "BroadcastHashJoin" in plan


def test_bm25_ranking_sanity(spark):
    docs = spark.createDataFrame(
        [(1, "spark spark spark runs fast"),          # tf=3 for 'spark'
         (2, "spark runs somewhere else entirely"),   # tf=1
         (3, "nothing relevant here at all"),         # no match → absent
         (4, "rare rare unicorn word")],              # 'unicorn': rare term
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           text.bm25_scores(docs, ["spark", "unicorn"]).collect()}
    assert 3 not in out                       # non-matching docs drop out
    assert out[1]["bm25"] > out[2]["bm25"]    # higher tf → higher score
    # 'unicorn' appears in 1/4 docs vs 'spark' in 2/4 → higher idf, and
    # doc 4 should outrank doc 2's single common-term hit
    assert out[4]["bm25"] > out[2]["bm25"]
    assert out[1]["n_terms_matched"] == 1


def test_bm25_rejects_empty_query(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        text.bm25_scores(docs, [])


def test_bm25_single_corpus_pass(docs):
    # the r9 shape: one explode→groupBy(doc_id) subtree feeds BOTH the
    # 1-row stats aggregate and the scoring side; AQE must dedupe the
    # identical exchanges so the corpus is tokenized exactly once, the
    # stats side broadcasts, and no Python ever runs. The shuffle keys on
    # doc_id (high-cardinality), never on the |terms|-key term column.
    r = text.bm25_scores(docs, ["spark", "query"])
    r.collect()
    plan = r._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan
    assert "BroadcastExchange" in plan
    assert "BatchEvalPython" not in plan
    assert "hashpartitioning(__term" not in plan


def test_pack_sequences_small_known_case(spark):
    # 3 docs of 3/4/2 tokens, ctx=4: stream offsets 0,3,7 → windows
    # [0,0], [0,1], [1,2]
    docs_df = spark.createDataFrame(
        [(1, "a b c"), (2, "d e f g"), (3, "h i")],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           text.pack_sequences(docs_df, ctx_tokens=4).collect()}
    assert (got[1]["start_window"], got[1]["end_window"],
            got[1]["offset_in_window"]) == (0, 0, 0)
    assert (got[2]["start_window"], got[2]["end_window"],
            got[2]["offset_in_window"]) == (0, 1, 3)
    assert (got[3]["start_window"], got[3]["end_window"],
            got[3]["offset_in_window"]) == (1, 2, 3)


def test_pack_sequences_partition_invariant(docs):
    # the two-pass distributed prefix sum must not depend on partitioning
    one = {r["doc_id"]: (r["start_window"], r["offset_in_window"])
           for r in text.pack_sequences(docs, 512, partitions=1).collect()}
    many = {r["doc_id"]: (r["start_window"], r["offset_in_window"])
            for r in text.pack_sequences(docs, 512, partitions=8).collect()}
    assert one == many


def test_pack_sequences_stream_is_gapless(docs):
    rows = sorted(text.pack_sequences(docs, 512).collect(),
                  key=lambda r: r["doc_id"])
    pos = 0
    for r in rows:
        assert r["start_window"] == pos // 512
        assert r["offset_in_window"] == pos % 512
        pos += r["n_tokens"]
        assert r["end_window"] == (pos - 1) // 512


def test_unigram_logprob_ranks_garbage_below_fluent(spark):
    # doc 3 is made of corpus-rare tokens → most negative mean logprob
    rows = [(1, "the cat sat on the mat the cat sat"),
            (2, "the cat ran to the mat"),
            (3, "zxqv wvut qqzz pplm")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["mean_token_logprob"]
           for r in text.unigram_logprob_score(df).collect()}
    assert got[3] < got[1] and got[3] < got[2]


def test_unigram_logprob_uniform_corpus_is_flat(spark):
    # every token unique → every doc has the same per-token logprob
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "d e f")], "doc_id long, text string")
    got = {r["doc_id"]: r["mean_token_logprob"]
           for r in text.unigram_logprob_score(df).collect()}
    assert got[1] == got[2]


def test_new_text_operators_tolerate_null_text(spark):
    # a null text row must not crash any of the r6 operators (ADVICE r5:
    # the Arrow kernels once did); it degrades to empty/zero outputs
    df = spark.createDataFrame(
        [(1, "some normal words here"), (2, None)],
        "doc_id long, text string")
    rep = {r["doc_id"]: r for r in text.repetition_signals(df).collect()}
    assert rep[2]["dup_trigram_frac"] == 0.0 and rep[2]["top_bigram"] is None
    pk = {r["doc_id"]: r for r in text.pack_sequences(df, 4).collect()}
    assert pk[2]["n_tokens"] is not None  # null text → size(null)=null? pinned below
    bm = text.bm25_scores(df, ["some"]).collect()
    assert len(bm) == 1 and bm[0]["doc_id"] == 1
    ug = {r["doc_id"]: r for r in text.unigram_logprob_score(df).collect()}
    assert 1 in ug
    dc = dedup.decontaminate(
        df, spark.createDataFrame([(9, "words here")],
                                  "doc_id long, text string")).collect()
    assert {r["doc_id"] for r in dc} == {1, 2}


def test_containment_detects_quoted_subset(spark):
    # B embeds ALL of A's text plus twice as much extra — Jaccard(A,B) is
    # only ~1/3, but containment(A in B) is 1.0
    a_text = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    extra = ("kilo lima mike november oscar papa quebec romeo sierra tango "
             "uniform victor whiskey xray yankee zulu one two three four")
    df = spark.createDataFrame(
        [(1, a_text), (2, f"{extra} {a_text} {extra}"),
         (3, "entirely different words with no overlap at all present here")],
        "doc_id long, text string")
    pairs = {(r["id_a"], r["id_b"]): r for r in
             dedup.containment_candidates(df, threshold=0.8).collect()}
    assert (1, 2) in pairs
    assert pairs[(1, 2)]["containment"] == 1.0
    assert (2, 1) not in pairs          # asymmetric: B is NOT inside A
    assert all(3 not in p for p in pairs)


def test_containment_df_cap_drops_boilerplate(spark):
    # a shingle shared by every doc is boilerplate; with df_cap=2 it can't
    # create candidates across the whole corpus
    boiler = "this is the standard footer text appended to every document"
    rows = [(i, f"unique{i} word{i} salt{i} pepper{i} {boiler}")
            for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.containment_candidates(df, threshold=0.5, df_cap=2)
    assert out.count() == 0
    # without the cap the footer makes everyone a candidate of everyone
    uncapped = dedup.containment_candidates(df, threshold=0.5, df_cap=None)
    assert uncapped.count() > 0


def test_dedup_lines_corpus_boilerplate(spark):
    """Corpus-level line dedup: boilerplate in > max_doc_freq docs drops,
    unique lines survive in original order, whitespace lines normalize
    away, fully-boilerplate docs survive with empty text."""
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": ["COOKIE BANNER\nreal content one\nFOOTER",
                 "COOKIE BANNER\nreal content two\nFOOTER",
                 "COOKIE BANNER\nunique stuff\n\n  \nFOOTER",
                 "all original\nno boilerplate",
                 "COOKIE BANNER\nFOOTER"],
    })).coalesce(2)
    got = {r["doc_id"]: r["text"]
           for r in dedup.dedup_lines(df, max_doc_freq=2).collect()}
    assert got == {
        1: "real content one",
        2: "real content two",
        3: "unique stuff",
        4: "all original\nno boilerplate",
        5: "",
    }


def test_dedup_lines_null_text_becomes_empty(spark):
    # null text has no lines -> survives as '' like a fully-dropped doc
    # (the operator never drops documents)
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame(
        {"doc_id": [1, 2], "text": ["a\nb", None]})).coalesce(1)
    got = {r["doc_id"]: r["text"]
           for r in dedup.dedup_lines(df).collect()}
    assert got == {1: "a\nb", 2: ""}


def test_dedup_lines_plan_no_window_no_udf(spark):
    import pandas as pd

    from tests.test_plan_quality import plan_of

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": ["a\nb"]}))
    plan = plan_of(dedup.dedup_lines(df), "simple")
    # order restored via array_sort-of-structs, not a window; no Python
    assert "Window" not in plan
    assert "EvalPython" not in plan


def test_take_token_budget_matches_single_window(spark):
    """The two-pass distributed prefix scan must equal a naive global
    window cumsum, including the boundary document (included, with
    tokens_before telling the loader where to truncate)."""
    import pandas as pd

    from pyspark.sql import Window
    from sql_to_ibis_spark.operators import sampling
    from sql_to_ibis_spark.operators.dedup import normalized_text

    pdf = pd.DataFrame({
        "doc_id": range(50),
        "text": [" ".join(["tok"] * (3 + i % 7)) for i in range(50)],
        "quality": [(i * 37) % 50 for i in range(50)],
    })
    df = spark.createDataFrame(pdf).repartition(5)
    got = sampling.take_token_budget(
        df, budget_tokens=100, order_col="quality", partitions=4)
    w = (Window.orderBy(F.col("quality").desc(), "doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    naive = (
        df.select("doc_id", "quality",
                  F.size(F.split(normalized_text(F.col("text")), " "))
                  .cast("bigint").alias("n_tokens"))
        .withColumn("tokens_before",
                    F.sum("n_tokens").over(w) - F.col("n_tokens"))
        .filter(F.col("tokens_before") < 100)
        .select("doc_id", "n_tokens", "tokens_before")
    )
    a = sorted(map(tuple, got.collect()))
    b = sorted(map(tuple, naive.collect()))
    assert a == b and len(a) > 0
    # budget boundary: the selected set is exactly the ordered prefix that
    # first crosses the budget — its total minus the boundary doc's tokens
    # (the doc with the largest tokens_before) stays under budget
    total = sum(r[1] for r in a)
    boundary = max(a, key=lambda r: r[2])
    assert total >= 100 and total - boundary[1] < 100


def test_jpeg_roundtrip_constant_blocks_exact():
    """Constant blocks with even level-shifted values quantize exactly
    (DC = 8·v′, q00 = 16): the full Huffman + DCT roundtrip must be
    LOSSLESS on the fixture family the oracle entry uses."""
    import numpy as np

    for i in (0, 3, 17, 63, 130, 255):
        w, h = 8 * (1 + i % 4), 8 * (1 + (i // 4) % 4)
        v = 2 * (i % 64) + 128
        blob = multimodal.encode_jpeg_gray(
            np.full((h, w), v, dtype=np.uint8))
        dw, dh, c, mean = multimodal.decode_jpeg_gray(blob)
        assert (dw, dh, c) == (w, h, 1)
        assert mean == float(v)


def test_jpeg_structured_content_lossy_but_close():
    """Non-constant images exercise AC coefficients, run-lengths, ZRL
    and EOB; baseline JPEG is lossy, so assert bounded mean error."""
    import numpy as np

    rng = np.random.default_rng(7)
    for shape in ((8, 8), (16, 24), (32, 32)):
        px = rng.integers(0, 256, shape).astype(float)
        for _ in range(3):  # smooth so quantization error is bounded
            px = (np.roll(px, 1, 0) + np.roll(px, -1, 0)
                  + np.roll(px, 1, 1) + np.roll(px, -1, 1) + px) / 5
        px = np.clip(px, 0, 255).astype(np.uint8)
        w, h, c, mean = multimodal.decode_jpeg_gray(
            multimodal.encode_jpeg_gray(px))
        assert (w, h, c) == (shape[1], shape[0], 1)
        assert abs(mean - px.mean()) < 1.0


def test_jpeg_rejects_unsupported():
    import numpy as np

    with pytest.raises(ValueError):
        multimodal.decode_jpeg_gray(b"\x00\x11not a jpeg")
    with pytest.raises(ValueError):
        multimodal.encode_jpeg_gray(np.zeros((7, 8), np.uint8))  # non-×8
    blob = bytearray(multimodal.encode_jpeg_gray(
        np.zeros((8, 8), np.uint8)))
    sof = blob.find(b"\xff\xc0")
    # SOF2 is decoded since r12 — a baseline stream relabeled progressive
    # is MALFORMED progressive (Ss=0/Se=63 DC scan) and must fail fast,
    # not mis-decode
    blob[sof + 1] = 0xC2
    with pytest.raises(ValueError):
        multimodal.decode_jpeg_gray(bytes(blob))
    # SOF3 decodes since r12 — a baseline stream relabeled lossless is
    # malformed (its SOS carries Ss=0, an invalid predictor selector)
    blob[sof + 1] = 0xC3
    with pytest.raises(ValueError):
        multimodal.decode_jpeg_gray(bytes(blob))
    # arithmetic-coded SOF9 stays the documented plug point
    blob[sof + 1] = 0xC9
    with pytest.raises(NotImplementedError):
        multimodal.decode_jpeg_gray(bytes(blob))


def test_jpeg_decode_distributed(spark, docs):
    synth = multimodal.synthesize_jpeg_blobs(docs.limit(64))
    out = multimodal.decode_images(synth).collect()
    assert len(out) == 64
    for r in out:
        i = r["doc_id"]
        assert r["width"] == 8 * (1 + i % 4)
        assert r["height"] == 8 * (1 + (i // 4) % 4)
        assert r["channels"] == 1
        assert r["mean_pixel"] == float(2 * (i % 64) + 128)


def test_repetition_signals_joinback_matches_sort(spark, docs, monkeypatch):
    # r14 joinback argmax (SPARK_GRAFT_REPETITION_ARGMAX=joinback):
    # level-1 counts pinned, max-count via fixed-width HashAggregate,
    # tie rows re-probed with a shuffle_hash join, max(ngram) over ties
    # only — must be value-identical to the fused sort aggregate,
    # including the DESC tie-break and short-doc markers
    rows = [
        (1, "buy now buy now buy now buy now buy now"),
        (2, "alpha beta gamma delta epsilon zeta"),
        (3, "a b c a b c"),
        (4, "one"),
        (5, ""),                       # empty doc
        (6, "x y x y p q p q"),        # tie: 'x y' and 'p q' both 2 ×
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    monkeypatch.delenv("SPARK_GRAFT_REPETITION_ARGMAX", raising=False)
    base = {r["doc_id"]: r for r in text.repetition_signals(df).collect()}
    monkeypatch.setenv("SPARK_GRAFT_REPETITION_ARGMAX", "joinback")
    jb = {r["doc_id"]: r for r in text.repetition_signals(df).collect()}
    assert set(base) == set(jb)
    for k in base:
        assert tuple(base[k]) == tuple(jb[k]), (k, base[k], jb[k])
    assert jb[6]["top_bigram"] == "x y"     # DESC tie-break preserved


def test_repetition_signals_joinback_on_corpus(docs, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_REPETITION_ARGMAX", raising=False)
    base = sorted(tuple(r) for r in text.repetition_signals(docs).collect())
    monkeypatch.setenv("SPARK_GRAFT_REPETITION_ARGMAX", "joinback")
    jb = sorted(tuple(r) for r in text.repetition_signals(docs).collect())
    assert base == jb
