"""KNN operator correctness vs DuckDB (list_dot_product oracle) — SURVEY
§2.11 cortex_search semantics: score = 1 - dist/2, top-k by score with
deterministic tie-break, min_score post-filter, metadata filters."""

from __future__ import annotations

from pyspark.sql import functions as F

from project_cortex_spark.operators import knn
from project_cortex_spark.operators.knn import knn_join, knn_join_lsh, knn_topk

from .conftest import assert_matches_oracle

# score via the same formula both sides: (1 + cos) / 2, computed in double
_DUCK_SCORE = (
    "(1.0 + list_dot_product(embedding, q) /"
    " (sqrt(list_dot_product(embedding, embedding))"
    " * sqrt(list_dot_product(q, q)))) / 2.0"
)


def _query_vec(duck):
    return duck.execute("SELECT embedding FROM embeddings WHERE vec_id = 0").fetchone()[0]


def test_knn_topk(registry, duck):
    qv = [float(x) for x in _query_vec(duck)]
    df = knn_topk(registry.table("embeddings"), qv, k=10).withColumn(
        "score", F.round("score", 6)
    )
    sql = f"""
        WITH q AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0)
        SELECT vec_id, round({_DUCK_SCORE}, 6) AS score
        FROM embeddings, q
        ORDER BY {_DUCK_SCORE} DESC, vec_id LIMIT 10
    """
    assert_matches_oracle(df, duck, sql)


def test_knn_topk_min_score_and_filter(registry, duck):
    qv = [float(x) for x in _query_vec(duck)]
    df = knn_topk(
        registry.table("embeddings"),
        qv,
        k=20,
        min_score=0.5,
        where=F.col("label").isin(1, 2, 3),
        payload_cols=["label"],
    ).withColumn("score", F.round("score", 6))
    sql = f"""
        WITH q AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0)
        SELECT vec_id, round({_DUCK_SCORE}, 6) AS score, label
        FROM embeddings, q
        WHERE label IN (1,2,3) AND {_DUCK_SCORE} >= 0.5
        ORDER BY {_DUCK_SCORE} DESC, vec_id LIMIT 20
    """
    assert_matches_oracle(df, duck, sql)


def test_knn_join_exact(registry, duck):
    emb = registry.table("embeddings")
    queries = (
        emb.filter(F.col("vec_id") < 5)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"))
    )
    df = knn_join(queries, emb, k=5).withColumn("score", F.round("score", 6))
    sql = f"""
        WITH q AS (SELECT vec_id AS query_id, embedding AS q FROM embeddings WHERE vec_id < 5)
        SELECT query_id, vec_id, round({_DUCK_SCORE}, 6) AS score, rank FROM (
            SELECT q.query_id, e.vec_id, e.embedding, q.q,
                   row_number() OVER (
                     PARTITION BY q.query_id
                     ORDER BY {_DUCK_SCORE} DESC, e.vec_id
                   ) AS rank
            FROM embeddings e, q
        ) WHERE rank <= 5
    """
    assert_matches_oracle(df, duck, sql)


def test_knn_lsh_recall(registry):
    """LSH is approximate; assert it returns plausible neighbors: every
    LSH hit must appear in the exact top-50, and self-match (rank 1,
    score 1.0) must survive since identical vectors share a bucket."""
    emb = registry.table("embeddings")
    queries = (
        emb.filter(F.col("vec_id") < 5)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"))
    )
    exact = {
        (r["query_id"], r["vec_id"])
        for r in knn_join(queries, emb, k=50).collect()
    }
    lsh_rows = knn_join_lsh(queries, emb, k=5, n_planes=4).collect()
    assert lsh_rows, "LSH returned nothing"
    self_hits = {r["query_id"] for r in lsh_rows if r["vec_id"] == r["query_id"]}
    assert self_hits == {0, 1, 2, 3, 4}
    in_exact = sum(1 for r in lsh_rows if (r["query_id"], r["vec_id"]) in exact)
    assert in_exact / len(lsh_rows) >= 0.6


# ---------------------------------------------------------------------------
# IVF ANN
# ---------------------------------------------------------------------------


def _queries_frame(registry):
    emb = registry.table("embeddings")
    return emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


def test_ivf_full_probe_equals_exact(registry):
    """nprobe == n_centroids degrades IVF to the exact join."""
    emb = registry.table("embeddings")
    q = _queries_frame(registry)
    exact = knn.knn_join(q, emb, k=5)
    ivf = knn.knn_join_ivf(q, emb, k=5, n_centroids=8, nprobe=8)
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    e = {key(r): (r["vec_id"], round(r["score"], 9)) for r in exact.collect()}
    i = {key(r): (r["vec_id"], round(r["score"], 9)) for r in ivf.collect()}
    assert e == i


def test_ivf_partial_probe_recall(registry):
    emb = registry.table("embeddings")
    q = _queries_frame(registry)
    exact = knn.knn_join(q, emb, k=10)
    ivf = knn.knn_join_ivf(q, emb, k=10, n_centroids=8, nprobe=3)
    truth = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    got = {(r["query_id"], r["vec_id"]) for r in ivf.collect()}
    recall = len(truth & got) / len(truth)
    assert recall >= 0.5, f"IVF recall too low: {recall}"


def test_ivf_candidate_pruning(registry):
    """Partial probes must score strictly fewer candidates than brute
    force (the point of the inverted file)."""
    emb = registry.table("embeddings")
    q = _queries_frame(registry)
    cent = knn.train_centroids(emb, n_centroids=8)
    assigned = knn.assign_clusters(emb, cent)
    sizes = {r["cluster_id"]: r["count"] for r in assigned.groupBy("cluster_id").count().collect()}
    n_corpus = emb.count()
    assert len(sizes) > 1  # clustering actually split the corpus
    # every query scores at most the 3 largest clusters' rows
    worst = sum(sorted(sizes.values(), reverse=True)[:3])
    assert worst < n_corpus


def test_pq_codeword_vectors_rank_exactly(spark):
    """With explicit codebooks and corpus vectors that ARE codewords,
    ADC distance is exact: each query's top-1 is its own codeword doc at
    distance 0."""
    import numpy as np

    # dim 4, m=2 subspaces, 2 codes per subspace; 4 unit-ish vectors
    books = np.array(
        [
            [[1.0, 0.0], [0.0, 1.0]],
            [[1.0, 0.0], [0.0, 1.0]],
        ]
    )
    # normalized corpus rows assembled from codewords
    vecs = {
        1: [1.0, 0.0, 1.0, 0.0],
        2: [1.0, 0.0, 0.0, 1.0],
        3: [0.0, 1.0, 1.0, 0.0],
        4: [0.0, 1.0, 0.0, 1.0],
    }
    norm = 2 ** -0.5
    corpus = spark.createDataFrame(
        [(i, [x * norm for x in v]) for i, v in vecs.items()],
        ["vec_id", "embedding"],
    )
    # books must hold the NORMALIZED blocks to be exact codewords
    books = books * norm
    q = spark.createDataFrame(
        [(i, [x * norm for x in v]) for i, v in vecs.items()],
        ["query_id", "query_vec"],
    )
    got = knn.knn_join_pq(q, corpus, k=1, codebooks=books).collect()
    assert {(r["query_id"], r["vec_id"]) for r in got} == {
        (i, i) for i in vecs
    }
    assert all(r["adc_dist"] == 0.0 for r in got)


def test_knn_join_pq_rejects_coded_without_codebooks(spark, registry):
    """ADVICE r8 (low): pre-encoded codes are only meaningful against
    the books they were encoded with; passing coded without codebooks
    would train FRESH books and gather ADC distances from a table the
    codes never saw — plausible but wrong top-k. The API must refuse."""
    import pytest

    emb = registry.table("embeddings").limit(32)
    books = knn.train_pq_codebooks(emb, n_subspaces=4, n_codes=4)
    coded = knn.pq_encode(emb, books).select("vec_id", "pq_codes")
    q = spark.createDataFrame(
        emb.limit(1).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        ).collect()
    )
    with pytest.raises(ValueError, match="codebooks"):
        knn.knn_join_pq(q, emb, k=1, coded=coded)


def test_pq_recall_floor(registry):
    """Measured contract: m=8/64-code PQ on the (near-random, worst-case)
    synthetic embeddings keeps recall@5 well above chance (5/500 = 1%)."""
    emb = registry.table("embeddings")
    q = _queries_frame(registry)
    exact = knn.knn_join(q, emb, k=5)
    pq = knn.knn_join_pq(q, emb, k=5, n_subspaces=8, n_codes=64)
    truth = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    got = {(r["query_id"], r["vec_id"]) for r in pq.collect()}
    recall = len(truth & got) / len(truth)
    # deterministic 0.36 on the sf0.001 fixture (0.56 at sf0.01);
    # chance level for k=5 of |corpus| is ~5/|corpus| ≈ 10%
    assert recall >= 0.3, f"PQ recall too low: {recall}"


def test_pq_codes_shape_and_range(registry):
    emb = registry.table("embeddings")
    books = knn.train_pq_codebooks(emb, n_subspaces=8, n_codes=16)
    assert books.shape == (8, 16, 8)
    coded = knn.pq_encode(emb, books)
    row = coded.select("pq_codes").first()[0]
    assert len(row) == 8
    stats = coded.selectExpr(
        "min(array_min(pq_codes)) AS lo", "max(array_max(pq_codes)) AS hi"
    ).first()
    assert stats["lo"] >= 0 and stats["hi"] < 16


def test_pq_refined_full_candidates_equals_exact(registry):
    """With candidates >= |corpus| the re-rank stage sees every vector:
    two-stage == exact join (the IVF full-probe analogue)."""
    emb = registry.table("embeddings")
    q = _queries_frame(registry)
    n = emb.count()
    exact = knn.knn_join(q, emb, k=5)
    ref = knn.knn_join_pq_refined(q, emb, k=5, refine_factor=n)
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    e = {key(r): (r["vec_id"], round(r["score"], 6)) for r in exact.collect()}
    g = {key(r): (r["vec_id"], round(r["score"], 6)) for r in ref.collect()}
    assert e == g


def test_pq_refined_improves_recall(registry):
    emb = registry.table("embeddings")
    q = _queries_frame(registry)
    truth = {(r["query_id"], r["vec_id"])
             for r in knn.knn_join(q, emb, k=5).collect()}

    def recall(df):
        got = {(r["query_id"], r["vec_id"]) for r in df.collect()}
        return len(truth & got) / len(truth)

    raw = recall(knn.knn_join_pq(q, emb, k=5, n_subspaces=8, n_codes=64))
    ref = recall(knn.knn_join_pq_refined(
        q, emb, k=5, refine_factor=10, n_subspaces=8, n_codes=64))
    assert ref >= raw
    assert ref >= 0.6  # deterministic on the fixture; 0.96 at sf0.01


def test_pq_rejects_indivisible_dim(registry):
    import pytest

    emb = registry.table("embeddings")  # dim 64
    with pytest.raises(ValueError, match="not divisible"):
        knn.train_pq_codebooks(emb, n_subspaces=7)


def test_mmr_rerank_matches_unrolled_oracle(registry, duck):
    from project_cortex_spark import oracle as oracle_mod

    qv = [float(x) for x in _query_vec(duck)]
    df = knn.mmr_rerank(
        registry.table("embeddings"), qv, k=8, n_candidates=25, lam=0.7
    )
    assert_matches_oracle(
        df, duck, oracle_mod.mmr_oracle_sql(k=8, n_candidates=25, lam=0.7)
    )


def test_mmr_lambda_one_is_pure_relevance(registry, duck):
    # with lam=1.0 the diversity term vanishes: picks == exact top-k order
    qv = [float(x) for x in _query_vec(duck)]
    emb = registry.table("embeddings")
    mmr = knn.mmr_rerank(emb, qv, k=6, n_candidates=20, lam=1.0).collect()
    exact = (
        knn_topk(emb, qv, k=6)
        .withColumn("score", F.round("score", 6))
        .collect()
    )
    # rounded relevance can tie where raw scores differ; on ties MMR
    # breaks by id while knn_topk breaks by raw score first — compare the
    # (rounded score) sequence and the selected SET, both invariant
    assert [r["score"] for r in mmr] == [r["score"] for r in exact]
    assert {r["vec_id"] for r in mmr} == {r["vec_id"] for r in exact}


def test_mmr_selects_distinct_ids_and_monotone_first_pick(registry, duck):
    qv = [float(x) for x in _query_vec(duck)]
    emb = registry.table("embeddings")
    rows = knn.mmr_rerank(emb, qv, k=10, n_candidates=30, lam=0.5).collect()
    ids = [r["vec_id"] for r in rows]
    assert len(ids) == len(set(ids)) == 10
    assert rows[0]["score"] == max(r["score"] for r in rows)
    assert [r["rank"] for r in rows] == list(range(1, 11))


def test_knn_int8_matches_oracle(registry, duck):
    from project_cortex_spark import oracle as oracle_mod

    qv = [float(x) for x in _query_vec(duck)]
    df = knn.knn_topk_int8(registry.table("embeddings"), qv, k=10).withColumn(
        "score", F.round("score", 6)
    )
    assert_matches_oracle(df, duck, oracle_mod.knn_int8_oracle_sql(k=10))


def test_knn_int8_close_to_exact(registry, duck):
    # quantization error is <= scale/2 per component: the top-10 over
    # dequantized vectors must overlap heavily with the exact top-10
    qv = [float(x) for x in _query_vec(duck)]
    emb = registry.table("embeddings")
    exact = {r["vec_id"] for r in knn_topk(emb, qv, k=10).collect()}
    quant = {r["vec_id"] for r in knn.knn_topk_int8(emb, qv, k=10).collect()}
    assert len(exact & quant) >= 8


def test_knn_join_null_and_zero_vectors_score_null(spark):
    """Zero-norm / NULL / wrong-dimension embeddings must score NULL
    and rank LAST (SQL 0/0 semantics on both engines) — not crash the
    task and not score a fake 0.5 — and an empty query side returns an
    empty frame with the derived id dtypes."""
    from project_cortex_spark.operators.knn import knn_join

    corpus = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.0, 0.0]),      # zero norm
            (2, [0.5, 0.5]),
            (3, None),            # NULL embedding
            (4, [1.0, 0.0, 0.0]),  # wrong dimension
        ],
        "vec_id long, embedding array<double>",
    )
    q = spark.createDataFrame(
        [(7, [1.0, 0.0])], "query_id long, query_vec array<double>"
    )
    rows = {r["rank"]: r for r in knn_join(q, corpus, k=5).collect()}
    assert rows[1]["vec_id"] == 0 and rows[1]["score"] == 1.0
    assert rows[2]["vec_id"] == 2
    # the three invalid rows rank last, NULL score, id tie-break
    assert [(rows[i]["vec_id"], rows[i]["score"]) for i in (3, 4, 5)] == [
        (1, None), (3, None), (4, None)
    ]

    empty = knn_join(
        spark.createDataFrame([], "query_id int, query_vec array<double>"),
        corpus,
        k=5,
    )
    assert empty.count() == 0
    assert dict(empty.dtypes)["query_id"] == "int"
    assert dict(empty.dtypes)["vec_id"] == "bigint"


def test_knn_join_null_query_vector_raises_named_error(spark):
    """A NULL QUERY vector is a caller error (nothing to rank against);
    it must raise a ValueError naming the offending query id — not an
    opaque numpy TypeError on the driver."""
    import pytest

    corpus = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    q = spark.createDataFrame(
        [(7, [1.0, 0.0]), (8, None)],
        "query_id long, query_vec array<double>",
    )
    with pytest.raises(ValueError, match=r"NULL query_vec.*\[8\]"):
        knn_join(q, corpus, k=1)


def test_train_centroids_ordered_is_replayable(spark, registry):
    """The deterministic trainer must be bit-reproducible from the same
    vectors loaded WITHOUT Spark (the oracle builder's path) — this is
    the property that lets knn_ivf_recall_oracle_sql inline identical
    centroid literals."""
    import numpy as np

    from project_cortex_spark.operators.knn import (
        _kmeans_deterministic,
        train_centroids_ordered,
    )
    from tests.conftest import SF_DIR

    emb = registry.table("embeddings")
    spark_side = train_centroids_ordered(emb, n_centroids=16, iters=8)

    import duckdb

    rows = duckdb.sql(
        f"SELECT embedding FROM read_parquet('{SF_DIR}/embeddings.parquet')"
        " ORDER BY vec_id"
    ).fetchall()
    oracle_side = _kmeans_deterministic(
        np.array([list(r[0]) for r in rows], dtype=np.float64), 16, 8
    )
    assert np.array_equal(spark_side, oracle_side)  # bit-exact, not allclose


def test_train_pq_codebooks_ordered_is_replayable(spark, registry):
    """PQ analogue of the centroid replay property: the ordered trainer
    must be bit-reproducible from the same vectors loaded WITHOUT Spark
    (what lets knn_pq_recall_oracle_sql inline identical codebook
    literals)."""
    import numpy as np

    from project_cortex_spark.operators.knn import (
        _pq_lloyd_deterministic,
        train_pq_codebooks_ordered,
    )
    from tests.conftest import SF_DIR

    emb = registry.table("embeddings")
    spark_side = train_pq_codebooks_ordered(
        emb, n_subspaces=8, n_codes=16, iters=4
    )

    import duckdb

    rows = duckdb.sql(
        f"SELECT embedding FROM read_parquet('{SF_DIR}/embeddings.parquet')"
        " ORDER BY vec_id"
    ).fetchall()
    oracle_side = _pq_lloyd_deterministic(
        np.array([list(r[0]) for r in rows], dtype=np.float64), 8, 16, 4
    )
    assert np.array_equal(spark_side, oracle_side)  # bit-exact, not allclose


def test_pq_lloyd_blas_equivalence(registry):
    """The r10 BLAS distance form (||c||^2 - 2 x.c) must pick the same
    argmin as the naive (x - c)^2 broadcast on the gated fixture — same
    assignments at every iteration means bit-identical codebooks (the
    mean updates see identical member sets)."""
    import numpy as np

    from project_cortex_spark.operators.knn import _pq_lloyd_deterministic

    emb = registry.table("embeddings")
    rows = emb.orderBy("vec_id").limit(10000).select("embedding").collect()
    sample = [list(r[0]) for r in rows]

    def lloyd_naive(sample, n_subspaces, n_codes, iters):
        s = np.asarray(sample, dtype=np.float64)
        s = s / np.clip(np.linalg.norm(s, axis=1, keepdims=True), 1e-12, None)
        dsub = s.shape[1] // n_subspaces
        books = np.empty((n_subspaces, n_codes, dsub), dtype=np.float64)
        for j in range(n_subspaces):
            block = s[:, j * dsub : (j + 1) * dsub]
            cent = block[: min(n_codes, len(block))].copy()
            for _ in range(iters):
                d2 = ((block[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
                assign = np.argmin(d2, axis=1)
                for c in range(len(cent)):
                    members = block[assign == c]
                    if len(members):
                        cent[c] = members.mean(axis=0)
            books[j, : len(cent)] = cent
            if len(cent) < n_codes:
                books[j, len(cent) :] = cent[0]
        return books

    for n_codes, iters in ((64, 8), (16, 4)):
        fast = _pq_lloyd_deterministic(sample, 8, n_codes, iters)
        naive = lloyd_naive(sample, 8, n_codes, iters)
        assert np.array_equal(fast, naive)


# ---------------------------------------------------------------------------
# binary (sign-bit) quantization tier
# ---------------------------------------------------------------------------


def test_knn_topk_binary_matches_oracle(registry, duck):
    from project_cortex_spark import oracle

    qv = [float(x) for x in _query_vec(duck)]
    df = knn.knn_topk_binary(registry.table("embeddings"), qv, k=15)
    assert_matches_oracle(
        df, duck, oracle.knn_binary_oracle_sql(k=15), ordered=True
    )


def test_knn_binary_rerank_matches_oracle(registry, duck):
    from project_cortex_spark import oracle

    qv = [float(x) for x in _query_vec(duck)]
    df = knn.knn_topk_binary_rerank(
        registry.table("embeddings"), qv, k=15, n_candidates=64
    ).withColumn("score", F.round("score", 6))
    assert_matches_oracle(
        df,
        duck,
        oracle.knn_binary_rerank_oracle_sql(k=15, n_candidates=64),
        ordered=True,
    )


def test_knn_binary_rerank_full_candidates_is_exact(registry, duck):
    # with n_candidates == |corpus| the two-stage search IS knn_topk
    qv = [float(x) for x in _query_vec(duck)]
    emb = registry.table("embeddings")
    n = emb.count()
    two_stage = [
        r.vec_id
        for r in knn.knn_topk_binary_rerank(
            emb, qv, k=12, n_candidates=n
        ).collect()
    ]
    exact = [r.vec_id for r in knn_topk(emb, qv, k=12).collect()]
    assert two_stage == exact


def test_binary_codes_pack_sign_bits(spark):
    # hand-built vectors: known bit patterns in each half
    from project_cortex_spark.operators.knn import binarize_embeddings

    vec = [0.0] * 64
    vec[0] = 1.0       # bit 0 of lo
    vec[31] = 0.5      # bit 31 of lo
    vec[32] = 2.0      # bit 0 of hi
    vec[63] = 1e-30    # bit 31 of hi (any positive value)
    vec[5] = -3.0      # negative -> 0
    df = spark.createDataFrame(
        [(0, vec)], "vec_id long, embedding array<float>"
    )
    row = binarize_embeddings(df).collect()[0]
    assert row.bits_lo == (1 << 0) | (1 << 31)
    assert row.bits_hi == (1 << 0) | (1 << 31)


def test_binary_rerank_recall_dominates_raw(registry, duck):
    # the rerank stage can only improve recall over the raw Hamming cut
    qv = [float(x) for x in _query_vec(duck)]
    emb = registry.table("embeddings")
    exact = knn_topk(emb, qv, k=15).select(
        F.lit(0).alias("query_id"), "vec_id"
    )
    raw = knn.knn_topk_binary(emb, qv, k=15).select(
        F.lit(0).alias("query_id"), "vec_id"
    )
    rer = knn.knn_topk_binary_rerank(emb, qv, k=15, n_candidates=64).select(
        F.lit(0).alias("query_id"), "vec_id"
    )
    raw_r = knn.ann_recall(raw, exact).collect()[0].recall_e4
    rer_r = knn.ann_recall(rer, exact).collect()[0].recall_e4
    assert rer_r >= raw_r
    assert rer_r >= 5000  # 64/500 candidates already recover most of top-15


def test_knn_join_binary_matches_oracle(registry, duck):
    from project_cortex_spark import oracle

    queries = registry.table("embeddings").filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    df = knn.knn_join_binary(queries, registry.table("embeddings"), k=5)
    assert_matches_oracle(
        df, duck, oracle.knn_join_binary_oracle_sql(n_queries=5, k=5)
    )


def test_knn_join_binary_self_is_nearest(registry):
    # each query is drawn from the corpus: its own id must rank first
    # (hamming 0, smallest id among distance-0 ties... the query itself)
    queries = registry.table("embeddings").filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    rows = knn.knn_join_binary(queries, registry.table("embeddings"), k=1).collect()
    assert all(r.hamming == 0 for r in rows)


def test_ivf_filtered_full_probe_equals_exact_on_filtered_corpus(registry):
    """Corpus-side predicate + nprobe == n_centroids degrades to the
    exact join over the FILTERED corpus — the commuting property the
    filtered-ANN gate rests on."""
    emb = registry.table("embeddings")
    q = _queries_frame(registry)
    filtered = emb.filter(F.col("label").isin(1, 2, 3))
    exact = knn.knn_join(q, filtered, k=5)
    cents = knn.train_centroids_ordered(emb, n_centroids=8, iters=4)
    ivf = knn.knn_join_ivf(
        q, filtered, k=5, n_centroids=8, nprobe=8, centroids=cents
    )
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    e = {key(r): (r["vec_id"], round(r["score"], 9)) for r in exact.collect()}
    i = {key(r): (r["vec_id"], round(r["score"], 9)) for r in ivf.collect()}
    assert e == i
