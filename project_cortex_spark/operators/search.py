"""The ``cortex_search`` composite: semantic search end to end.

Reference pipeline (internal/mcp/search_sqlite.go:52-212): embed(query,
mode=query) -> vec0 KNN k=2*limit -> join chunks+files payload ->
chunk_type OR-filter, tag AND-filter -> score = 1 - dist/2 -> min_score
-> limit. Tags rewrite to column predicates (search_sqlite.go:104-127):
a language tag becomes ``files.language = tag``; 'code' becomes
``chunk_type != 'documentation'``; 'documentation' the equality.

Spark-first differences (SURVEY §3.2): filters are plain Column
predicates that Catalyst pushes BELOW the scoring projection, so the
reference's 2x over-fetch headroom (it must post-filter after vec0
returns) disappears — we score only surviving rows and take an exact
top-k (TakeOrderedAndProject).

Scale notes: the index frame is chunk rows with an ``array<float>``
embedding column — scored with a narrow codegen projection; the only
wide edge is the final top-k, which is a driver-side heap merge of
per-partition partial top-ks, not a sort.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from project_cortex_spark.operators.knn import knn_topk
from project_cortex_spark.pipeline.chunks import assemble_code_chunks
from project_cortex_spark.pipeline.embed import DEFAULT_DIM, PROVIDERS, embed_chunks


def build_search_index(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    dim: int = DEFAULT_DIM,
    provider: str = "hash",
) -> DataFrame:
    """Chunk + embed + payload join — the build side that ``cortex_index``
    maintains and ``cortex_search`` reads (chunks ⋈ files, J2)."""
    chunks = assemble_code_chunks(docs, id_col=id_col, text_col=text_col)
    payload = docs.select(id_col, F.col(lang_col).alias("language"))
    embedded = embed_chunks(
        chunks, text_col="chunk_text", dim=dim, mode="passage", provider=provider
    )
    return embedded.join(payload, id_col)


def tag_predicate(tag: str) -> Column:
    """P9 tag -> column rewrite (search_sqlite.go:235-276)."""
    if tag == "code":
        return F.col("chunk_type") != "documentation"
    if tag == "documentation":
        return F.col("chunk_type") == "documentation"
    return F.col("language") == tag


def lexical_retrieval_top1(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = DEFAULT_DIM,
    every: int = 25,
    provider: str = "lexical",
) -> DataFrame:
    """Retrieval-quality contract for the lexical provider (D7): every
    ``every``-th document, embedded in QUERY mode from its own text, must
    retrieve itself from the passage-embedded corpus as the top-1 cosine
    hit — the driver-gradable form of "cosine tracks weighted token
    overlap".

    The oracle twin computes the noiseless ranking (what cosine converges
    to as dim→∞, since E[dir_i·dir_j] = δ_ij for the crc32-seeded random
    directions): weighted-overlap cosine Σ w_q(t)·w_d(t) / (‖w_q‖·‖w_d‖)
    with w = 1 + ln(tf) and the virtual mode token contributing only to
    the norms. A provider whose cosine stopped tracking token overlap
    (broken tokenization, non-deterministic directions, normalization
    bugs) diverges from that ranking and reds the gate.

    Returns (query_doc_id, top_doc_id), ties broken by doc id — exact
    token-multiset duplicates embed identically on both sides, so the
    tie-break agrees.

    Physical shape: the query side (n/every rows) broadcasts against the
    corpus scan; the window top-1 runs map-side partial before the
    shuffle on query_doc_id — same plan family as :func:`knn_join`.
    """
    from project_cortex_spark.functions.vector import similarity_score

    base = docs.select(id_col, text_col)
    passages = embed_chunks(
        base, text_col=text_col, out_col="p_vec", dim=dim, mode="passage",
        provider=provider,
    ).select(F.col(id_col).alias("top_doc_id"), "p_vec")
    queries = embed_chunks(
        base.filter(F.col(id_col) % every == 0),
        text_col=text_col, out_col="q_vec", dim=dim, mode="query",
        provider=provider,
    ).select(F.col(id_col).alias("query_doc_id"), "q_vec")
    from pyspark.sql import Window

    scored = passages.crossJoin(F.broadcast(queries)).withColumn(
        "score", similarity_score(F.col("p_vec"), F.col("q_vec"))
    )
    w = Window.partitionBy("query_doc_id").orderBy(
        F.col("score").desc(), F.col("top_doc_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("query_doc_id", "top_doc_id")
    )


def semantic_search(
    index: DataFrame,
    query: str,
    *,
    limit: int = 15,
    chunk_types: list[str] | None = None,
    tags: list[str] | None = None,
    min_score: float | None = None,
    dim: int = DEFAULT_DIM,
    provider: str = "hash",
) -> DataFrame:
    """Embed the query (query mode, asymmetric to passages) and return the
    top ``limit`` chunks with payload: (chunk_id, doc_id, chunk_type,
    language, score). chunk_types OR together; tags AND together.
    ``provider`` must match the one the index was built with."""
    embed = PROVIDERS[provider]
    qv = [float(x) for x in embed(pd.Series([query]), dim=dim, mode="query")[0]]
    where = None
    if chunk_types:
        where = F.col("chunk_type").isin(*chunk_types)
    for tag in tags or []:
        p = tag_predicate(tag)
        where = p if where is None else (where & p)
    return knn_topk(
        index,
        qv,
        vec_col="embedding",
        id_col="chunk_id",
        k=limit,
        min_score=min_score,
        where=where,
        payload_cols=["doc_id", "chunk_type", "language"],
    )


def build_doc_vectors(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = DEFAULT_DIM,
    provider: str = "hash",
) -> DataFrame:
    """Document-level embedding side of hybrid retrieval: one passage
    vector per document (no chunking), ``(id, embedding)``. A narrow
    Arrow-batched map like every embed stage — no shuffle."""
    return embed_chunks(
        docs.select(id_col, text_col),
        text_col=text_col,
        dim=dim,
        mode="passage",
        provider=provider,
    ).select(id_col, "embedding")


def hybrid_search_rrf(
    fts_index,
    doc_vectors: DataFrame,
    lexical_query: str,
    semantic_query: str,
    *,
    k: int = 15,
    n_per_list: int = 50,
    rrf_k: int = 60,
    dim: int = DEFAULT_DIM,
    provider: str = "hash",
    id_col: str = "doc_id",
    rank_digits: int = 9,
) -> DataFrame:
    """Hybrid retrieval with reciprocal-rank fusion: BM25 top-N and
    cosine top-N fused by ``Σ 1/(rrf_k + rank)`` (Cormack et al.'s RRF,
    the standard model-free fusion every production retrieval stack
    runs ahead of the reranker). The reference serves ``cortex_exact``
    and ``cortex_search`` as separate tools (internal/mcp/
    exact_sqlite.go, search_sqlite.go); fusing them is the beyond-parity
    step a retrieval user expects.

    Output: (id, rrf_score, lex_rank, sem_rank) — NULL rank for a doc
    present in only one list (its contribution is 0), ordered by fused
    score desc with the id tie-break. Ranks are BIGINT so the schema
    matches the SQL replay's ``row_number()``.

    Physical shape: each list is an independent distributed top-N
    (BM25 posting join / TakeOrderedAndProject scoring scan); only the
    two ≤N-row rank frames meet — the unpartitioned row_number windows
    and the full-outer join run on N=50 rows, driver-trivial at any
    corpus scale. Because ranks are integers, the fused score is a
    deterministic double in BOTH engines — the whole composite is
    hash-gateable (oracle.hybrid_rrf_oracle_sql).
    """
    from project_cortex_spark.operators.fts import fts_search
    from project_cortex_spark.operators.knn import knn_topk
    from pyspark.sql import Window

    embedder = PROVIDERS[provider]
    qv = [
        float(x)
        for x in embedder(pd.Series([semantic_query]), dim=dim, mode="query")[0]
    ]
    # rank_digits quantizes both lists' scores before the cut and the
    # ranks: a replicated corpus holds packs of truly-equal scores that
    # reassociate to ±1-ulp differences — unquantized, those rank in
    # engine-/partitioning-dependent order (measured at the sf1 replica
    # harness: adjacent lexical ranks flipped between Spark and the SQL
    # replay); at 9 dp the packs collapse onto the id tie-break.
    lex = fts_search(
        fts_index,
        lexical_query,
        limit=n_per_list,
        rank_digits=rank_digits,
    ).select(id_col, "score")
    sem = knn_topk(
        doc_vectors,
        qv,
        vec_col="embedding",
        id_col=id_col,
        k=n_per_list,
        rank_digits=rank_digits,
    )

    def ranked(df: DataFrame, rank_name: str) -> DataFrame:
        # unpartitioned window over an already-cut top-N frame (≤ 50
        # rows): single-task by construction, not a scale concern
        w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
        return df.select(
            id_col, F.row_number().over(w).cast("long").alias(rank_name)
        )

    fused = ranked(lex, "lex_rank").join(
        ranked(sem, "sem_rank"), [id_col], "full"
    )
    contrib = lambda r: F.coalesce(  # noqa: E731
        F.lit(1.0) / (F.lit(float(rrf_k)) + F.col(r)), F.lit(0.0)
    )
    return (
        fused.withColumn("_f", contrib("lex_rank") + contrib("sem_rank"))
        .orderBy(F.col("_f").desc(), F.col(id_col).asc())
        .limit(k)
        .select(
            id_col,
            F.round("_f", 6).alias("rrf_score"),
            "lex_rank",
            "sem_rank",
        )
    )


def hybrid_search_weighted(
    fts_index,
    doc_vectors: DataFrame,
    lexical_query: str,
    semantic_query: str,
    *,
    k: int = 15,
    n_per_list: int = 50,
    w_lex: float = 0.4,
    w_sem: float = 0.6,
    dim: int = DEFAULT_DIM,
    provider: str = "hash",
    id_col: str = "doc_id",
    rank_digits: int = 9,
) -> DataFrame:
    """The other standard fusion: min-max normalize each list's scores
    to [0, 1] and take a weighted sum (convex combination) — the
    score-aware alternative to RRF when list score scales are trusted.
    A degenerate list (all scores equal) normalizes to 1.0 everywhere
    by convention; a doc missing from a list contributes 0.

    Same physical shape as :func:`hybrid_search_rrf`: two independent
    distributed top-N lists, fusion over two ≤N-row frames. The
    normalization inputs are the 9 dp rank-quantized scores, so every
    downstream double is a pure function of identical inputs in both
    engines — hash-gateable end to end.
    """
    from project_cortex_spark.operators.fts import fts_search
    from project_cortex_spark.operators.knn import knn_topk
    from pyspark.sql import Window

    embedder = PROVIDERS[provider]
    qv = [
        float(x)
        for x in embedder(pd.Series([semantic_query]), dim=dim, mode="query")[0]
    ]
    lex = fts_search(
        fts_index, lexical_query, limit=n_per_list, rank_digits=rank_digits
    ).select(id_col, "score")
    sem = knn_topk(
        doc_vectors,
        qv,
        vec_col="embedding",
        id_col=id_col,
        k=n_per_list,
        rank_digits=rank_digits,
    )

    def normed(df: DataFrame, out: str) -> DataFrame:
        w = Window.partitionBy(F.lit(1))  # whole ≤N-row frame
        lo, hi = F.min("score").over(w), F.max("score").over(w)
        return df.select(
            id_col,
            F.when(hi == lo, F.lit(1.0))
            .otherwise((F.col("score") - lo) / (hi - lo))
            .alias(out),
        )

    fused = normed(lex, "lex_norm").join(
        normed(sem, "sem_norm"), [id_col], "full"
    )
    f = F.lit(w_lex) * F.coalesce(F.col("lex_norm"), F.lit(0.0)) + F.lit(
        w_sem
    ) * F.coalesce(F.col("sem_norm"), F.lit(0.0))
    return (
        fused.withColumn("_f", f)
        .orderBy(F.col("_f").desc(), F.col(id_col).asc())
        .limit(k)
        .select(
            id_col,
            F.round("_f", 6).alias("wsum_score"),
            F.round("lex_norm", 6).alias("lex_norm"),
            F.round("sem_norm", 6).alias("sem_norm"),
        )
    )
