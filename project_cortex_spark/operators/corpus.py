"""Corpus management operators for training-data pipelines.

Beyond the reference (BASELINE.json north star): the operations that sit
between "indexed corpus" and "training run" at 100 TB —

- ``hash_split``: deterministic, stable train/val/test assignment. The
  split is a pure function of the document id (md5 bucket), so re-runs,
  incremental additions, and different engines agree forever; no state,
  no sampling drift. This is why it is md5-based and not ``rand()``.
- ``weighted_mix``: up/down-sample sources to target proportions with
  the same deterministic hash ordering (take the lowest-hash fraction
  per source) — reproducible corpus mixing without a global sort.
- ``decontaminate``: drop documents sharing any word n-gram with a
  benchmark set — the standard eval-contamination guard. One shingle
  explode per side and one equi-join on the shingle; no pairwise
  comparison.

All three are oracle-checked against DuckDB (md5 and the tokenizer are
engine-portable by construction).

Scale notes: hash_split/weighted_mix are narrow projections + one
filter — no shuffle at all (the hash IS the randomness). decontaminate
shuffles on the shingle value once; benchmark sides are typically small
enough that the matched-ids frame broadcasts back for the anti-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import shingles
from .dedup import ensure_parallelism


def _hash_bucket(id_col: Column, *, buckets: int = 10_000, salt: str = "split") -> Column:
    """Deterministic bucket in [0, buckets): integer value of the first 8
    hex digits of md5(salt || ':' || id) — identical in DuckDB via
    ``('0x' || substr(md5(...), 1, 8))::BIGINT % buckets``."""
    h = F.md5(F.concat(F.lit(f"{salt}:"), id_col.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % buckets


def hash_split(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    fractions: dict[str, float] | None = None,
    salt: str = "split",
) -> DataFrame:
    """Append ``split`` ∈ fractions.keys() assigned by hash bucket.

    Default 98/1/1 train/val/test. Assignment is stable under corpus
    growth: a document's split never changes when other documents are
    added or removed.
    """
    fractions = fractions or {"train": 0.98, "val": 0.01, "test": 0.01}
    return docs.withColumn(
        "split", _split_expr(F.col(id_col), fractions, salt)
    )


def _split_expr(key: Column, fractions: dict[str, float], salt: str) -> Column:
    """The shared bucket→split CASE: hash the key, walk the cumulative
    fraction bounds. hash_split applies it to the document id,
    cluster_split to the cluster representative."""
    total = sum(fractions.values())
    bucket = _hash_bucket(key, salt=salt)
    expr = None
    acc = 0.0
    for name, frac in fractions.items():
        acc += frac
        bound = int(round(acc / total * 10_000))
        cond = bucket < bound
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return expr


def cluster_split(
    docs: DataFrame,
    clusters: DataFrame,
    *,
    id_col: str = "doc_id",
    fractions: dict[str, float] | None = None,
    salt: str = "split",
) -> DataFrame:
    """LEAKAGE-SAFE train/val/test split: every member of a
    near-duplicate cluster lands in the SAME split, because the split
    hashes the cluster REPRESENTATIVE (the component's minimum doc id;
    a singleton represents itself) instead of the document. Per-doc
    :func:`hash_split` lets near-dup twins straddle train and val — the
    classic eval-contamination channel exact decontamination misses
    (the duplicate is near, not exact); splitting by cluster closes it.

    ``clusters`` is (doc_id, cluster_id) from
    ``dedup.duplicate_clusters`` (or the star-alternation CC — same
    contract). Returns (doc_id, rep, split). Assignment is stable
    under corpus growth exactly when cluster membership is: a new
    near-dup joins its twin's split; unrelated additions change
    nothing. One broadcast-able left join (the cluster frame is the
    near-dup subset, small relative to the corpus) plus the same
    per-row hash CASE as hash_split — no extra shuffle at 100 TB.
    """
    fractions = fractions or {"train": 0.98, "val": 0.01, "test": 0.01}
    rep = (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(
            clusters.select("doc_id", "cluster_id"),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("rep"),
        )
    )
    return rep.select(
        "doc_id", "rep", _split_expr(F.col("rep"), fractions, salt).alias("split")
    )


def weighted_mix(
    sources: DataFrame,
    *,
    id_col: str = "doc_id",
    source_col: str = "source",
    keep_fractions: dict[str, float],
    salt: str = "mix",
) -> DataFrame:
    """Keep a deterministic ``keep_fractions[source]`` share of each
    source's rows (the lowest hash buckets), giving reproducible
    down-sampling for corpus mixing. Sources not listed are dropped."""
    bucket = _hash_bucket(F.col(id_col), salt=salt)
    expr = None
    for name, frac in keep_fractions.items():
        bound = int(round(frac * 10_000))
        cond = (F.col(source_col) == name) & (bucket < bound)
        expr = cond if expr is None else (expr | cond)
    return sources.filter(expr)


def sample_per_key(
    docs: DataFrame,
    *,
    key_col: str = "lang",
    id_col: str = "doc_id",
    k: int = 25,
    salt: str = "sample",
) -> DataFrame:
    """Deterministic exactly-min(k, |stratum|) sample per key: rank rows
    within each stratum by md5(salt:id) and keep the k lowest.

    Unlike ``weighted_mix`` (fraction-based), this yields a COUNT-based
    stratified sample — the shape eval-set carving and per-language
    inspection samples need. The hash order makes it reproducible across
    engines and stable per row under corpus growth within a stratum's
    top-k (a new doc can displace at most the current rank-k row).

    Scale: one window shuffle on ``key_col``. With heavily skewed strata
    (one language = 80 % of 100 TB) pre-filter with a hash threshold
    ≈ C·k/|stratum| before the window so only a sliver of each stratum
    shuffles; the window then ranks thousands of rows, not billions.
    """
    from pyspark.sql import Window

    h = F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")))
    w = Window.partitionBy(key_col).orderBy(h, F.col(id_col))
    return (
        docs.withColumn("sample_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("sample_rank") <= k)
    )


def weighted_sample_per_key(
    docs: DataFrame,
    *,
    key_col: str = "lang",
    id_col: str = "doc_id",
    weight_col: str = "quality",
    k: int = 25,
    salt: str = "wsample",
    weight_floor: float = 0.01,
) -> DataFrame:
    """Deterministic weighted sample WITHOUT replacement: exactly
    min(k, |stratum|) rows per ``key_col``, each row's inclusion odds
    proportional to ``weight_col`` — the Efraimidis–Spirakis A-Res
    scheme (rank by ``ln(u)/w`` descending, u uniform per row), with the
    corpus hash as the randomness so membership is reproducible across
    runs and engines (the same hash-is-the-randomness contract as
    :func:`hash_split`; ``rand()`` would drift between runs).

    Complements :func:`sample_per_key` (uniform count-based) and
    :func:`importance_sample` (Bernoulli, no per-stratum count control):
    this is the "give me exactly k docs per language, favoring quality"
    primitive.

    Cross-engine determinism: u = (md5_32bits + 1) / 2^32 ∈ (0, 1];
    weights clamp to ≥ ``weight_floor`` so the key magnitude stays small
    enough that rounding to 9 decimals absorbs last-ulp libm drift; ties
    break on id.

    Scale: one window shuffle on ``key_col`` — the same skew note as
    :func:`sample_per_key` applies (pre-filter giant strata on a key
    threshold before the window; the A-Res key is a pure per-row
    function, so the pre-filter is a codegen scan predicate).
    """
    from pyspark.sql import Window

    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    u = (h.cast("double") + F.lit(1.0)) / F.lit(float(2**32))
    w_eff = F.greatest(F.col(weight_col), F.lit(float(weight_floor)))
    key = F.round(F.log(u) / w_eff, 9)
    win = Window.partitionBy(key_col).orderBy(
        F.col("sample_key").desc(), F.col(id_col).asc()
    )
    return (
        docs.withColumn("sample_key", key)
        .withColumn("sample_rank", F.row_number().over(win).cast("bigint"))
        .filter(F.col("sample_rank") <= k)
    )


def curriculum_stages(
    docs: DataFrame,
    *,
    key_col: str = "source",
    id_col: str = "doc_id",
    quality_col: str = "quality",
    n_stages: int = 4,
) -> DataFrame:
    """Curriculum staging: assign every document a training stage by
    quality quantile WITHIN its stratum (stage 1 = best quartile of its
    source, ...) — the curriculum-learning primitive (train on clean
    text first, anneal toward the tail) parameterized per source so one
    high-quality source does not monopolize the early stages.

    ntile is partition-local: the window sorts only within each
    ``key_col`` stratum (one shuffle, no global sort), with
    (quality DESC, id) making stage assignment engine-exact. The same
    skew note as :func:`sample_per_key` applies to a stratum holding
    most of the corpus; ntile's equal-count contract is what makes the
    stages balanced per source by construction.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(
        F.col(quality_col).desc(), F.col(id_col).asc()
    )
    return docs.withColumn("stage", F.ntile(n_stages).over(w))


def token_budget_mix(
    docs: DataFrame,
    *,
    key_col: str = "source",
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    quality_col: str = "quality",
    budget_tokens: int = 10_000,
) -> DataFrame:
    """Select documents per ``key_col`` stratum, best quality first,
    until the stratum's cumulative token count reaches
    ``budget_tokens`` — the token-budgeted data-mixing primitive (a
    training run buys N tokens per source, not N documents). A document
    is kept while the budget is not yet exhausted when it STARTS
    (tokens before it < budget), the standard greedy fill that may
    overshoot by at most one document.

    Deterministic: quality DESC with id ASC tie-break, integer token
    cumsum — engine-exact.

    Scale: one window shuffle on ``key_col``. Same skew note as
    :func:`sample_per_key`: for a stratum holding most of the corpus,
    pre-filter to plausible budget candidates (e.g. quality above the
    stratum's rough quantile) before the window sort.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(
        F.col(quality_col).desc(), F.col(id_col).asc()
    )
    cum = F.sum(token_col).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        docs.withColumn("cum_tokens", cum.cast("bigint"))
        .filter(F.col("cum_tokens") - F.col(token_col) < budget_tokens)
    )


def pack_sequences(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    seq_tokens: int = 2048,
    writers: int = 64,
    salt: str = "pack",
) -> DataFrame:
    """Assign each document a position in a packed training sequence:
    concat-then-split packing (the GPT-style pretraining layout — docs are
    concatenated in a deterministic order and the byte stream is cut every
    ``seq_tokens`` tokens, so a document may straddle two sequences).

    Output: (doc_id, writer, start_offset, n_tokens, seq_id) where
    ``writer`` is a deterministic hash shard, ``start_offset`` is the
    token offset of the doc inside its writer's stream, and
    ``seq_id = floor(start_offset / seq_tokens)`` is the training sequence
    holding the document's first token. Token counts use the reference's
    len/4 sizing heuristic (internal/indexer/chunker.go:330-333).

    Determinism: the order within a writer is (md5(salt:id), id) — the
    same order every run on every engine, so the packing layout is a pure
    function of the corpus.

    Scale: ONE shuffle, on ``writer`` (the running-sum window). There is
    no global sort — each of the ``writers`` shards packs independently,
    which is exactly how N parallel tokenizer-writer tasks lay out a
    100 TB corpus. Raise ``writers`` until a shard's rows fit one task.
    """
    from pyspark.sql import Window

    from ..functions.text import estimate_llm_tokens

    h = F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")))
    writer = _hash_bucket(F.col(id_col), buckets=writers, salt=salt)
    n_tok = estimate_llm_tokens(F.col(text_col))
    w = (
        Window.partitionBy("writer")
        .orderBy("_h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            writer.alias("writer"),
            h.alias("_h"),
            n_tok.alias("n_tokens"),
        )
        .withColumn("start_offset", F.sum("n_tokens").over(w) - F.col("n_tokens"))
        .withColumn(
            "seq_id", F.floor(F.col("start_offset") / F.lit(seq_tokens)).cast("bigint")
        )
        .drop("_h")
    )


def profile(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Dataset-card statistics panel: one long-format (metric, value)
    frame with the numbers every corpus release documents — size,
    token mass, vocabulary, language mix, exact-duplicate rate.

    Values are exact integers (counts, or *_e4 scaled ratios) so the
    contract hash is precision-proof.

    Scale: one pass over the scan feeding a handful of tiny aggregates
    (each with map-side partials) unioned into a ~10-row result. The
    vocabulary count is the only wide shuffle (distinct over exploded
    tokens — at 100 TB substitute approx_count_distinct, documented
    here rather than silently switched, since the oracle checks the
    exact form).
    """
    from ..functions.text import estimate_llm_tokens, tokens

    text = F.col(text_col)
    n_tok = F.size(tokens(text))

    def metric(name: str, value) -> DataFrame:
        return value.select(
            F.lit(name).alias("metric"), F.col("value").cast("bigint").alias("value")
        )

    base = docs.select(
        F.col(id_col).alias("_id"),
        text.alias("_text"),
        F.col(lang_col).alias("_lang"),
        n_tok.alias("_ntok"),
        estimate_llm_tokens(text).alias("_est"),
    )
    rows = [
        metric("n_docs", base.agg(F.count(F.lit(1)).alias("value"))),
        metric("total_tokens", base.agg(F.sum("_ntok").alias("value"))),
        metric("total_est_llm_tokens", base.agg(F.sum("_est").alias("value"))),
        # sum/count instead of avg(): integer sums are exact in float64,
        # so the floor is deterministic across engines; avg()'s internal
        # accumulation order is not part of either engine's contract
        metric(
            "avg_doc_tokens_e4",
            base.agg(
                F.floor(
                    F.lit(10_000) * F.sum("_ntok") / F.count(F.lit(1))
                ).alias("value")
            ),
        ),
        metric(
            "vocab_size",
            base.select(F.explode(tokens(F.col("_text"))).alias("t"))
            .agg(F.countDistinct("t").alias("value")),
        ),
        metric(
            "n_langs", base.agg(F.countDistinct("_lang").alias("value"))
        ),
        metric(
            "exact_dup_docs",
            base.groupBy(F.md5(F.col("_text")))
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(
                F.coalesce(
                    F.sum(F.when(F.col("n") > 1, F.col("n") - 1)), F.lit(0)
                ).alias("value")
            ),
        ),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def importance_sample(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    weight_col: str = "quality",
    scale: float = 1.0,
    salt: str = "imp",
) -> DataFrame:
    """Quality-weighted soft filtering: keep each row with probability
    ``min(weight*scale, 1)`` — the importance-resampling shape of
    DCLM/FineWeb-style pipelines (a hard threshold throws away all
    mid-quality text; sampling proportional to the score keeps the
    distribution while tilting toward quality).

    Deterministic: the coin flip is the document's hash bucket against
    ``floor(min(weight*scale,1)*10000)``, so membership is reproducible
    across runs/engines and stable per row under corpus growth — the same
    contract as :func:`hash_split`/:func:`weighted_mix`, with a per-row
    bound instead of a per-source constant.

    Scale: one codegen filter over the scan, zero shuffle.
    """
    bucket = _hash_bucket(F.col(id_col), salt=salt)
    bound = F.floor(
        F.least(F.col(weight_col) * F.lit(float(scale)), F.lit(1.0)) * 10_000
    ).cast("bigint")
    return docs.filter(bucket < bound)


def contamination_pairs(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str | None = None,
    bench_text_col: str | None = None,
    ngram: int = 3,
    threshold_e4: int = 5_000,
    max_df: int | None = None,
) -> DataFrame:
    """Near-duplicate train/eval contamination: (doc_id, bench_id,
    containment_e4) for every corpus document covering ≥ threshold of a
    benchmark item's distinct word ``ngram``-grams.

    containment = |sh(doc) ∩ sh(bench)| / |sh(bench)| — directional on
    purpose: a training document that embeds a whole eval item is
    contaminated no matter how much other text surrounds it (symmetric
    Jaccard would dilute exactly those cases). Reported as
    ``floor(1e4*x)`` so the contract hash is precision-proof. Exact
    :func:`decontaminate` (ANY shared shingle) is the blunt form; this is
    the graded form that tolerates benign few-gram collisions.

    Scale: one equi-join on the shingle value — the benchmark side is
    tiny (eval suites are KBs-to-MBs against a 100 TB corpus), so the
    join broadcasts and the corpus side never shuffles. ``max_df`` drops
    stop-shingles from BOTH the intersection and the benchmark set sizes
    (same df-cap contract as dedup.ngram_jaccard_pairs) to kill
    quadratic hot keys when the benchmark contains boilerplate.
    """
    bid = bench_id_col or id_col
    btext = bench_text_col or text_col
    # the corpus-side shingle projection is CPU-bound; an under-split
    # local scan (one file = one task) must fan out first (no-op at scale)
    doc_sh = ensure_parallelism(docs).select(
        F.col(id_col).alias("did"),
        F.explode(F.array_distinct(shingles(F.col(text_col), ngram))).alias("sh"),
    )
    bench_sh = benchmark.select(
        F.col(bid).alias("bid"),
        F.explode(F.array_distinct(shingles(F.col(btext), ngram))).alias("sh"),
    )
    if max_df is not None:
        keep = (
            bench_sh.groupBy("sh")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= max_df)
            .select("sh")
        )
        bench_sh = bench_sh.join(keep, "sh")
    sizes = bench_sh.groupBy("bid").agg(F.count(F.lit(1)).alias("nb"))
    common = (
        doc_sh.join(F.broadcast(bench_sh), "sh")
        .groupBy("did", "bid")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    return (
        common.join(F.broadcast(sizes), "bid")
        .select(
            F.col("did").alias("doc_id"),
            F.col("bid").alias("bench_id"),
            F.floor(F.lit(10_000) * F.col("common") / F.col("nb"))
            .cast("bigint")
            .alias("containment_e4"),
        )
        .filter(F.col("containment_e4") >= threshold_e4)
    )


def fuzzy_decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str | None = None,
    bench_text_col: str | None = None,
    ngram: int = 3,
    threshold_e4: int = 5_000,
    max_df: int | None = None,
) -> DataFrame:
    """Drop documents flagged by :func:`contamination_pairs` (anti-join
    on the contaminated id set)."""
    pairs = contamination_pairs(
        docs,
        benchmark,
        id_col=id_col,
        text_col=text_col,
        bench_id_col=bench_id_col,
        bench_text_col=bench_text_col,
        ngram=ngram,
        threshold_e4=threshold_e4,
        max_df=max_df,
    )
    return docs.join(
        pairs.select(F.col("doc_id").alias(id_col)).distinct(), id_col, "left_anti"
    )


def shuffle_shards(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    seed: str = "shuffle",
    shards: int = 8,
) -> DataFrame:
    """Deterministic global corpus shuffle laid out as independent
    shards: (+shard, +pos). Training runs need a reproducible random
    order; a global ORDER BY rand() is neither reproducible nor
    shuffle-friendly. Here shard = hash-bucket of the id (size-balanced
    in expectation) and pos = rank of md5(seed:id) within the shard, so
    the (shard, pos) order is a seeded permutation any engine reproduces
    and each shard is written by one task with no global sort.

    Changing ``seed`` yields an independent permutation (fresh data
    order per epoch without rewriting bytes — readers stream shard k in
    pos order).

    Scale: ONE shuffle keyed on the shard bucket; within-shard rank is a
    window over that same partitioning. ``shards`` should be >= the
    write parallelism you want; there is no skew because md5 buckets are
    uniform.
    """
    from pyspark.sql import Window

    h = F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    shard = _hash_bucket(F.col(id_col), buckets=shards, salt=f"{seed}-shard")
    w = Window.partitionBy("shard").orderBy(h, F.col(id_col))
    return (
        docs.withColumn("shard", shard)
        .withColumn("pos", F.row_number().over(w).cast("bigint"))
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
    ngram: int = 8,
) -> DataFrame:
    """Remove docs sharing ANY word ``ngram``-gram with the benchmark.

    Returns the surviving docs frame. The contaminated-id set is derived
    with one equi-join on the shingle value; at scale persist the
    benchmark shingle set (it is small and reused across corpus drops).
    """
    bench_text = bench_text_col or text_col
    doc_sh = ensure_parallelism(docs).select(
        F.col(id_col).alias("_id"),
        F.explode(shingles(F.col(text_col), ngram)).alias("sh"),
    )
    bench_sh = benchmark.select(
        F.explode(shingles(F.col(bench_text), ngram)).alias("sh")
    ).distinct()
    contaminated = (
        doc_sh.join(bench_sh, "sh").select(F.col("_id").alias(id_col)).distinct()
    )
    return docs.join(contaminated, id_col, "left_anti")


def temperature_mix(
    docs: DataFrame,
    *,
    group_col: str = "lang",
    id_col: str = "doc_id",
    target_tenths: int = 3,
    salt: str = "tmix",
) -> DataFrame:
    """Temperature-based source mixing (the multilingual-training
    standard, alpha = 0.5): per-group quotas proportional to
    sqrt(group size), so low-resource groups are UP-weighted relative
    to their natural share and head groups stop dominating the mix —
    the sampling rule behind mBERT/XLM-R style corpus balancing.

    Integer-deterministic by construction: the weight is
    floor(sqrt(n)*1000) (IEEE sqrt is exact-rounded, so the floor is
    engine-identical), the quota is (N * w) div W in BIGINT — no float
    sum whose reassociation could flip a boundary. alpha is fixed at
    0.5 because sqrt is the one power libm guarantees exactly rounded;
    other temperatures work engine-side but aren't cross-engine
    hash-gateable. Selection inside a group is the lowest
    md5(salt:id) hashes — reproducible and uncorrelated with content.

    Output is the per-group audit row (natural count, quota, kept
    count, exact id checksum) rather than the kept rows: at 100 TB the
    summary is collectable, the selection itself stays distributed
    (filter on ``sample_rank <= quota`` of the same window).

    Scale: one count aggregate (broadcast back), one window shuffle on
    ``group_col`` — same skew envelope as :func:`sample_per_key`.
    """
    from pyspark.sql import Window

    counts = docs.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_docs"))
    weights = counts.select(
        group_col,
        "n_docs",
        F.floor(F.sqrt(F.col("n_docs").cast("double")) * 1000)
        .cast("bigint")
        .alias("w"),
    )
    totals = weights.agg(
        F.sum("w").alias("w_total"), F.sum("n_docs").alias("n_total")
    )
    quotas = weights.crossJoin(F.broadcast(totals)).select(
        group_col,
        "n_docs",
        F.least(
            F.col("n_docs"),
            F.expr(f"((n_total * {target_tenths}) div 10) * w div w_total"),
        ).alias("quota"),
    )
    win = Window.partitionBy(group_col).orderBy(
        F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))).asc(),
        F.col(id_col).asc(),
    )
    ranked = docs.select(group_col, id_col).withColumn(
        "rk", F.row_number().over(win).cast("bigint")
    )
    kept = ranked.join(F.broadcast(quotas), group_col).filter(
        F.col("rk") <= F.col("quota")
    )
    # Audit checksum over the kept ids: a 32-bit md5-prefix hash summed
    # as BIGINT (the shared sketches idiom), NOT sum(id) — sum() on a
    # string id column silently returns NULL and voids the exact-id
    # audit (ADVICE r6). Works for numeric and string ids alike.
    id_h = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("bigint")
    return (
        kept.groupBy(group_col, "n_docs", "quota")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum(id_h).alias("sum_kept_id_hash"),
        )
        .orderBy(group_col)
    )


def cluster_balance(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    per_cluster: int = 25,
    salt: str = "cluster",
    sample_rows: int = 10_000,
    iters: int = 8,
) -> DataFrame:
    """Semantic cluster-balanced selection — the SemDeDup / topic-
    balancing curation step: k-means topics over the embedding column,
    then a deterministic per-cluster quota sample, so no topic dominates
    the selected corpus no matter how skewed the raw crawl is.

    Composition of two already-gated pieces: the replayable ordered
    trainer + argmax-cosine assignment (the IVF machinery,
    operators/knn.py — deterministic centroids from the id-ordered
    sample, lowest-centroid tiebreak) and :func:`sample_per_key`'s
    md5-ranked per-stratum quota. Output: (vec_id, cluster_id,
    sample_rank) for the selected rows — exactly
    min(per_cluster, |cluster|) rows per cluster.

    Scale notes: training touches a bounded id-ordered sample
    (standard 100 TB practice); assignment is one Arrow-batched matmul
    map; selection is one window shuffle keyed on cluster_id. Nothing
    global except the tiny centroid matrix riding in the UDF closure.
    """
    from .knn import assign_clusters, train_centroids_ordered

    cent = train_centroids_ordered(
        emb,
        id_col=id_col,
        vec_col=vec_col,
        n_centroids=n_clusters,
        sample_rows=sample_rows,
        iters=iters,
    )
    assigned = assign_clusters(emb, cent, vec_col=vec_col).select(
        F.col(id_col).alias("vec_id"), "cluster_id"
    )
    picked = sample_per_key(
        assigned,
        key_col="cluster_id",
        id_col="vec_id",
        k=per_cluster,
        salt=salt,
    )
    return picked.select("vec_id", "cluster_id", "sample_rank")


def length_buckets(
    lengths: DataFrame, *, length_col: str = "n_tokens"
) -> DataFrame:
    """Power-of-two sequence-length bucketing — the batch-scheduling
    layout step of a training pipeline (pad each document to its
    bucket's capacity; buckets keep padding waste bounded below 50%).
    One row per bucket: capacity, document count, real token count,
    padding waste, and fill ratio.

    The bucket capacity is derived with INTEGER bit arithmetic
    (1 << bitlength(n-1), i.e. the smallest power of two >= n) rather
    than ceil(log2(n)) — float log2 lands on exact powers of two only
    up to rounding, the bit form is exact in both engines. One hash
    aggregate after a map-side capacity projection: a scan plus a
    single tiny exchange (there are only ~log2(max_len) groups).
    """
    n = F.col(length_col).cast("long")
    # pyspark's F.shiftleft only takes a LITERAL bit count, so the
    # column-valued shift goes through expr
    cap = (
        F.when(n <= 1, F.lit(1).cast("long"))
        .otherwise(
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), "
                f"CAST(length(bin(CAST({length_col} AS BIGINT) - 1)) AS INT))"
            )
        )
        .alias("bucket_cap")
    )
    return (
        lengths.filter(n > 0)
        .select(cap, n.alias("_n"))
        .groupBy("bucket_cap")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_n").alias("sum_tokens"),
        )
        .select(
            "bucket_cap",
            "n_docs",
            "sum_tokens",
            (F.col("n_docs") * F.col("bucket_cap") - F.col("sum_tokens")).alias(
                "padding_waste"
            ),
            F.round(
                F.col("sum_tokens").cast("double")
                / (F.col("n_docs") * F.col("bucket_cap")).cast("double"),
                6,
            ).alias("fill_ratio"),
        )
    )
