"""Training-data pipeline composition operators.

The dedup/similarity/text modules score and pair documents; this
module holds the corpus-shaping steps a large-scale LLM data pipeline
runs after them:

- deterministic train/test splitting (hash-bucket, reproducible across
  runs and engines — never ``rand()``);
- weighted corpus mixture sampling (per-source deterministic prefix);
- sequence packing (concatenate-then-chunk token-budget binning — the
  GPT-style packing layout, computed as a prefix-sum window);
- context-window chunking (overlapping token windows per document);
- quality-percentile filtering (keep the top share by score).

All pure DataFrame plans, no Python UDFs. Determinism rules follow the
repo convention: orderings get explicit total tie-breaks, "random"
orderings come from md5 (bit-identical in the DuckDB oracle).

Scale notes are per-function; the one global-window op (packing)
documents its per-shard parallel form.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import exploded_shingles, md5_hash60, with_tokens
from .text import quality_score

PACK_BUDGET = 512  # power of two: offset/budget divisions stay exact in f64


def train_test_split(
    docs: DataFrame, id_col: str = "doc_id", train_pct: int = 90
) -> DataFrame:
    """Deterministic hash-bucket split: md5(id) % 100 < train_pct →
    'train'. Stable under corpus growth (a doc never flips sides when
    other docs arrive), engine-reproducible, no shuffle at all — the
    split is a map-side expression.
    """
    bucket = F.pmod(md5_hash60(F.col(id_col).cast("string")), F.lit(100))
    return docs.select(
        F.col(id_col),
        bucket.alias("bucket"),
        F.when(bucket < train_pct, F.lit("train")).otherwise(F.lit("test")).alias("split"),
    )


def split_leakage(
    docs: DataFrame,
    threshold: float = 0.3,
    num_hashes: int = 16,
    bands: int = 8,
    n: int = 3,
    id_col: str = "doc_id",
    train_pct: int = 90,
) -> DataFrame:
    """Train/test split-leakage audit: near-duplicate pairs that CROSS
    the hash-bucket split boundary — the contamination check a
    training pipeline must run before trusting held-out metrics (a
    test doc with a train-side near-dup inflates eval scores; the
    same failure mode benchmark decontamination guards against,
    applied to the pipeline's own split).

    Composition of two existing tiers: LSH candidate pairs with the
    exact shingle-Jaccard verify (:func:`dedup.minhash_jaccard_estimate`
    — bucketed, never all-pairs) filtered to ``jaccard ≥ threshold``,
    joined twice against the deterministic split labels
    (:func:`train_test_split` — a map-side expression, no shuffle),
    kept only where the sides differ, oriented (train, test).

    Scale: the candidate-pair frame is the dominant cost and is the
    same sub-quadratic LSH shape as the dedup tier; the split join
    adds two narrow hash-key joins on the pair sliver. Output: one
    row per leaked pair (train_doc_id, test_doc_id, n_common,
    jaccard).
    """
    from .dedup import minhash_jaccard_estimate

    pairs = minhash_jaccard_estimate(docs, num_hashes, bands, n, id_col)
    spl = train_test_split(docs, id_col, train_pct).select(id_col, "split")
    labeled = (
        pairs.where(F.col("jaccard") >= threshold)
        .join(
            spl.select(
                F.col(id_col).alias("doc_a"), F.col("split").alias("split_a")
            ),
            "doc_a",
        )
        .join(
            spl.select(
                F.col(id_col).alias("doc_b"), F.col("split").alias("split_b")
            ),
            "doc_b",
        )
        .where(F.col("split_a") != F.col("split_b"))
    )
    train_first = F.col("split_a") == "train"
    return labeled.select(
        F.when(train_first, F.col("doc_a")).otherwise(F.col("doc_b")).alias(
            "train_doc_id"
        ),
        F.when(train_first, F.col("doc_b")).otherwise(F.col("doc_a")).alias(
            "test_doc_id"
        ),
        F.col("n_common").cast("long").alias("n_common"),
        "jaccard",
    )


# fixture sources are src0..srcN; weights mirror a typical corpus mix
MIXTURE_FRACTIONS: dict[str, float] = {"src0": 0.5, "src1": 0.25}
MIXTURE_DEFAULT_FRACTION = 0.1


def mixture_sample(
    docs: DataFrame,
    fractions: dict[str, float] | None = None,
    default_fraction: float = MIXTURE_DEFAULT_FRACTION,
    id_col: str = "doc_id",
) -> DataFrame:
    """Weighted per-source sampling: rank docs inside each source by a
    deterministic hash, keep the prefix ``ceil(count × fraction)``.

    One shuffle on ``source``; both the rank and the per-source count
    ride the same window partitioning so the exchange is shared. At
    100 TB this is the standard corpus-mixture step (Common Crawl at
    x%, books at y%…) — deterministic, so re-runs and different
    engines agree row-for-row, unlike ``sample()``.
    """
    fractions = MIXTURE_FRACTIONS if fractions is None else fractions
    frac = None
    for src, f in fractions.items():
        arm = F.when(F.col("source") == src, F.lit(f))
        frac = arm if frac is None else frac.when(F.col("source") == src, F.lit(f))
    frac = frac.otherwise(F.lit(default_fraction)) if frac is not None else F.lit(
        default_fraction
    )
    h = md5_hash60(F.col(id_col).cast("string"), seed=7)
    w = Window.partitionBy("source")
    rn = F.row_number().over(w.orderBy(h.asc(), F.col(id_col).asc()))
    cnt = F.count(F.lit(1)).over(w)
    return (
        docs.select(
            F.col(id_col),
            F.col("source"),
            rn.cast("bigint").alias("rn"),
            F.ceil(cnt * frac).cast("bigint").alias("keep_n"),
        )
        .where(F.col("rn") <= F.col("keep_n"))
        .select(id_col, "source", "rn")
    )


def mixture_sample_sharded(
    docs: DataFrame,
    fractions: dict[str, float] | None = None,
    default_fraction: float = MIXTURE_DEFAULT_FRACTION,
    n_shards: int = 16,
    id_col: str = "doc_id",
) -> DataFrame:
    """The 100 TB form of ``mixture_sample``: each source is hash-split
    into ``n_shards`` sub-shards and sampled independently, so one
    dominant source (half of Common Crawl) no longer serializes into a
    single window partition — the same move ``pack_sequences_sharded``
    makes for packing. The kept fraction is exact per (source, shard):
    ceil rounding happens per shard instead of per source, so the
    realized source fraction differs from the target by at most
    ``n_shards / source_count`` — negligible at corpus scale, and the
    selection stays fully deterministic (hash-ranked prefix)."""
    fractions = MIXTURE_FRACTIONS if fractions is None else fractions
    frac = None
    for src, f in fractions.items():
        arm = F.when(F.col("source") == src, F.lit(f))
        frac = arm if frac is None else frac.when(F.col("source") == src, F.lit(f))
    frac = frac.otherwise(F.lit(default_fraction)) if frac is not None else F.lit(
        default_fraction
    )
    shard = F.pmod(
        md5_hash60(F.col(id_col).cast("string"), seed=13), F.lit(n_shards)
    )
    h = md5_hash60(F.col(id_col).cast("string"), seed=7)
    w = Window.partitionBy("source", "shard")
    rn = F.row_number().over(w.orderBy(F.col("h").asc(), F.col(id_col).asc()))
    cnt = F.count(F.lit(1)).over(w)
    return (
        docs.select(
            F.col(id_col),
            F.col("source"),
            shard.cast("bigint").alias("shard"),
            h.alias("h"),
        )
        .select(
            F.col(id_col),
            F.col("source"),
            F.col("shard"),
            rn.cast("bigint").alias("rn"),
            F.ceil(cnt * frac).cast("bigint").alias("keep_n"),
        )
        .where(F.col("rn") <= F.col("keep_n"))
        .select(id_col, "source", "shard", "rn")
    )


def pack_sequences(
    docs: DataFrame, budget: int = PACK_BUDGET, id_col: str = "doc_id"
) -> DataFrame:
    """Concatenate-then-chunk sequence packing: documents are laid out
    in a deterministic pseudo-shuffled order (md5), then the token
    stream is cut into ``budget``-token bins. Emits, per document, its
    starting offset in the stream and the first/last bin it lands in
    (a doc spanning a boundary is split across bins — the standard
    packing layout for next-token training).

    Computed as one prefix-sum window. The ordering here is global
    (single packing stream); the 100 TB form partitions by an
    upstream shard column first — ``Window.partitionBy(shard)`` —
    giving one independent stream per shard and full parallelism, at
    the cost of at most one underfilled final bin per shard.
    ``budget`` stays a power of two so offset/budget is exact in f64.
    """
    df = with_tokens(docs).select(
        F.col(id_col),
        F.size("tokens").cast("long").alias("n_tokens"),
        md5_hash60(F.col(id_col).cast("string"), seed=11).alias("h"),
    )
    w = (
        Window.orderBy("h", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long")
    return df.select(
        F.col(id_col),
        F.col("n_tokens"),
        start.alias("start_offset"),
        F.floor(start / budget).cast("bigint").alias("first_bin"),
        F.floor((start + F.col("n_tokens") - 1) / budget).cast("bigint").alias("last_bin"),
    )


CHUNK_WIDTH = 32
CHUNK_STRIDE = 24


def context_chunks(
    docs: DataFrame,
    width: int = CHUNK_WIDTH,
    stride: int = CHUNK_STRIDE,
    id_col: str = "doc_id",
) -> DataFrame:
    """Overlapping context windows per document: token windows of
    ``width`` every ``stride`` tokens (the long-document chunking step
    before embedding/training). Pure higher-order-function plan — the
    window count uses integer arithmetic only, so engines can't
    disagree on boundary rounding.

    Map-side explode: no shuffle; output rows ≈ n_tokens/stride per
    doc, and Catalyst prunes untouched columns before the explode.

    The chunk *index* is exploded and the chunk text assembled after —
    not ``explode(transform(...))`` — for the same reason as
    ``dedup.exploded_shingles``: Catalyst infers a ``size(...) > 0``
    filter from the Generate and pushes the full transform below any
    exchange, serializing the concat-heavy chunk construction into the
    scan stage. The index sequence keeps that inferred filter integer-
    cheap and the string assembly parallel.
    """
    # NULL text → NO chunks: size(NULL tokens) is -1 in Spark, so the
    # greatest(...) clamp would mint ONE empty chunk per NULL doc
    # while the oracle's generate_series(0, NULL) yields none (r13
    # null-corpus sweep find)
    df = with_tokens(docs).where(F.col("tokens").isNotNull())
    # integer ceil-div (div, not "/") so boundary rounding is exact
    last_chunk = (
        f"sequence(0, (greatest(size(tokens) - {width}, 0L) + {stride - 1}) div {stride})"
    )
    return df.select(
        F.col(id_col), "tokens", F.explode(F.expr(last_chunk)).alias("i")
    ).select(
        id_col,
        F.col("i").cast("bigint").alias("chunk_id"),
        (F.col("i") * stride + 1).cast("bigint").alias("start_token"),
        F.expr(
            f"concat_ws(' ', slice(tokens, CAST(i * {stride} + 1 AS INT), {width}))"
        ).alias("chunk_text"),
    )


def pack_sequences_sharded(
    docs: DataFrame,
    shard_col: str = "source",
    budget: int = PACK_BUDGET,
    id_col: str = "doc_id",
) -> DataFrame:
    """The 100 TB form of ``pack_sequences``: one independent packing
    stream per shard (``Window.partitionBy(shard_col)``), so the
    prefix-sum parallelizes across shards instead of serializing on a
    global ordering. Cost: at most one underfilled final bin per
    shard. Bin ids are per-shard (a (shard, bin) pair is the global
    key)."""
    df = with_tokens(docs).select(
        F.col(id_col),
        F.col(shard_col),
        F.size("tokens").cast("long").alias("n_tokens"),
        md5_hash60(F.col(id_col).cast("string"), seed=11).alias("h"),
    )
    w = (
        Window.partitionBy(shard_col)
        .orderBy("h", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long")
    return df.select(
        F.col(id_col),
        F.col(shard_col),
        F.col("n_tokens"),
        start.alias("start_offset"),
        F.floor(start / budget).cast("bigint").alias("first_bin"),
        F.floor((start + F.col("n_tokens") - 1) / budget).cast("bigint").alias("last_bin"),
    )


def pseudonymize_events(events: DataFrame) -> DataFrame:
    """PII handling for event logs: identifier tokenization + free-text
    number redaction.

    - ``user_pseudo_id``: md5 of the raw id — deterministic, joinable
      across tables/runs, irreversible without the original id space
      (at production scale: keyed HMAC instead; the md5 here is the
      cross-engine-checkable stand-in);
    - ``props_redacted``: digit runs collapsed to ``<NUM>`` — the
      redaction pass a training-data pipeline runs before text lands
      in a corpus.

    Pure map-side expressions; no shuffle, no UDFs.
    """
    return events.select(
        "event_id",
        F.md5(F.col("user_id").cast("string")).alias("user_pseudo_id"),
        F.regexp_replace("props", "[0-9]+", "<NUM>").alias("props_redacted"),
    )


def quality_percentile_filter(docs: DataFrame, keep_share: float = 0.5) -> DataFrame:
    """Keep the top ``keep_share`` of the corpus by quality score:
    percent_rank over (quality desc, doc_id) ≤ keep_share. The global
    window runs over the (doc_id, quality) projection only — tiny rows
    — exact ranking semantics; ``quality_threshold_filter`` is the
    100 TB form."""
    q = quality_score(docs)
    pr = F.percent_rank().over(Window.orderBy(F.desc("quality"), F.asc("doc_id")))
    return (
        q.select("doc_id", "quality")
        .withColumn("pct_rank", pr)
        .where(F.col("pct_rank") <= keep_share)
    )


def quality_threshold_filter(docs: DataFrame, keep_share: float = 0.5) -> DataFrame:
    """The scale tier of quality filtering: two passes, no global sort.

    Pass 1 aggregates the exact interpolated percentile of the score
    (a partial-aggregatable scalar — at 100 TB swap in
    ``percentile_approx`` or compute it on a sample; the shape is
    identical). Pass 2 is a map-side ``quality ≥ threshold`` filter —
    no window, no ordering, embarrassingly parallel. Unlike the
    percent_rank tier this admits score ties at the boundary (both
    engines agree bit-for-bit on the interpolated threshold, so the
    row set is still deterministic)."""
    q = quality_score(docs).select("doc_id", "quality")
    thr = q.agg(
        F.percentile("quality", F.lit(1.0 - keep_share)).alias("thr")
    )
    # 1-row scalar side — bounded by construction (allowlisted hint)
    return (
        q.crossJoin(F.broadcast(thr))
        .where(F.col("quality") >= F.col("thr"))
        .select("doc_id", "quality", "thr")
    )


DECONTAM_NGRAM = 5


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    n: int = DECONTAM_NGRAM,
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: flag every training document that
    shares at least one word n-gram with a held-out evaluation set
    (the standard pre-training hygiene step — a contaminated document
    inflates benchmark scores without improving the model).

    Output: (doc_id, n_overlap) for contaminated training docs only —
    n_overlap = number of distinct shared n-grams.

    Scale: the benchmark side is a *fixed evaluation suite* — its
    size is set by the benchmark author, not by the corpus SF — so its
    distinct n-gram set is parameter-bounded and broadcast; the
    training corpus streams map-side through the hash join with no
    shuffle of corpus data. (At 13-gram/WMDP-scale suites the
    broadcast is tens of MB; if a benchmark ever outgrew the 8 GB
    limit the hint falls away to a shuffle join by removing one line.)
    """
    bench_sh = exploded_shingles(benchmark, n, id_col).select("shingle").distinct()
    train_sh = exploded_shingles(train, n, id_col)
    # dedup AFTER the broadcast join, not before: a corpus-side
    # distinct would shuffle every (doc, n-gram) pair; countDistinct
    # on the join survivors shuffles only the contaminated rows
    return (
        train_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.countDistinct("shingle").alias("n_overlap"))
    )


def blocklist_filter(
    docs: DataFrame, terms: list[str], id_col: str = "doc_id"
) -> DataFrame:
    """C4-style token blocklist gate: per document, the count of
    distinct blocklisted tokens present and the keep/drop verdict
    (C4 drops any page containing a "bad word"; the count makes the
    policy auditable and thresholdable downstream).

    Scale: the blocklist is a fixed editorial artifact (hundreds to a
    few thousand terms), compiled into a literal array — the whole
    operator is one map-side expression inside the scan's codegen, no
    shuffle, no broadcast variable to manage. ``array_intersect``
    returns DISTINCT matches on both engines (the DuckDB twin filters
    ``list_distinct``), so the count is order-insensitive and exact.
    """
    arr = F.array(*[F.lit(t) for t in terms])
    toks = F.split(F.col("text"), " ")
    n_blocked = F.size(F.array_intersect(toks, arr)).cast("long")
    return docs.select(
        F.col(id_col),
        n_blocked.alias("n_blocked_terms"),
        (n_blocked == 0).alias("kept"),
    )


CDC_DIVISOR = 16  # expected chunk length ≈ divisor tokens
CDC_GRAM = 3


def cdc_chunks(
    docs: DataFrame,
    divisor: int = CDC_DIVISOR,
    gram: int = CDC_GRAM,
    id_col: str = "doc_id",
) -> DataFrame:
    """Content-defined chunking: cut a document AFTER token ``i``
    whenever the hash of the ``gram``-token window ending at ``i``
    is ≡ 0 mod ``divisor`` (the Rabin/rolling-hash boundary rule of
    LBFS/rsync/FastCDC, on word tokens). Unlike fixed-width chunking
    (``context_chunks``), an insertion near the top of a document
    shifts only the chunk it lands in — every later boundary
    re-synchronizes — so chunk-level dedup across crawl snapshots
    keeps matching downstream chunks.

    Entirely map-side (one projection, NO shuffle, no window): the
    boundary positions are a higher-order ``filter`` over the token
    index sequence, and each chunk is a ``slice`` between consecutive
    boundaries. Expected chunk length is ``divisor`` tokens;
    boundaries use the md5-60bit hash so the DuckDB oracle computes
    bit-identical cut points. The last position is excluded from the
    boundary rule (a cut there would create an empty trailing chunk).

    Output: (doc_id, chunk_id, start_token, n_tokens, chunk_text).
    """
    df = with_tokens(docs)
    gram_txt = ", ".join(f"element_at(tokens, CAST(i - {g} AS INT))" for g in range(gram - 1, -1, -1))
    h60 = f"CAST(conv(substr(md5(concat_ws(' ', {gram_txt})), 1, 15), 16, 10) AS BIGINT)"
    # guard: sequence(a, b) DESCENDS when b < a, so a doc shorter than
    # the gram must produce an empty boundary list, not phantom cuts
    bounds = (
        f"concat(array(0L), "
        f"CASE WHEN size(tokens) > {gram} "
        f"THEN filter(sequence({gram}L, size(tokens) - 1L), i -> {h60} % {divisor} = 0) "
        f"ELSE CAST(array() AS ARRAY<BIGINT>) END, "
        f"array(CAST(size(tokens) AS BIGINT)))"
    )
    return (
        df.where(F.size("tokens") >= 1)
        .select(
            F.col(id_col),
            "tokens",
            F.expr(bounds).alias("bounds"),
        )
        .select(
            id_col,
            "tokens",
            "bounds",
            F.explode(F.expr("sequence(1, size(bounds) - 1)")).alias("t"),
        )
        .select(
            id_col,
            (F.col("t") - 1).cast("bigint").alias("chunk_id"),
            (F.expr("element_at(bounds, t)") + 1).cast("bigint").alias("start_token"),
            (
                F.expr("element_at(bounds, t + 1) - element_at(bounds, t)")
            ).cast("bigint").alias("n_tokens"),
            F.expr(
                "concat_ws(' ', slice(tokens, CAST(element_at(bounds, t) + 1 AS INT),"
                " CAST(element_at(bounds, t + 1) - element_at(bounds, t) AS INT)))"
            ).alias("chunk_text"),
        )
    )


SOURCE_CAP = 15


def source_caps(
    docs: DataFrame, cap: int = SOURCE_CAP, id_col: str = "doc_id"
) -> DataFrame:
    """Per-source document caps — the anti-domination step (C4 /
    RefinedWeb style): no single domain may contribute more than
    ``cap`` documents, and WHICH documents survive is chosen by
    quality, not arrival order. Survivors are the top-``cap`` docs per
    source by the shared quality score (ties to the smallest id, so
    the kept set is deterministic and oracle-checkable).

    One hash exchange on ``source``; the ranking window rides that
    same partitioning (never global). At 100 TB a single hot domain is
    exactly the skew case AQE splits — and because the window needs
    only (id, source, quality), the ranked sliver is 3 narrow columns,
    never the document text.
    """
    q = quality_score(docs).select(id_col, "quality")
    w = Window.partitionBy("source").orderBy(
        F.desc("quality"), F.asc(id_col)
    )
    return (
        docs.select(id_col, "source")
        .join(q, id_col)
        .withColumn("source_rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("source_rank") <= cap)
        .select(id_col, "source", "quality", "source_rank")
    )


IMPORTANCE_TARGET_SOURCES = ("src0", "src1")


def importance_weight(
    docs: DataFrame,
    target_sources: tuple[str, ...] = IMPORTANCE_TARGET_SOURCES,
    n: int = 3,
    id_col: str = "doc_id",
) -> DataFrame:
    """Data-selection importance weights (the DSIR idea — Xie et al.
    2023, public paper — in rational arithmetic): score each raw
    document by how much its n-gram mass looks like a curated TARGET
    distribution vs the raw corpus.

    DSIR proper uses a log-likelihood ratio of hashed n-gram models;
    logs are not correctly-rounded-guaranteed across engines, so this
    computes the pooled-count ratio instead — per document,
    ``Σ_g c_target(g) / Σ_g c_corpus(g)`` over its shingle
    occurrences: exact integer sums, ONE final IEEE division, same
    ranking intuition (target-like docs score high, out-of-
    distribution docs low).

    Plan: shingle explode → ONE gram-count aggregation carrying both
    counters (corpus count + conditional target count — no second
    pass over the data) → join back → per-doc integer sums. No
    broadcast hint: the gram vocabulary scales with the corpus.
    """
    sh = exploded_shingles(docs, n, id_col)
    src = docs.select(F.col(id_col).alias("doc_id"), "source")
    sh_src = sh.join(src, "doc_id")
    is_target = F.col("source").isin(*target_sources)
    counts = sh_src.groupBy("shingle").agg(
        F.count(F.lit(1)).alias("c_corpus"),
        F.sum(F.when(is_target, 1).otherwise(0)).alias("c_target"),
    )
    return (
        sh.join(counts, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("c_target").alias("sum_target"),
            F.sum("c_corpus").alias("sum_corpus"),
        )
        .select(
            "doc_id",
            F.col("n_grams").cast("long").alias("n_grams"),
            F.col("sum_target").cast("long").alias("sum_target"),
            F.col("sum_corpus").cast("long").alias("sum_corpus"),
            (F.col("sum_target").cast("double") / F.col("sum_corpus")).alias(
                "importance"
            ),
        )
    )


def paragraph_dedup(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Corpus-wide duplicated-span REMOVAL with document rewrite (the
    MassiveText / RefinedWeb repetition-removal step): documents are
    cut into content-defined chunks (``cdc_chunks`` — boundaries
    re-synchronize after edits, so a shared paragraph hashes
    identically at any offset), every chunk keeps only its FIRST
    corpus-wide occurrence (smallest (doc_id, chunk_id), a total
    order), and each document is re-assembled from its surviving
    chunks in original order. Unlike ``dedup_cdc_chunk_spans`` (which
    only reports repeated spans), this rewrites the corpus.

    Cost at 100 TB: one map-side chunking pass, ONE digest-partitioned
    window (the survivor rank — each bucket holds copies of one span,
    so skew is bounded by the most-copied paragraph, the quantity
    ``dedup_stats_report`` monitors), and one doc_id aggregation to
    re-concatenate. Chunk text rides the digest shuffle once; the
    rewrite never compares documents pairwise.

    Output: (doc_id, n_chunks, n_kept, n_tokens_kept, text_kept) —
    text_kept is '' when every chunk of the doc was seen earlier.
    """
    chunks = cdc_chunks(docs, id_col=id_col).select(
        id_col,
        "chunk_id",
        "n_tokens",
        "chunk_text",
        md5_hash60("chunk_text").alias("digest"),
    )
    w = Window.partitionBy("digest").orderBy(id_col, "chunk_id")
    keep = (F.row_number().over(w) == 1).cast("int")
    flagged = chunks.withColumn("keep", keep)
    kept_struct = F.when(
        F.col("keep") == 1, F.struct("chunk_id", "chunk_text")
    )
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("keep").cast("bigint").alias("n_kept"),
            F.sum(F.when(F.col("keep") == 1, F.col("n_tokens")).otherwise(0))
            .cast("bigint")
            .alias("n_tokens_kept"),
            F.array_sort(F.collect_list(kept_struct)).alias("kept"),
        )
        .select(
            id_col,
            "n_chunks",
            "n_kept",
            "n_tokens_kept",
            F.array_join(
                F.expr("transform(kept, c -> c.chunk_text)"), " "
            ).alias("text_kept"),
        )
    )


def weighted_sample(
    docs: DataFrame,
    k: int = 100,
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
    seed: int = 17,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement via the Efraimidis–
    Spirakis exponential-jump key (2006, public paper): each row draws
    a deterministic uniform u from its md5-60bit hash and competes on
    key = −ln(u)/w — the k smallest keys are exactly a weight-
    proportional sample without replacement. One map-side key
    expression + a TakeOrderedAndProject top-k: no shuffle of the
    corpus, no per-stratum windows, and the same rows win on ANY
    cluster size (the draw depends only on the row, not partitioning).

    Oracle parity: u is an identical double on both engines (integer
    hash / 2^60+1 literal), but ln is transcendental — a value landing
    within 1 ulp of a DECIMAL(20,9) rounding boundary rounds
    differently across libm builds (the r5 driver hash-fail). The key
    therefore stays INTERNAL: it orders the top-k (decimal-rounded,
    doc_id total tie-break — selection flips only if two keys collide
    within an ulp exactly at the k-th boundary, vastly rarer than any
    of k keys hitting a rounding boundary) and the compared output is
    just the selected ``(doc_id, weight)`` set."""
    h = md5_hash60(F.col(id_col).cast("string"), seed=seed)
    u = (h + 1).cast("double") / F.lit(2**60 + 1).cast("double")
    key = (-F.log(u) / F.col(weight_col).cast("double")).cast("decimal(20,9)")
    return (
        docs.select(id_col, weight_col, key.alias("es_key"))
        .orderBy("es_key", id_col)
        .limit(k)
        .drop("es_key")
    )


def decontaminate_bloom(
    train: DataFrame,
    benchmark: DataFrame,
    n: int = DECONTAM_NGRAM,
    id_col: str = "doc_id",
    num_bits: int = 1 << 20,
    k_hashes: int = 3,
) -> DataFrame:
    """Scale tier of :func:`decontaminate`: the benchmark n-gram set
    folds into an explicit Bloom BITSET — the distinct relation of
    ``pmod(xxhash64(shingle, seed_i), num_bits)`` positions — whose
    size is capped by ``num_bits`` (a CONFIGURATION constant, ~4 MB
    of longs at the default), not by the suite size, so its broadcast
    is unconditionally safe even when a benchmark outgrows
    comfortable n-gram-set broadcasts. The corpus probes its k bit
    positions map-side against the broadcast bitset; a shingle is
    flagged iff its distinct matched bits equal its distinct probe
    bits (countDistinct on both sides — robust to a shingle repeating
    within a document and to seed collisions on one bit).

    One-sided error: a flagged shingle may be a false positive (rate
    ≈ (1 − e^{−k·n/m})^k), never a false negative — the flagged doc
    set is a SUPERSET of the exact tier's and ``n_overlap`` an upper
    bound; the standard composition re-checks survivors with the
    exact tier confined to the flagged sliver. (Spark's own
    bloom_filter_agg/might_contain pair is optimizer-internal, not a
    user routine — the runtime-injected variant is pinned separately
    in tests/test_plans.py; this operator makes the same idea an
    explicit, engine-portable plan.) Rows-only entry (no DuckDB
    twin); superset + upper-bound properties are pytest-pinned
    against the exact tier."""
    def probe_bits(col: str):
        return F.array(
            *[
                F.pmod(F.xxhash64(F.col(col), F.lit(i)), F.lit(num_bits))
                for i in range(k_hashes)
            ]
        )

    bench_sh = exploded_shingles(benchmark, n, id_col).select("shingle").distinct()
    bitset = bench_sh.select(F.explode(probe_bits("shingle")).alias("bit")).distinct()
    train_sh = exploded_shingles(train, n, id_col)
    # distinct matched bits vs distinct probe bits: robust both to a
    # shingle repeating within a doc (duplicate probe rows) and to two
    # seeds mapping one shingle onto the same bit
    pb = F.array_distinct(probe_bits("shingle"))
    probes = train_sh.select(
        "doc_id",
        "shingle",
        F.size(pb).alias("n_bits"),
        F.explode(pb).alias("bit"),
    )
    flagged = (
        probes.join(F.broadcast(bitset), "bit")
        .groupBy("doc_id", "shingle")
        .agg(
            F.countDistinct("bit").alias("n_hit"),
            F.max("n_bits").alias("n_bits"),
        )
        .where(F.col("n_hit") == F.col("n_bits"))
    )
    return flagged.groupBy("doc_id").agg(
        F.countDistinct("shingle").alias("n_overlap")
    )


def epoch_repeat(
    docs: DataFrame,
    weights: dict[str, float],
    default_weight: float = 1.0,
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Repeat-factor (multi-epoch) upsampling — the mixture-building
    primitive that materializes "source S is seen w× per training
    epoch" (Gopher/LLaMA-style data recipes quote exactly these
    factors). A doc gets ``floor(w)`` copies plus one more iff its
    deterministic md5 draw falls under ``frac(w)``, so expected copies
    = w per doc and the realized sample is exactly reproducible (a doc
    never flips when other docs arrive — same stability contract as
    train_test_split).

    Scale: map-side expression + row-expanding explode, NO shuffle;
    output size is Σ w_s·|S| by construction. Weights are quantized to
    millionths so the fractional draw compares integer-to-integer.
    The ``n_copies > 0`` filter runs BEFORE the sequence (Spark's
    ``sequence(1, 0)`` is a descending 2-element sequence, not empty).
    """
    base: Column | None = None
    thresh: Column | None = None
    weight: Column | None = None
    for src, w in weights.items():
        b, t = int(w), int(round((w - int(w)) * 1_000_000))
        cond = F.col(source_col) == src
        base = F.when(cond, b) if base is None else base.when(cond, b)
        thresh = F.when(cond, t) if thresh is None else thresh.when(cond, t)
        weight = (
            F.when(cond, F.lit(float(w)))
            if weight is None
            else weight.when(cond, F.lit(float(w)))
        )
    d_b, d_t = int(default_weight), int(round((default_weight - int(default_weight)) * 1_000_000))
    base = base.otherwise(d_b)
    thresh = thresh.otherwise(d_t)
    weight = weight.otherwise(F.lit(float(default_weight)))
    u = F.pmod(md5_hash60(F.col(id_col).cast("string"), seed=41), F.lit(1_000_000))
    n_copies = (base + F.when(u < thresh, 1).otherwise(0)).cast("int")
    return (
        docs.select(
            F.col(id_col),
            F.col(source_col),
            weight.alias("weight"),
            n_copies.alias("n_copies"),
        )
        .where(F.col("n_copies") > 0)
        .select(
            "*",
            F.explode(F.expr("sequence(1, n_copies)")).alias("copy_id"),
        )
    )


# ---------------------------------------------------------------------
# DoReMi-style domain reweighting (Xie et al. 2023, arXiv:2305.10429)
# — multiplicative-weights rounds over per-source proxy losses
# ---------------------------------------------------------------------

DOREMI_ROUNDS = 8
DOREMI_W_SCALE = 10**9       # weight fixed-point: 1.0 == 1e9
DOREMI_ETA_NUM = DOREMI_W_SCALE // 2   # eta = 0.5 at full clamp
DOREMI_LOSS_SCALE = 10**6    # loss fixed-point units
DOREMI_EXCESS_CLAMP = 4 * DOREMI_LOSS_SCALE  # excess clamped to ±4.0


def _tdiv(a: int, b: int) -> int:
    """Trunc-toward-zero integer division (b > 0) — the exact Python
    twin of the oracle's ``CASE WHEN a >= 0 THEN a // b ELSE
    -((-a) // b) END`` idiom (Python ``//`` floors, which differs on
    negative numerators)."""
    return a // b if a >= 0 else -((-a) // b)


def doremi_weights(
    losses: list[tuple[str, int]],
    n_rounds: int = DOREMI_ROUNDS,
    w_scale: int = DOREMI_W_SCALE,
    eta_num: int = DOREMI_ETA_NUM,
    clamp: int = DOREMI_EXCESS_CLAMP,
) -> dict[str, int]:
    """The multiplicative-weights core of DoReMi domain reweighting
    (Xie et al. 2023): given per-domain fixed-point proxy losses,
    run ``n_rounds`` of the Hedge/Group-DRO update

        excess_d = clamp(loss_d − weighted_mean_loss, ±clamp)
        w_d     ← w_d · (1 + η · excess_d / clamp)   (trunc fixed-point)
        w       ← w / Σw                             (re-normalize)

    entirely in exact integer arithmetic (the pagerank/perceptron/
    logreg/kmeans fixed-point family), so the DuckDB unrolled-CTE twin
    replays every round bit-for-bit. Domains whose proxy loss exceeds
    the current mixture-weighted mean gain weight — the Group-DRO
    "upweight the domain the proxy is worst on" step, with the
    published algorithm's per-round normalization. The proxy-loss
    REGRESSION under reweighting (DoReMi retrains the proxy each
    round) is deliberately out of scope: losses here are the static
    scores of the already-trained in-engine proxy (the NB quality
    model), i.e. one DoReMi outer step — the part that is a data-
    pipeline operator rather than a training loop.

    Pure driver arithmetic over |domains| values (vocabulary-bounded
    — the kmeans-q8 centroid-loop contract); the corpus-sized work
    (per-domain loss aggregation) stays distributed in the caller."""
    k = len(losses)
    if k == 0:
        return {}
    w = {src: w_scale // k for src, _ in losses}
    loss = dict(losses)
    for _ in range(n_rounds):
        tot_w = sum(w.values())
        wmean = _tdiv(sum(w[s] * loss[s] for s in w), tot_w)
        for s in w:
            exc = min(max(loss[s] - wmean, -clamp), clamp)
            factor = w_scale + _tdiv(eta_num * exc, clamp)
            w[s] = (w[s] * factor) // w_scale
        tot = sum(w.values())
        w = {s: (w[s] * w_scale) // tot for s in w}
    return w
