"""Semantic invariants for the corpus-shaping operators — the oracle
gate proves Spark and DuckDB agree; these prove the agreed answer
means what it claims."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from bigquery_postgres_events_etl_spark.io import load_table
from bigquery_postgres_events_etl_spark.operators.pipeline import (
    CHUNK_STRIDE,
    CHUNK_WIDTH,
    MIXTURE_DEFAULT_FRACTION,
    MIXTURE_FRACTIONS,
    PACK_BUDGET,
    context_chunks,
    mixture_sample,
    pack_sequences,
    train_test_split,
)


def test_split_is_per_doc_stable(spark, sf_dir):
    """A document's split must not depend on what else is in the
    corpus — recomputing on an arbitrary subset assigns every common
    doc identically (the property rand()-based splits lack)."""
    docs = load_table(spark, sf_dir, "documents")
    full = {r.doc_id: r.split for r in train_test_split(docs).collect()}
    subset = docs.where(F.col("doc_id") % 7 == 3)
    sub = {r.doc_id: r.split for r in train_test_split(subset).collect()}
    assert sub and all(full[d] == s for d, s in sub.items())
    # and the ratio is in the right neighborhood
    n_train = sum(1 for s in full.values() if s == "train")
    assert 0.8 < n_train / len(full) < 0.97


def test_pack_sequences_is_a_gapless_token_stream(spark, sf_dir):
    """Offsets must tile the concatenated stream exactly: sorted by
    start_offset, each doc starts where the previous ended, and the
    bin span matches floor arithmetic on the budget."""
    rows = sorted(
        pack_sequences(load_table(spark, sf_dir, "documents")).collect(),
        key=lambda r: r.start_offset,
    )
    expected = 0
    for r in rows:
        assert r.start_offset == expected
        expected += r.n_tokens
        assert r.first_bin == r.start_offset // PACK_BUDGET
        assert r.last_bin == (r.start_offset + r.n_tokens - 1) // PACK_BUDGET
        assert r.first_bin <= r.last_bin
    assert expected == sum(r.n_tokens for r in rows)


def test_context_chunks_cover_and_reconstruct(spark, sf_dir):
    """Chunk starts step by the stride, the first chunk is the document
    prefix, and stitching chunk heads + the final tail reconstructs
    the exact token sequence (no token lost at any boundary)."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 20)
    texts = {r.doc_id: r.text.split(" ") for r in docs.collect()}
    by_doc: dict[int, list] = {}
    for r in context_chunks(docs).collect():
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(texts)
    for doc_id, chunks in by_doc.items():
        toks = texts[doc_id]
        chunks.sort(key=lambda r: r.chunk_id)
        n_expected = (max(len(toks) - CHUNK_WIDTH, 0) + CHUNK_STRIDE - 1) // CHUNK_STRIDE + 1
        assert len(chunks) == n_expected
        rebuilt: list[str] = []
        for r in chunks:
            assert r.start_token == r.chunk_id * CHUNK_STRIDE + 1
            ctoks = r.chunk_text.split(" ")
            assert ctoks == toks[r.start_token - 1 : r.start_token - 1 + CHUNK_WIDTH]
            rebuilt.extend(ctoks[: CHUNK_STRIDE] if r is not chunks[-1] else ctoks)
        assert rebuilt == toks


def test_mixture_sample_keeps_exact_quotas(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    totals = {r.source: r.n for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    kept = {
        r.source: r.n
        for r in mixture_sample(docs).groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    for src, total in totals.items():
        frac = MIXTURE_FRACTIONS.get(src, MIXTURE_DEFAULT_FRACTION)
        assert kept.get(src, 0) == math.ceil(total * frac), src


def test_mixture_sample_sharded_quota_bounds_and_determinism(spark, sf_dir):
    """The sharded tier must keep, per source, between the exact quota
    and quota + n_shards rows (per-shard ceil rounds up at most once
    per shard), be deterministic across runs, and never emit a doc the
    unsharded hash ordering wouldn't admit under a per-shard prefix."""
    from bigquery_postgres_events_etl_spark.operators.pipeline import (
        mixture_sample_sharded,
    )

    docs = load_table(spark, sf_dir, "documents")
    n_shards = 16
    totals = {
        r.source: r.n
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    out = mixture_sample_sharded(docs, n_shards=n_shards)
    kept = {
        r.source: r.n
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    for src, total in totals.items():
        frac = MIXTURE_FRACTIONS.get(src, MIXTURE_DEFAULT_FRACTION)
        exact = math.ceil(total * frac)
        assert exact <= kept.get(src, 0) <= exact + n_shards, src

    # deterministic: a second evaluation selects the identical doc set
    ids1 = {r.doc_id for r in out.collect()}
    ids2 = {r.doc_id for r in mixture_sample_sharded(docs, n_shards=n_shards).collect()}
    assert ids1 == ids2

    # per-(source, shard) selection is a rank prefix: rn values are
    # exactly 1..k for each group
    by_group: dict[tuple, list] = {}
    for r in out.collect():
        by_group.setdefault((r.source, r.shard), []).append(r.rn)
    for grp, rns in by_group.items():
        assert sorted(rns) == list(range(1, len(rns) + 1)), grp


def test_corpus_prep_full_stage_effects(spark, sf_dir):
    """Each gate in the composed prep provably removes what it should:
    survivors contain no blocklisted term, no duplicate text (beyond
    the canonical survivor), no benchmark doc, and per-split totals
    equal the sum over survivors."""
    from pyspark.sql import functions as F

    from bigquery_postgres_events_etl_spark.io import load_table
    from bigquery_postgres_events_etl_spark.operators.dedup import exact_dedup
    from bigquery_postgres_events_etl_spark.operators.pipeline import (
        blocklist_filter,
        quality_threshold_filter,
        train_test_split,
    )
    from bigquery_postgres_events_etl_spark.operators.queries_pipeline import (
        FULL_PREP_BLOCKLIST,
        pipeline_corpus_prep_full,
    )

    out = {r.split: r for r in pipeline_corpus_prep_full(spark, sf_dir).collect()}
    assert out and all(r.n_docs > 0 for r in out.values())

    # reconstruct the survivor set independently and check the budgets
    docs = load_table(spark, sf_dir, "documents")
    ok = blocklist_filter(docs, FULL_PREP_BLOCKLIST).where(F.col("kept")).select("doc_id")
    kept = quality_threshold_filter(docs).select("doc_id")
    canon = exact_dedup(docs).select("doc_id")
    surv = (
        docs.where(F.col("doc_id") % 97 != 0)
        .join(ok, "doc_id", "left_semi")
        .join(kept, "doc_id", "left_semi")
        .join(canon, "doc_id", "left_semi")
    )
    # survivors never contain a blocklisted token
    assert (
        surv.where(
            F.arrays_overlap(
                F.split("text", " "),
                F.array(*[F.lit(t) for t in FULL_PREP_BLOCKLIST]),
            )
        ).count()
        == 0
    )
    # no benchmark doc (doc_id % 97 == 0) survives
    assert surv.where(F.col("doc_id") % 97 == 0).count() == 0
    # totals from the entry are bounded by the pre-decontamination set
    split = train_test_split(surv).select("doc_id", "split")
    pre = {
        r.split: r.n
        for r in surv.join(split, "doc_id").groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    for s, r in out.items():
        assert r.n_docs <= pre.get(s, 0)


def test_cdc_chunks_resynchronize_after_edit(spark):
    """The CDC selling point vs fixed-width chunking: prepending
    tokens to a document shifts only the chunks before the first
    surviving boundary — every chunk after it is byte-identical, so
    chunk-level dedup keeps matching downstream content."""
    from bigquery_postgres_events_etl_spark.operators.pipeline import cdc_chunks

    base = " ".join(f"w{i * 7919 % 1000}" for i in range(400))
    edited = "NEW TOKENS INSERTED " + base
    docs = spark.createDataFrame(
        [(1, base), (2, edited)], "doc_id BIGINT, text STRING"
    )
    chunks = cdc_chunks(docs).collect()
    c1 = [r.chunk_text for r in sorted(
        (r for r in chunks if r.doc_id == 1), key=lambda r: r.chunk_id)]
    c2 = [r.chunk_text for r in sorted(
        (r for r in chunks if r.doc_id == 2), key=lambda r: r.chunk_id)]
    shared = set(c1) & set(c2)
    # all of doc 1's chunks except (at most) its first must reappear
    # identically in the edited doc
    assert set(c1[1:]) <= shared
    assert len(shared) >= len(c1) - 1 > 5


def test_cdc_chunks_partition_and_cover(spark, sf_dir):
    """Chunks tile each document exactly: concatenating a doc's
    chunks in chunk_id order reproduces the document; token counts
    sum to the doc's token count; no empty chunks; short docs (< gram)
    come through as one whole-doc chunk."""
    from bigquery_postgres_events_etl_spark.operators.pipeline import cdc_chunks

    docs = load_table(spark, sf_dir, "documents").limit(300).union(
        spark.createDataFrame(
            [(900001, "one"), (900002, "two tokens"), (900003, "a b c")],
            "doc_id BIGINT, text STRING",
        ).selectExpr(
            "doc_id", "text", "CAST(NULL AS STRING) lang",
            "CAST(NULL AS STRING) source", "CAST(length(text) AS BIGINT) n_chars"
        )
    )
    out = cdc_chunks(docs)
    assert out.where((F.col("n_tokens") <= 0)).count() == 0
    rebuilt = (
        out.groupBy("doc_id")
        .agg(
            F.concat_ws(
                " ", F.array_sort(F.collect_list(F.struct("chunk_id", "chunk_text")))
                .getField("chunk_text")
            ).alias("rebuilt"),
            F.sum("n_tokens").alias("n_tok"),
        )
    )
    joined = docs.select("doc_id", "text").join(rebuilt, "doc_id")
    bad = joined.where(F.col("rebuilt") != F.col("text")).count()
    assert bad == 0
    mism = joined.join(
        docs.selectExpr("doc_id", "size(split(text, ' ')) AS want"), "doc_id"
    ).where(F.col("n_tok") != F.col("want")).count()
    assert mism == 0
    # the 3 planted short docs are single whole-doc chunks
    short = out.where(F.col("doc_id") >= 900001).collect()
    assert sorted((r.doc_id, r.chunk_id, r.chunk_text) for r in short) == [
        (900001, 0, "one"), (900002, 0, "two tokens"), (900003, 0, "a b c")
    ]


def test_cdc_chunks_tile_arbitrary_docs_hypothesis(spark):
    """Property: for ANY token sequence, CDC chunks tile the document
    exactly (rebuild == original, token counts sum, chunk ids dense
    from 0, no empty chunk). Randomized docs catch boundary cases the
    fixture can't (all-identical tokens → every gram equal, single
    token, gram-length docs)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from bigquery_postgres_events_etl_spark.operators.pipeline import cdc_chunks

    token = st.text(alphabet="abc", min_size=1, max_size=3)

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(st.lists(st.lists(token, min_size=1, max_size=60), min_size=1, max_size=6))
    def run(docs_tokens):
        rows = [(i, " ".join(toks)) for i, toks in enumerate(docs_tokens)]
        docs = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
        out = cdc_chunks(docs).collect()
        by_doc = {}
        for r in out:
            assert r.n_tokens >= 1
            by_doc.setdefault(r.doc_id, []).append(r)
        assert set(by_doc) == set(range(len(rows)))
        for i, toks in enumerate(docs_tokens):
            chunks = sorted(by_doc[i], key=lambda r: r.chunk_id)
            assert [c.chunk_id for c in chunks] == list(range(len(chunks)))
            assert " ".join(c.chunk_text for c in chunks) == " ".join(toks)
            assert sum(c.n_tokens for c in chunks) == len(toks)
            # start offsets are the running token count
            starts = [c.start_token for c in chunks]
            want = [1]
            for c in chunks[:-1]:
                want.append(want[-1] + c.n_tokens)
            assert starts == want

    run()


def test_importance_weight_favors_target_distribution(spark, sf_dir):
    """Docs FROM the target sources must average higher importance
    than the rest (their grams are target grams by construction), and
    a doc with no gram overlap with the target scores exactly 0."""
    from bigquery_postgres_events_etl_spark.operators.pipeline import (
        importance_weight,
    )

    docs = load_table(spark, sf_dir, "documents")
    out = importance_weight(docs).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    rows = out.collect()
    t = [r.importance for r in rows if r.source in ("src0", "src1")]
    o = [r.importance for r in rows if r.source not in ("src0", "src1")]
    assert t and o
    assert sum(t) / len(t) > sum(o) / len(o)
    assert all(0.0 <= r.importance <= 1.0 for r in rows)

    # planted out-of-distribution doc: zero target overlap → 0.0
    extra = docs.unionByName(
        spark.createDataFrame(
            [(990001, "zz1 zz2 zz3 zz4 zz5 zz6", "srcX", 23)],
            "doc_id BIGINT, text STRING, source STRING, n_chars BIGINT",
        ).selectExpr("doc_id", "text", "CAST(NULL AS STRING) lang", "source", "n_chars")
        .select("doc_id", "text", "lang", "source", "n_chars")
    )
    ood = {r.doc_id: r.importance for r in importance_weight(extra).collect()}
    assert ood[990001] == 0.0


def test_bloom_decontaminate_is_superset_of_exact(spark, sf_dir):
    """One-sided error: the Bloom tier may over-flag (false positive)
    but can NEVER miss a truly contaminated doc, and its n_overlap is
    an upper bound on the exact tier's per doc — the properties the
    re-check composition (exact tier confined to the flagged sliver)
    relies on. Also bounds the over-flagging: at 2^20 bits / 3 hashes
    on a fixture-sized suite the FP rate is ~0, so the two tiers
    should in fact coincide here."""
    from bigquery_postgres_events_etl_spark.operators.pipeline import (
        decontaminate,
        decontaminate_bloom,
    )

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 97 == 0)
    train = docs.where(F.col("doc_id") % 97 != 0)
    exact = {r.doc_id: r.n_overlap for r in decontaminate(train, bench, n=3).collect()}
    bloom = {
        r.doc_id: r.n_overlap
        for r in decontaminate_bloom(train, bench, n=3).collect()
    }
    assert set(exact) <= set(bloom), "bloom tier missed a contaminated doc"
    for doc_id, n_exact in exact.items():
        assert bloom[doc_id] >= n_exact, "bloom n_overlap must be an upper bound"
    # 2^20 bits vs a few hundred set bits → FP probability ~1e-16 per
    # probe: any extra flagged doc here means a broken hash layout
    assert set(bloom) == set(exact)
    # degenerate-parameter sanity: with a tiny bitset every probe
    # collides and everything is flagged — the config knob really is
    # the error dial
    tiny = decontaminate_bloom(train, bench, n=3, num_bits=4).count()
    assert tiny >= len(exact)


def test_weighted_sample_prefers_heavy_docs(spark, sf_dir):
    """Efraimidis–Spirakis keys must produce a weight-biased sample:
    the selected docs' mean weight exceeds the corpus mean, selection
    is deterministic across repeated builds, and exactly k rows come
    back. Inclusion is also partitioning-invariant (keys depend only
    on the row), checked by recomputing on a repartitioned corpus."""
    from bigquery_postgres_events_etl_spark.operators.pipeline import weighted_sample

    docs = load_table(spark, sf_dir, "documents")
    k = 100
    picked = weighted_sample(docs, k=k).collect()
    assert len(picked) == k
    corpus_mean = docs.agg(F.avg("n_chars")).first()[0]
    sample_mean = sum(r.n_chars for r in picked) / k
    assert sample_mean > corpus_mean, (
        f"weighted sample mean {sample_mean} not above corpus mean {corpus_mean}"
    )
    again = weighted_sample(docs.repartition(7), k=k).collect()
    assert {r.doc_id for r in picked} == {r.doc_id for r in again}


def test_token_waterfill_invariants(spark, sf_dir):
    """Waterfilling contract, pinned independently of the oracle:
    the allocation exhausts the budget EXACTLY (integer arithmetic,
    no float level), never over-drains a source, marks saturation
    consistently, and levels the unsaturated sources to within one
    token of each other."""
    from bigquery_postgres_events_etl_spark.operators.queries_pipeline import (
        WATERFILL_BUDGET_DEN,
        WATERFILL_BUDGET_NUM,
    )
    from bigquery_postgres_events_etl_spark.registry import all_queries

    rows = all_queries()["pipeline_token_waterfill"](spark, sf_dir).collect()
    total = sum(r.capacity for r in rows)
    budget = (total * WATERFILL_BUDGET_NUM) // WATERFILL_BUDGET_DEN
    assert sum(r.allocated for r in rows) == budget
    for r in rows:
        assert 0 <= r.allocated <= r.capacity
        assert r.saturated == (r.allocated == r.capacity)
    unsat = [r.allocated for r in rows if not r.saturated]
    assert unsat, "degenerate: everything saturated"
    assert any(r.saturated for r in rows), "degenerate: nothing saturated"
    assert max(unsat) - min(unsat) <= 1, "unsaturated sources not level"
    # every saturated capacity sits at or below the unsaturated level
    # (the waterline property)
    sat_caps = [r.capacity for r in rows if r.saturated]
    assert max(sat_caps) <= min(unsat) + 1


def test_token_waterfill_property_vs_python_reference(spark):
    """Property: for ANY capacity table, the distributed waterfill
    equals a direct pure-Python waterfill — budget exhausted exactly,
    per-source allocations identical (including the deterministic
    remainder deal-out to the smallest unsaturated sources)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from bigquery_postgres_events_etl_spark.operators.queries_pipeline import (
        token_waterfill,
    )

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        st.lists(st.integers(min_value=1, max_value=1000), min_size=1, max_size=12),
        st.integers(min_value=0, max_value=10),  # budget numerator (den 10)
    )
    def run(caps, num):
        names = [f"s{i}" for i in range(len(caps))]
        df = spark.createDataFrame(
            list(zip(names, caps)), "source string, cap long"
        )
        got = {
            r.source: (r.allocated, r.saturated)
            for r in token_waterfill(df, budget_num=num, budget_den=10).collect()
        }
        # pure-Python reference: saturate in (cap, name) order while
        # P_k + (n-k)*t_k <= B, then deal base + remainder
        total = sum(caps)
        budget = (total * num) // 10
        order = sorted(zip(caps, names))
        n = len(order)
        pk, kstar, p_kstar = 0, 0, 0
        for i, (t, _) in enumerate(order, start=1):
            pk += t
            if pk + (n - i) * t <= budget:
                kstar, p_kstar = i, pk
        want = {}
        if n > kstar:
            base = (budget - p_kstar) // (n - kstar)
            rem = (budget - p_kstar) % (n - kstar)
        for i, (t, name) in enumerate(order, start=1):
            if i <= kstar:
                want[name] = (t, True)
            else:
                want[name] = (base + (1 if i - kstar <= rem else 0), False)
        assert got == want
        assert sum(a for a, _ in got.values()) == budget

    run()


def test_split_leakage_planted_cross_boundary_pair(spark):
    """A verbatim duplicate planted across the split boundary is
    reported oriented (train, test); the same duplicate within one
    side is NOT reported; an unrelated doc never appears.
    doc_ids chosen by the split hash: md5-h60(id) % 100 < 90 → train
    (1 is train, 0 is test)."""
    from bigquery_postgres_events_etl_spark.operators.pipeline import (
        split_leakage,
        train_test_split,
    )

    dup = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [
            (0, dup),          # test side
            (1, dup),          # train side — leaks against 0
            (2, dup),          # train side — pairs with 1 SAME side
            (3, "totally different words here nothing shared at all"),
        ],
        "doc_id long, text string",
    )
    spl = {r.doc_id: r.split for r in train_test_split(docs).collect()}
    assert spl[0] == "test" and spl[1] == "train" and spl[2] == "train"

    got = {
        (r.train_doc_id, r.test_doc_id)
        for r in split_leakage(docs, threshold=0.9).collect()
    }
    assert got == {(1, 0), (2, 0)}  # both train copies leak against 0


def test_rendezvous_sharding_minimal_disruption(spark):
    """The HRW property plain modulo lacks: growing 8 shards to 9
    moves ONLY the docs whose new shard-8 weight wins — ~1/9 of keys
    in expectation, and NO doc moves between two OLD shards."""
    from bigquery_postgres_events_etl_spark.operators.dedup import md5_hash60
    from pyspark.sql import Window, functions as F

    docs = spark.range(500).select(F.col("id").alias("doc_id"))

    def assign(n_shards):
        shards = spark.range(n_shards).select(
            F.col("id").cast("int").alias("shard")
        )
        w = docs.crossJoin(F.broadcast(shards)).select(
            "doc_id",
            "shard",
            md5_hash60(
                F.concat_ws("#", F.col("doc_id").cast("string"), F.col("shard"))
            ).alias("weight"),
        )
        wr = Window.partitionBy("doc_id").orderBy(
            F.col("weight").desc(), F.col("shard")
        )
        return {
            r.doc_id: r.shard
            for r in w.withColumn("rn", F.row_number().over(wr))
            .where(F.col("rn") == 1)
            .collect()
        }

    a8, a9 = assign(8), assign(9)
    moved = {d for d in a8 if a8[d] != a9[d]}
    # every move lands on the NEW shard — old shards never trade keys
    assert all(a9[d] == 8 for d in moved)
    # expected move fraction 1/9 ≈ 11%; allow generous slack
    assert 0.03 <= len(moved) / 500 <= 0.25


def test_token_waterfill_budget_at_and_above_capacity(spark):
    """The all-saturated edge (r11 verdict item 1): budget == total
    capacity and budget > total capacity both make kstar == n, so the
    base/extra divisors hit n - kstar == 0 — the nullif guard must
    keep the query NULL-safe (ANSI-proof) and every source simply
    saturates at its capacity."""
    from bigquery_postgres_events_etl_spark.operators.queries_pipeline import (
        token_waterfill,
    )

    caps = [("a", 10), ("b", 25), ("c", 5)]
    df = spark.createDataFrame(caps, "source string, cap long")
    for num, den in ((10, 10), (15, 10), (100, 1)):
        rows = token_waterfill(df, budget_num=num, budget_den=den).collect()
        assert len(rows) == 3
        for r in rows:
            assert r.saturated is True
            assert r.allocated == r.capacity


def test_curriculum_order_stage_and_interleave_properties(spark, tmp_path):
    """Curriculum schedule invariants: (a) train_order is a
    permutation of 1..N; (b) stages are length-monotone (every doc in
    stage s is no longer than any doc in stage s+1); (c) within a
    stage the sources alternate round-robin — the first |sources|
    positions of a stage cover every source present in it."""
    from bigquery_postgres_events_etl_spark.registry import all_queries

    rows = [
        (i, f"src{i % 3}", "en", 10 * (i + 1), "x " * (i + 1))
        for i in range(24)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, source string, lang string, n_chars long, text string"
    )
    df.write.parquet(str(tmp_path / "documents.parquet"))
    out = sorted(
        all_queries()["pipeline_curriculum_order"](spark, str(tmp_path)).collect(),
        key=lambda r: r.train_order,
    )
    assert [r.train_order for r in out] == list(range(1, 25))
    # stage monotone in length
    for a, b in zip(out, out[1:]):
        assert a.stage <= b.stage
    by_stage = {}
    for r in out:
        by_stage.setdefault(r.stage, []).append(r)
    assert len(by_stage) == 4 and all(len(v) == 6 for v in by_stage.values())
    for s, docs in by_stage.items():
        lengths = [d.n_chars for d in docs]
        assert max(lengths) <= min(
            [d.n_chars for ss, dd in by_stage.items() if ss > s for d in dd],
            default=max(lengths),
        )
        # first 3 positions of each stage cover all 3 sources
        assert {d.source for d in docs[:3]} == {"src0", "src1", "src2"}


def test_doremi_weights_pure_properties():
    """The MW core: uniform losses stay uniform; the worst domain
    gains weight vs uniform (the Group-DRO upweighting DoReMi exists
    for); weights re-normalize to ~1.0 each round; order-insensitive
    in the input list."""
    from bigquery_postgres_events_etl_spark.operators.pipeline import (
        DOREMI_W_SCALE,
        doremi_weights,
    )

    S = DOREMI_W_SCALE
    # uniform losses: every round's excess is 0, weights stay at S//k
    w = doremi_weights([("a", 7_000_000), ("b", 7_000_000), ("c", 7_000_000)])
    assert len(set(w.values())) == 1
    # heterogeneous: worst-loss domain ends strictly above uniform,
    # best strictly below
    losses = [("low", 1_700_000), ("mid", 2_500_000), ("high", 2_800_000)]
    w = doremi_weights(losses)
    uniform = S // 3
    assert w["high"] > uniform > w["low"]
    assert max(w, key=w.get) == "high" and min(w, key=w.get) == "low"
    # normalization: sum within k truncation units of S
    assert S - 3 <= sum(w.values()) <= S
    # input order cannot matter (the oracle's GROUP BY has no order)
    assert doremi_weights(list(reversed(losses))) == w
    # empty domain set degrades to empty, not a crash
    assert doremi_weights([]) == {}


def test_doremi_entry_upweights_worst_source(spark, sf_dir):
    """End-to-end: the registered entry's weight_fp column must rank
    sources identically to their loss_fp (static-loss MW is monotone:
    higher proxy loss -> higher final weight), sum to ~1e9, and the
    worst source must beat uniform."""
    from bigquery_postgres_events_etl_spark.operators.pipeline import (
        DOREMI_W_SCALE,
    )
    from bigquery_postgres_events_etl_spark.registry import all_queries

    rows = all_queries()["pipeline_doremi_weights"](spark, sf_dir).collect()
    assert rows
    k = len(rows)
    by_loss = sorted(rows, key=lambda r: (r.loss_fp, r.source))
    by_weight = sorted(rows, key=lambda r: (r.weight_fp, r.source))
    assert [r.source for r in by_loss] == [r.source for r in by_weight]
    total = sum(r.weight_fp for r in rows)
    assert DOREMI_W_SCALE - 8 * k <= total <= DOREMI_W_SCALE
    worst = max(rows, key=lambda r: r.loss_fp)
    if len({r.loss_fp for r in rows}) > 1:
        assert worst.weight_fp > DOREMI_W_SCALE // k


def test_learnability_select_quadrant(spark, sf_dir):
    """Invariants of the clean-but-hard selection: selected docs are
    exactly the top-half-by-ce of the top-half-by-nb candidate pool;
    never-candidates (bottom nb half or no bigrams) have NULL ce_rank
    and selected False; nb_rank is a 1..N permutation."""
    from bigquery_postgres_events_etl_spark.registry import all_queries

    rows = all_queries()["pipeline_learnability_select"](spark, sf_dir).collect()
    n = len(rows)
    assert sorted(r.nb_rank for r in rows) == list(range(1, n + 1))
    cand = [r for r in rows if r.ce_rank is not None]
    m = len(cand)
    assert all(2 * r.nb_rank <= n + 1 for r in cand)
    assert sorted(r.ce_rank for r in cand) == list(range(1, m + 1))
    for r in rows:
        if r.ce_rank is None:
            assert r.selected is False
        else:
            assert r.selected == (2 * r.ce_rank <= m + 1)
    assert 0 < sum(r.selected for r in rows) <= (n + 1) // 2


def test_learnability_select_planted(spark, tmp_path):
    """Planted quadrant: among equally-clean docs (same curated
    vocabulary), the one with an off-model bigram ORDER (higher
    cross-entropy under the curated bigram LM) must rank harder and
    be selected ahead of the fluent one."""
    from bigquery_postgres_events_etl_spark.registry import all_queries

    curated = [
        (i, "src0", "en", 30, "the quick brown fox jumps over dog")
        for i in range(10)
    ]
    # same tokens, scrambled order -> same NB score class, higher ce
    hard = [(100, "src0", "en", 30, "dog over jumps fox brown quick the")]
    # a non-curated class so the NB prior/count denominators are
    # non-degenerate, with disjoint vocabulary so it ranks dirtier
    noise = [
        (200 + i, "src5", "en", 30, "zz yy xx ww vv uu tt")
        for i in range(11)
    ]
    rows = curated + hard + noise
    spark.createDataFrame(
        rows, "doc_id long, source string, lang string, n_chars long, text string"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    out = {
        r.doc_id: r
        for r in all_queries()["pipeline_learnability_select"](
            spark, str(tmp_path)
        ).collect()
    }
    cand = [r for r in out.values() if r.ce_rank is not None]
    if cand:
        hardest = min(cand, key=lambda r: r.ce_rank)
        # the scrambled doc is the hardest candidate when it makes the
        # clean pool (NB scores tie up to prior; doc_id breaks ties)
        if 100 in {r.doc_id for r in cand}:
            assert hardest.doc_id == 100
            assert out[100].selected
