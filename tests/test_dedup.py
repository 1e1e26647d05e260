"""Dedup-tier property tests: LSH recall vs exact ground truth,
SimHash banding losslessness."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigquery_postgres_events_etl_spark.io import load_table
from bigquery_postgres_events_etl_spark.operators.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_pairs,
)


def test_minhash_lsh_recall_on_near_dups(spark, sf_dir):
    """MinHash-LSH candidates must cover the high-Jaccard ground-truth
    pairs (16 hashes, 8 bands × 2 rows → ~J² per-band hit rate; for
    J ≥ 0.8 the 8-band miss probability is (1−J²)⁸ < 0.02%)."""
    docs = load_table(spark, sf_dir, "documents")
    truth = {
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(docs, threshold=0.8).collect()
    }
    if not truth:
        truth = {
            (r.doc_a, r.doc_b)
            for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
        }
    candidates = {
        (r.doc_a, r.doc_b) for r in minhash_lsh_pairs(docs).collect()
    }
    assert truth, "fixture should contain near-duplicate documents"
    recall = len(truth & candidates) / len(truth)
    assert recall >= 0.9, f"LSH recall {recall} below 0.9 (missed {truth - candidates})"


def test_simhash_banding_is_lossless(spark, sf_dir):
    """The pigeonhole-banded Hamming-≤3 pairs equal brute force."""
    docs = load_table(spark, sf_dir, "documents").limit(200)
    banded = {
        (r.doc_a, r.doc_b) for r in simhash_near_pairs(docs, max_hamming=3).collect()
    }
    sig = simhash(docs)
    a = sig.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sa"))
    b = sig.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sb"))
    brute = {
        (r.doc_a, r.doc_b)
        for r in a.join(b, F.col("doc_a") < F.col("doc_b"))
        .where(F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))) <= 3)
        .collect()
    }
    assert banded == brute


def test_exact_dedup_total_preserved(spark, sf_dir):
    """Sum of n_copies equals the corpus size (nothing lost)."""
    from bigquery_postgres_events_etl_spark.operators.dedup import exact_dedup

    docs = load_table(spark, sf_dir, "documents")
    agg = exact_dedup(docs).agg(F.sum("n_copies")).first()[0]
    assert agg == docs.count()


def test_jaccard_hot_shingle_filter_is_candidate_superset_logic(spark, sf_dir):
    """With a generous df cap the filtered run equals exact; with an
    aggressive cap it returns a subset (candidate-generator mode)."""
    docs = load_table(spark, sf_dir, "documents")
    exact = {(r.doc_a, r.doc_b) for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    generous = {
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(docs, threshold=0.5, max_shingle_df=10**6).collect()
    }
    assert generous == exact
    aggressive = {
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(docs, threshold=0.5, max_shingle_df=2).collect()
    }
    assert aggressive <= exact


def test_minhash_lsh_xxhash_tier_same_recall_contract(spark, sf_dir):
    """The xxhash64 production tier must satisfy the same recall bound
    as the md5 oracle tier — different digests, same minhash
    statistics (16 hashes, 8 bands × 2 rows)."""
    docs = load_table(spark, sf_dir, "documents")
    truth = {
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(docs, threshold=0.8).collect()
    } or {
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    fast = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_pairs(docs, hash_fn="xxhash64").collect()
    }
    assert truth
    recall = len(truth & fast) / len(truth)
    assert recall >= 0.9, f"xxhash64 LSH recall {recall} below 0.9"


def test_simhash_occurrence_votes_equal_weighted_votes(spark):
    """The single-shuffle bit-sum formulation (2·Σbit > n over
    occurrences) must equal the count-weighted signed vote over
    distinct tokens — the algebraic identity the refactor relies on,
    pinned on a doc set with heavy token duplication and vote ties."""
    from pyspark.sql import functions as F

    from bigquery_postgres_events_etl_spark.operators.dedup import (
        SIMHASH_BITS,
        simhash,
        with_tokens,
    )

    docs = spark.createDataFrame(
        [
            (1, "a a a b"),          # dominated by one token
            (2, "a b a b"),          # exact tie pressure on shared bits
            (3, "x"),                # single token
            (4, "c c d d e"),        # mixed counts
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.simhash for r in simhash(docs).collect()}

    # reference formulation: distinct-token counts with signed votes
    tok = (
        with_tokens(docs)
        .select("doc_id", F.explode("tokens").alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("md5", F.md5("token"))
        .withColumn("th_lo", F.conv(F.substring("md5", 1, 8), 16, 10).cast("long"))
        .withColumn("th_hi", F.conv(F.substring("md5", 9, 8), 16, 10).cast("long"))
    )

    def _bit(b):
        src, shift = ("th_lo", b) if b < 32 else ("th_hi", b - 32)
        return F.shiftright(src, shift).bitwiseAND(F.lit(1))

    votes = [
        F.sum(F.when(_bit(b) == 1, F.col("cnt")).otherwise(-F.col("cnt"))).alias(f"v{b}")
        for b in range(SIMHASH_BITS)
    ]
    agg = tok.groupBy("doc_id").agg(*votes)
    sim = None
    for b in range(SIMHASH_BITS):
        weight = -(2**63) if b == 63 else 2**b
        bit = F.when(F.col(f"v{b}") > 0, F.lit(weight).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sim = bit if sim is None else sim + bit
    want = {r.doc_id: r.ref for r in agg.select("doc_id", sim.alias("ref")).collect()}
    assert got == want


def test_simhash_fast_tier_matches_md5_tier_on_planted_dups(spark):
    """The xxhash64 production tier must make the same near-dup calls
    as the oracle-checked md5 tier: identical docs → Hamming 0, a
    one-token edit → small Hamming, unrelated docs → no pair. Also
    re-proves banding losslessness under the alternate hash."""
    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    edited = base.replace("lazy", "sleepy", 1)
    other = "completely different content about spark catalyst optimizer internals " * 5
    docs = spark.createDataFrame(
        [(1, base), (2, base), (3, edited), (4, other)],
        "doc_id long, text string",
    )
    for fn in ("md5", "xxhash64"):
        pairs = {
            (r.doc_a, r.doc_b): r.hamming
            for r in simhash_near_pairs(docs, max_hamming=3, hash_fn=fn).collect()
        }
        assert pairs.get((1, 2)) == 0, fn  # identical docs
        assert (1, 4) not in pairs and (2, 4) not in pairs and (3, 4) not in pairs, fn
        sig = simhash(docs, hash_fn=fn)
        a = sig.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sa"))
        b = sig.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sb"))
        brute = {
            (r.doc_a, r.doc_b)
            for r in a.join(b, F.col("doc_a") < F.col("doc_b"))
            .where(F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))) <= 3)
            .collect()
        }
        assert set(pairs) == brute, fn


def test_containment_catches_doc_in_doc_that_jaccard_misses(spark):
    """A short doc fully quoted inside a long one: containment ≈ 1,
    Jaccard far below any near-dup threshold."""
    from bigquery_postgres_events_etl_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    short = "alpha beta gamma delta epsilon zeta"
    filler = " ".join(f"w{i}" for i in range(200))
    docs = spark.createDataFrame(
        [(1, short), (2, filler + " " + short + " " + filler.upper())],
        "doc_id long, text string",
    )
    cont = {
        (r.doc_a, r.doc_b): r.containment
        for r in ngram_containment_pairs(docs, n=3, threshold=0.8).collect()
    }
    assert cont.get((1, 2)) == 1.0          # every shingle of 1 is in 2
    assert (2, 1) not in cont               # asymmetric: 2 is not in 1
    jac = ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()
    assert jac == []                        # jaccard blind to the quote


def test_entity_resolve_recall_and_survivorship(spark, sf_dir):
    """Cross-corpus resolution: (a) policy='all' must cover the
    cross-split subset of the exact-Jaccard ground truth at J >= 0.8
    (same LSH recall bound as the symmetric tier); (b) policy='best'
    keeps exactly one link per right doc — the max-Jaccard one, ties
    to the smallest left id."""
    from bigquery_postgres_events_etl_spark.operators.dedup import entity_resolve

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 3 != 0)
    crawl = docs.where(F.col("doc_id") % 3 == 0)

    # ground truth as (left_id, right_id): exact pairs straddling the
    # split, oriented so the right side is the crawl (% 3 == 0)
    truth_lr = set()
    for r in ngram_jaccard_pairs(docs, threshold=0.8).collect():
        a, b = r.doc_a, r.doc_b
        if (a % 3 == 0) != (b % 3 == 0):
            truth_lr.add((b, a) if a % 3 == 0 else (a, b))

    all_links = {
        (r.left_id, r.right_id)
        for r in entity_resolve(corpus, crawl, threshold=0.5, policy="all").collect()
    }
    assert truth_lr, "fixture should contain cross-split near-duplicates"
    recall = len(truth_lr & all_links) / len(truth_lr)
    assert recall >= 0.9, f"recall {recall}, missed {truth_lr - all_links}"

    rows = entity_resolve(corpus, crawl, threshold=0.5, policy="best").collect()
    rights = [r.right_id for r in rows]
    assert len(rights) == len(set(rights)), "policy='best' must be 1 row per right doc"
    # best row per right_id is argmax(jaccard), tie -> min left_id
    by_right = {}
    for r in entity_resolve(corpus, crawl, threshold=0.5, policy="all").collect():
        key = (-r.jaccard, r.left_id)
        if r.right_id not in by_right or key < by_right[r.right_id]:
            by_right[r.right_id] = key
    want = {(key[1], rid) for rid, key in by_right.items()}
    assert {(r.left_id, r.right_id) for r in rows} == want


def test_minhash_estimate_tracks_exact_jaccard(spark, sf_dir):
    """est = agreements/K must behave like the unbiased estimator it
    is: bounded per-pair error at K=16 (σ = √(J(1−J)/K) ≤ 0.125, so a
    0.35 per-pair ceiling is ~3σ), small mean error over the
    candidate set, and high-J pairs clearly separated from low-J
    ones."""
    from bigquery_postgres_events_etl_spark.io import load_table, parallelize
    from bigquery_postgres_events_etl_spark.operators.dedup import (
        minhash_jaccard_estimate,
    )

    rows = minhash_jaccard_estimate(
        parallelize(load_table(spark, sf_dir, "documents"))
    ).collect()
    assert rows, "LSH found no candidate pairs on the near-dup fixture"
    errs = [abs(r.est_jaccard - r.jaccard) for r in rows]
    assert max(errs) <= 0.35, f"worst per-pair error {max(errs)}"
    assert sum(errs) / len(errs) <= 0.15, f"mean error {sum(errs) / len(errs)}"
    for r in rows:
        assert 0 <= r.n_agree <= 16
        if r.jaccard >= 0.8:
            assert r.est_jaccard >= 0.5, f"high-J pair estimated low: {r}"


def test_hashed_shingle_sliver_matches_string_semantics(spark, sf_dir):
    """r6 verdict item #5: the persisted dedup frames carry 60-bit
    shingle hashes instead of strings. Pin that on the fixture the
    swap is SEMANTICALLY lossless, not just oracle-consistent:

    - zero collisions: |distinct (doc, h)| == |distinct (doc, shingle)|
      (the documented s²/2⁶¹ bound predicts none at this size);
    - MinHash signatures from the hashed sliver are bit-identical to
      signatures from the raw string frame (h60 mod P is the same
      base hash either way);
    - the Jaccard pair output equals a string-equality reference."""
    from bigquery_postgres_events_etl_spark.io import load_table, parallelize
    from bigquery_postgres_events_etl_spark.operators.dedup import (
        distinct_hashed_shingles,
        exploded_shingles,
        ngram_jaccard_pairs,
        signatures_from_shingles,
    )
    from pyspark.sql import functions as F

    docs = parallelize(load_table(spark, sf_dir, "documents"))

    sh_str = exploded_shingles(docs, 3).distinct()
    sh_h = distinct_hashed_shingles(docs, 3)
    assert sh_str.count() == sh_h.count(), "hash collision on the fixture"

    sig_str = {r["doc_id"]: r for r in signatures_from_shingles(sh_str).collect()}
    sig_h = {r["doc_id"]: r for r in signatures_from_shingles(sh_h).collect()}
    assert sig_str.keys() == sig_h.keys()
    for d in sig_str:
        assert tuple(sig_str[d]) == tuple(sig_h[d]), f"signature drift doc {d}"

    # string-equality reference for the pair tier
    sizes = sh_str.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = sh_str.alias("a"), sh_str.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    ref = {
        (r.doc_a, r.doc_b): r.n_common
        for r in common.collect()
    }
    got_rows = ngram_jaccard_pairs(docs, 3, threshold=0.5).collect()
    for r in got_rows:
        assert ref.get((r.doc_a, r.doc_b)) == r.n_common, (
            f"hashed n_common diverges from string reference for "
            f"({r.doc_a}, {r.doc_b})"
        )
    spark.catalog.clearCache()


def test_edit_distance_banded_recall_vs_exact(spark, sf_dir):
    """The composed scale path (SimHash-band candidates → length
    filter → banded Levenshtein) must keep ≥ 0.8 of the exact
    length-blocked entry's pairs on the fixture, and every pair it
    emits must appear in the exact answer with the same distance
    (the blocker can only LOSE pairs, never invent or corrupt one)."""
    from bigquery_postgres_events_etl_spark.registry import all_queries

    qs = all_queries()
    exact = {
        (r.doc_a, r.doc_b): r.edit_distance
        for r in qs["dedup_edit_distance_pairs"](spark, sf_dir).collect()
    }
    banded = {
        (r.doc_a, r.doc_b): r.edit_distance
        for r in qs["dedup_edit_distance_banded"](spark, sf_dir).collect()
    }
    assert exact, "fixture has no ≤-K pairs — recall check is vacuous"
    for pair, d in banded.items():
        assert exact.get(pair) == d, f"banded invented/corrupted {pair}"
    recall = len(banded) / len(exact)
    assert recall >= 0.8, f"banded recall {recall:.2f} < 0.8 ({len(banded)}/{len(exact)})"
    spark.catalog.clearCache()


def test_exact_substring_removal_planted_and_tiling(spark):
    """Planted 45-char shared substring: spans cover EXACTLY it in
    both docs, the rewrite cuts it, and untouched docs pass through
    verbatim. Tiling properties: spans ≥ min_len, disjoint with gaps
    (merged), and chars_removed == len(text) - len(clean_text)."""
    from bigquery_postgres_events_etl_spark.operators.dedup import (
        exact_substring_removal,
        exact_substring_spans,
    )

    shared = "S" * 20 + "HARED-REPEATED-SPAN-OF-45" # 45 chars
    assert len(shared) == 45
    # distinct flanking chars on each side in each doc, so the maximal
    # shared substring is exactly the 45 planted chars
    docs = spark.createDataFrame(
        [
            (1, "aaaa-prefix-oneX" + shared + "Y-suffix-one-aaaa"),
            (2, "bbbbbb-other-twoP" + shared + "Q-tail-bbbbbb"),
            (3, "unique document with no repeats at all, left alone"),
        ],
        "doc_id long, text string",
    )
    spans = {
        r.doc_id: (r.span_start, r.span_end)
        for r in exact_substring_spans(docs, min_len=30).collect()
    }
    # one span per planted doc, covering exactly the 45 shared chars
    a0 = docs.collect()
    texts = {r.doc_id: r.text for r in a0}
    for did in (1, 2):
        s, e = spans[did]
        assert texts[did][s - 1 : e - 1] == shared
    assert 3 not in spans
    out = {r.doc_id: r for r in exact_substring_removal(docs, min_len=30).collect()}
    assert out[3].clean_text == texts[3] and out[3].n_spans == 0
    for did in (1, 2):
        assert out[did].n_spans == 1
        assert out[did].chars_removed == 45
        assert out[did].clean_text == texts[did].replace(shared, "")


def test_exact_substring_spans_tile_fixture(spark, sf_dir):
    """Fixture-scale tiling invariants: every span ≥ min_len, spans
    per doc strictly separated (island merge leaves gaps), every
    span's leading window really does repeat in the corpus, and the
    removal complement identity holds for every doc."""
    from bigquery_postgres_events_etl_spark.operators.dedup import (
        exact_substring_removal,
        exact_substring_spans,
    )

    docs = load_table(spark, sf_dir, "documents")
    spans = exact_substring_spans(docs, min_len=30).collect()
    assert spans, "fixture should contain repeated >=30-char substrings"
    by_doc: dict[int, list[tuple[int, int]]] = {}
    for r in spans:
        assert r.span_len >= 30
        assert r.span_end - r.span_start == r.span_len
        by_doc.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    for _, ss in by_doc.items():
        ss.sort()
        for (s1, e1), (s2, _e2) in zip(ss, ss[1:]):
            assert s2 > e1, "merged spans must be separated by a gap"
    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    # each span's leading 30-char window occurs >= 2 times corpus-wide
    from collections import Counter

    win = Counter()
    for t in texts.values():
        for i in range(len(t) - 29):
            win[t[i : i + 30]] += 1
    for r in spans[:200]:
        lead = texts[r.doc_id][r.span_start - 1 : r.span_start + 29]
        assert win[lead] >= 2
    out = exact_substring_removal(docs, min_len=30).collect()
    assert len(out) == len(texts)
    for r in out:
        assert r.chars_removed == len(texts[r.doc_id]) - len(r.clean_text)


def test_substring_keep_first_exempts_earliest_and_is_monotone(spark, sf_dir):
    """Keep-one policy: the earliest doc keeps its copy verbatim, the
    later doc loses it; and corpus-wide the keep-first removable set
    is a subset of remove-all's (chars_removed never larger)."""
    from bigquery_postgres_events_etl_spark.operators.dedup import (
        exact_substring_removal,
    )

    shared = "S" * 20 + "HARED-REPEATED-SPAN-OF-45"
    docs = spark.createDataFrame(
        [
            (1, "aaaa-prefix-oneX" + shared + "Y-suffix-one-aaaa"),
            (2, "bbbbbb-other-twoP" + shared + "Q-tail-bbbbbb"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in exact_substring_removal(docs, min_len=30, keep_first=True).collect()
    }
    texts = {r.doc_id: r.text for r in docs.collect()}
    assert out[1].clean_text == texts[1] and out[1].n_spans == 0  # owner keeps
    assert out[2].n_spans == 1 and out[2].clean_text == texts[2].replace(shared, "")

    fixture = load_table(spark, sf_dir, "documents")
    ka = {
        r.doc_id: r.chars_removed
        for r in exact_substring_removal(fixture, min_len=30).collect()
    }
    kf = {
        r.doc_id: r.chars_removed
        for r in exact_substring_removal(
            fixture, min_len=30, keep_first=True
        ).collect()
    }
    assert set(ka) == set(kf)
    assert all(kf[d] <= ka[d] for d in ka)
    assert sum(kf.values()) < sum(ka.values())  # something was exempted


def test_containment_subsumption_planted_docs(spark):
    """A quoted excerpt (fully contained in a larger doc) is dropped
    in favor of the superset; the superset survives; mutual equals-
    size duplicates keep the smaller id (acyclic drop relation); an
    unrelated doc is untouched."""
    import tempfile

    from bigquery_postgres_events_etl_spark.registry import all_queries

    big = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    excerpt = "beta gamma delta epsilon zeta"     # every trigram in big
    twin = "one two three four five"
    rows = [
        (0, big),
        (1, excerpt),
        (2, twin),
        (3, twin),                                 # equal-size duplicate
        (4, "totally unrelated words here now"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    with tempfile.TemporaryDirectory() as tmp:
        docs.write.parquet(tmp + "/documents.parquet")
        out = {
            r.doc_id: r
            for r in all_queries()["dedup_containment_subsumption"](spark, tmp).collect()
        }
    assert out[0].kept
    assert not out[1].kept and out[1].subsumed_by == 0
    assert out[1].containment == 1.0
    assert out[2].kept                       # smaller id survives the tie
    assert not out[3].kept and out[3].subsumed_by == 2
    assert out[4].kept


def test_lsh_recall_report_consistency(spark, sf_dir):
    """The report's numbers tie out against the standalone entries
    (truth = dedup_ngram_jaccard rows, candidates = dedup_minhash_lsh
    rows) and the banding s-curve delivers ≥0.5 recall at the 0.5
    Jaccard threshold on the fixture."""
    from bigquery_postgres_events_etl_spark.registry import all_queries

    r = all_queries()["dedup_lsh_recall_report"](spark, sf_dir).collect()[0]
    n_true = all_queries()["dedup_ngram_jaccard"](spark, sf_dir).count()
    n_cand = all_queries()["dedup_minhash_lsh"](spark, sf_dir).count()
    assert (r.n_true_pairs, r.n_candidates) == (n_true, n_cand)
    assert r.n_hits <= min(n_true, n_cand)
    assert r.recall == r.n_hits / n_true
    assert r.recall >= 0.5
