"""Semantic invariants for the repetition / quality-rule /
decontamination / semantic-dedup operators — the oracle gate proves
Spark and DuckDB agree; these prove the agreed answer means what it
claims, on inputs constructed to hit each rule."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigquery_postgres_events_etl_spark.operators.pipeline import decontaminate
from bigquery_postgres_events_etl_spark.operators.similarity import semantic_dedup
from bigquery_postgres_events_etl_spark.operators.text import (
    GOPHER_MIN_TOKENS,
    gopher_rules,
    repetition_stats,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_repetition_stats_known_values(spark):
    # "a a a a": 4 tokens (3 repeats), bigrams = [a a] x3 -> top = dup = 1.0
    # "w x y z": no repetition at all
    df = repetition_stats(_docs(spark, ["a a a a", "w x y z"]))
    rows = {r.doc_id: r for r in df.collect()}
    r0, r1 = rows[0], rows[1]
    assert r0.n_tokens == 4 and abs(r0.dup_token_frac - 0.75) < 1e-12
    assert r0.n_bigrams == 3
    assert r0.top_bigram_frac == 1.0 and r0.dup_bigram_frac == 1.0
    assert r1.dup_token_frac == 0.0
    assert r1.top_bigram_frac - 1.0 / 3.0 < 1e-12 and r1.dup_bigram_frac == 0.0


def test_repetition_fractions_bounded(spark, sf_dir):
    from bigquery_postgres_events_etl_spark.io import load_table

    df = repetition_stats(load_table(spark, sf_dir, "documents"))
    bad = df.where(
        (F.col("dup_token_frac") < 0) | (F.col("dup_token_frac") > 1)
        | (F.col("top_bigram_frac") <= 0) | (F.col("top_bigram_frac") > 1)
        | (F.col("dup_bigram_frac") < 0) | (F.col("dup_bigram_frac") > 1)
        | (F.col("dup_bigram_frac") > 1e-12)
        & (F.col("top_bigram_frac") > F.col("dup_bigram_frac"))
    ).count()
    assert bad == 0  # top-bigram share can never exceed the dup share when dups exist


def test_gopher_rules_each_rule_rejects(spark):
    long_ok = " ".join(["the", "and"] + ["token"] * GOPHER_MIN_TOKENS)
    too_short = "the and token"
    tiny_words = " ".join(["a"] * (GOPHER_MIN_TOKENS + 2))  # mean len 1 < 3
    no_stopwords = " ".join(["token"] * (GOPHER_MIN_TOKENS + 2))
    df = gopher_rules(_docs(spark, [long_ok, too_short, tiny_words, no_stopwords]))
    rows = {r.doc_id: r for r in df.collect()}
    assert rows[0].passes
    assert not rows[1].pass_token_count and not rows[1].passes
    assert not rows[2].pass_word_len and not rows[2].passes
    assert not rows[3].pass_stopwords and not rows[3].passes


def test_decontaminate_planted_ngram(spark):
    bench = _docs(spark, ["alpha beta gamma delta"])
    train = spark.createDataFrame(
        [
            (10, "x y alpha beta gamma q"),  # shares the trigram "alpha beta gamma"
            (11, "completely clean document here"),
            (12, "beta gamma delta t u v"),  # shares "beta gamma delta"
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.n_overlap for r in decontaminate(train, bench, n=3).collect()}
    assert out == {10: 1, 12: 1}


def test_semantic_dedup_drops_planted_duplicate(spark):
    import math

    base = [math.sin(i * 0.7) for i in range(64)]
    near = [v * 1.01 for v in base]          # cosine 1.0 with base
    ortho = [math.cos(i * 1.3) for i in range(64)]
    emb = spark.createDataFrame(
        [(1, base), (2, near), (3, ortho)], "vec_id long, embedding array<float>"
    )
    rows = {r.vec_id: r for r in semantic_dedup(emb, threshold=0.95).collect()}
    assert rows[1].kept                      # lowest id survives
    assert not rows[2].kept and rows[2].n_near_dups >= 1
    assert rows[1].lsh_bucket == rows[2].lsh_bucket  # scaled copy lands in same bucket
    assert rows[3].kept


def test_semantic_dedup_kmeans_recall_at_least_lsh(spark, sf_dir):
    """The k-means SemDeDup variant (the paper's clustering) must
    recover at least as many true near-dup drops as the LSH-bucket
    stand-in on the fixture corpus — trained cluster boundaries track
    the data where fixed hyperplanes cannot."""
    from bigquery_postgres_events_etl_spark.io import load_table
    from bigquery_postgres_events_etl_spark.operators.similarity import (
        cosine_near_pairs,
        semantic_dedup_kmeans,
    )

    threshold = 0.35
    emb = load_table(spark, sf_dir, "embeddings")

    truth_dropped = {
        r.id_b for r in cosine_near_pairs(emb, threshold).select("id_b").distinct().collect()
    }
    assert truth_dropped  # fixture must contain near-dups for the test to mean anything

    lsh_dropped = {
        r.vec_id
        for r in semantic_dedup(emb, threshold=threshold, num_planes=4)
        .where(~F.col("kept"))
        .collect()
    }
    km = semantic_dedup_kmeans(emb, threshold=threshold, n_clusters=16)
    km_dropped = {r.vec_id for r in km.where(~F.col("kept")).collect()}

    recall_lsh = len(lsh_dropped & truth_dropped) / len(truth_dropped)
    recall_km = len(km_dropped & truth_dropped) / len(truth_dropped)
    assert recall_km >= recall_lsh
    # no false drops: every dropped vector is a true near-dup
    assert km_dropped <= truth_dropped


def test_semantic_dedup_kmeans_drops_planted_duplicate(spark):
    import math

    from bigquery_postgres_events_etl_spark.operators.similarity import (
        semantic_dedup_kmeans,
    )

    base = [math.sin(i * 0.7) for i in range(64)]
    near = [v * 1.01 for v in base]
    ortho = [math.cos(i * 1.3) for i in range(64)]
    emb = spark.createDataFrame(
        [(1, base), (2, near), (3, ortho)], "vec_id long, embedding array<float>"
    )
    rows = {
        r.vec_id: r
        for r in semantic_dedup_kmeans(emb, threshold=0.95, n_clusters=2).collect()
    }
    assert rows[1].kept
    assert not rows[2].kept and rows[2].n_near_dups >= 1
    assert rows[1].cluster_id == rows[2].cluster_id
    assert rows[3].kept


def test_semantic_dedup_frozen_planted_and_no_false_drops(spark, sf_dir):
    """The frozen-codebook SemDeDup tier: (a) a planted scaled copy is
    dropped in favor of its lower-id original; (b) on the fixture
    corpus every drop is a true brute-force near-dup (the in-cluster
    threshold policy can only under-drop, never over-drop)."""
    import math

    from bigquery_postgres_events_etl_spark.io import load_table
    from bigquery_postgres_events_etl_spark.operators.similarity import (
        cosine_near_pairs,
        semantic_dedup_frozen,
    )

    # ids 0..n_lists-1 are the codebook by contract (r12: a sparse id
    # space now raises instead of silently shrinking the codebook):
    # seeds are base + ortho, the planted near-copy rides along
    base = [math.sin(i * 0.7) for i in range(64)]
    near = [v * 1.01 for v in base]
    ortho = [math.cos(i * 1.3) for i in range(64)]
    emb = spark.createDataFrame(
        [(0, base), (1, ortho), (2, near)], "vec_id long, embedding array<float>"
    )
    rows = {
        r.vec_id: r
        for r in semantic_dedup_frozen(emb, threshold=0.95, n_lists=2).collect()
    }
    assert rows[0].kept
    assert not rows[2].kept and rows[2].n_near_dups >= 1
    assert rows[0].cluster_id == rows[2].cluster_id
    assert rows[1].kept

    threshold = 0.35
    corpus = load_table(spark, sf_dir, "embeddings")
    truth_dropped = {
        r.id_b
        for r in cosine_near_pairs(corpus, threshold)
        .select("id_b").distinct().collect()
    }
    frozen = semantic_dedup_frozen(corpus, threshold=threshold, n_lists=8)
    frozen_dropped = {r.vec_id for r in frozen.where(~F.col("kept")).collect()}
    assert frozen_dropped  # the tier must actually fire on the fixture
    assert frozen_dropped <= truth_dropped


def test_pii_scan_planted_values(spark):
    from bigquery_postgres_events_etl_spark.operators.text import pii_scan

    docs = _docs(spark, [
        "contact alice.smith+spam@example.co.uk or call 555-867-5309 now",
        "server at 10.0.255.14 responded; mail root@10.0.0.1 failed",
        "no sensitive content here at all",
        "+1 555.867.5309 and 555 867 5309 are the same line",
    ])
    rows = {r.doc_id: r for r in pii_scan(docs).collect()}
    assert rows[0].n_emails == 1 and rows[0].n_phones == 1
    assert "<EMAIL>" in rows[0].redacted and "<PHONE>" in rows[0].redacted
    assert "alice" not in rows[0].redacted and "5309" not in rows[0].redacted
    assert rows[1].n_ipv4 >= 1 and "<IP>" in rows[1].redacted
    assert rows[2].n_pii == 0 and rows[2].redacted == "no sensitive content here at all"
    assert rows[3].n_phones == 2


def test_token_rarity_boilerplate_vs_rare(spark):
    from bigquery_postgres_events_etl_spark.operators.text import token_rarity

    common = "the common boilerplate line"
    docs = _docs(spark, [common, common, common, "zyxgibberish qwertyuiop asdfghjkl"])
    rows = {r.doc_id: r for r in token_rarity(docs).collect()}
    # boilerplate tokens appear in 3 docs -> mean_df 3; gibberish df 1
    assert rows[0].mean_df == 3.0
    assert rows[3].mean_df == 1.0 and rows[3].max_df == 1


def test_blocklist_filter_planted_terms(spark):
    from bigquery_postgres_events_etl_spark.operators.pipeline import blocklist_filter

    docs = _docs(spark, [
        "clean wholesome text about engines",
        "badword in the middle of text",
        "badword badword otherbad repeated",   # distinct count, not occurrences
    ])
    rows = {
        r.doc_id: r
        for r in blocklist_filter(docs, ["badword", "otherbad"]).collect()
    }
    assert rows[0].kept and rows[0].n_blocked_terms == 0
    assert not rows[1].kept and rows[1].n_blocked_terms == 1
    assert rows[2].n_blocked_terms == 2  # distinct terms, duplicates ignored


def test_bigram_coherence_separates_fluent_from_shuffled(spark):
    """Docs whose transitions follow the corpus's dominant bigrams
    must outscore a doc built from the SAME unigrams in scrambled
    order — the signal unigram-based token rarity cannot produce."""
    from bigquery_postgres_events_etl_spark.operators.text import bigram_coherence

    sent = "the cat sat on the mat and the dog ran to the cat"
    # 20 fluent docs repeating the same transitions, 1 scrambled doc
    # with identical token multiset but novel transitions
    words = sent.split()
    scrambled = " ".join(
        words[i] for i in [7, 0, 3, 10, 1, 12, 5, 2, 9, 4, 6, 11, 8]
    )
    rows = [(i, sent) for i in range(20)] + [(99, scrambled)]
    docs = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    out = {r.doc_id: r for r in bigram_coherence(docs).collect()}
    assert out[0].coherence > out[99].coherence
    # fluent copies all share one identical score
    assert len({out[i].coherence for i in range(20)}) == 1
    # sanity: integer components are exact and positive
    assert out[99].n_bigrams == len(words) - 1
    assert 0 < out[99].sum_bigram <= out[99].sum_prefix


def _reference_bpe(word_freqs: dict[str, int], n_merges: int = 10):
    """Sennrich-style BPE on a word-frequency table: argmax pair by
    (count, then lexicographic), left-to-right non-overlapping merge."""
    vocab = {w: list(w) for w in word_freqs}
    merges = []
    for rank in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in vocab.items():
            f = word_freqs[w]
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] = counts.get((syms[i], syms[i + 1]), 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (a, b), n = best
        if n < 2:
            break
        merges.append((rank, a, b, a + b, n))
        for w, syms in vocab.items():
            out: list[str] = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            vocab[w] = out
    return merges


def test_bpe_train_matches_reference(spark, sf_dir):
    from collections import Counter

    from bigquery_postgres_events_etl_spark.io import load_table
    from bigquery_postgres_events_etl_spark.registry import all_queries

    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["n_occurrences"])
        for r in all_queries()["text_bpe_train_merges"](spark, sf_dir)
        .orderBy("rank")
        .collect()
    ]
    texts = [r.text for r in load_table(spark, sf_dir, "documents").collect()]
    freqs = Counter(w for t in texts for w in t.split(" "))
    want = _reference_bpe(dict(freqs), n_merges=10)
    assert got == want
    assert len(got) == 10
    # learned merges compose: later merges may consume earlier ones
    assert all(m[3] == m[1] + m[2] for m in got)


def test_nb_classifier_separates_and_counts_merge(spark, sf_dir):
    """The Naive-Bayes quality classifier must (a) produce a training
    table whose class counts are mergeable integers that reconcile
    with the corpus token total, and (b) actually discriminate: docs
    from the target (curated) sources score higher on average than
    the rest — with the prior's sign making an all-unseen doc default
    to 'not curated' (the corpus is mostly non-target)."""
    from bigquery_postgres_events_etl_spark.io import load_table
    from bigquery_postgres_events_etl_spark.operators.text import (
        NB_TARGET_SOURCES,
        nb_quality_score,
        nb_token_counts,
    )

    docs = load_table(spark, sf_dir, "documents")
    counts = nb_token_counts(docs).collect()
    total_tokens = docs.select(
        F.sum(F.size(F.split("text", " "))).alias("n")
    ).first()["n"]
    assert sum(r.c_pos + r.c_neg for r in counts) == total_tokens

    scored = nb_quality_score(docs).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    rows = scored.collect()
    assert len(rows) == docs.count()
    tgt = [r.nb_score for r in rows if r.source in NB_TARGET_SOURCES]
    rest = [r.nb_score for r in rows if r.source not in NB_TARGET_SOURCES]
    assert sum(tgt) / len(tgt) > sum(rest) / len(rest), (
        "classifier does not separate curated from rest"
    )
    # verdict column is decided on the exact decimal score
    assert all((r.nb_score > 0) == r.predicted_curated for r in rows)


def test_compression_ratio_matches_zlib_and_orders_repetition(spark, sf_dir):
    """The distributed kernel must equal a direct zlib call per doc
    (same bytes, same level), and the signal must order content the
    way the Gopher heuristic assumes: a highly repetitive document
    compresses strictly better (lower ratio) than the natural-prose
    corpus median, and random hex noise strictly worse."""
    import zlib

    from bigquery_postgres_events_etl_spark.io import load_table
    from bigquery_postgres_events_etl_spark.operators.text import compression_ratio

    docs = load_table(spark, sf_dir, "documents")
    got = {r.doc_id: r for r in compression_ratio(docs).collect()}
    want = {
        r.doc_id: len(zlib.compress(r.text.encode("utf-8"), 6))
        for r in docs.collect()
    }
    assert set(got) == set(want)
    for doc_id, comp_len in want.items():
        assert got[doc_id].compressed_len == comp_len
        assert got[doc_id].raw_len > 0

    import hashlib

    rep = "spam ham " * 200
    noise = " ".join(
        hashlib.md5(str(i).encode()).hexdigest() for i in range(100)
    )
    extra = spark.createDataFrame(
        [(100001, rep), (100002, noise)], "doc_id LONG, text STRING"
    )
    rows = {r.doc_id: r.compression_ratio for r in compression_ratio(extra).collect()}
    ratios = sorted(r.compression_ratio for r in got.values())
    median = ratios[len(ratios) // 2]
    assert rows[100001] < median < rows[100002]


def test_bpe_encode_matches_reference_and_compresses(spark, sf_dir):
    """The distributed encoder must segment every document exactly as
    a pure-Python Sennrich encoder using the SAME learned merges, and
    the learned merges must actually compress (n_tokens strictly below
    character count for multi-char words)."""
    from bigquery_postgres_events_etl_spark.io import load_table, parallelize
    from bigquery_postgres_events_etl_spark.operators.text import bpe_encode, bpe_train

    docs = parallelize(load_table(spark, sf_dir, "documents"))
    merges = [
        (r["left"], r["right"])
        for r in bpe_train(docs, n_merges=10).orderBy("rank").collect()
    ]
    ranks = {m: i for i, m in enumerate(merges)}

    def ref_encode(word):
        syms = list(word)
        while len(syms) > 1:
            pairs = [
                (ranks[(syms[i], syms[i + 1])], i)
                for i in range(len(syms) - 1)
                if (syms[i], syms[i + 1]) in ranks
            ]
            if not pairs:
                break
            r, _ = min(pairs)
            a, b = merges[r]
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and (syms[i], syms[i + 1]) == (a, b):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    got = {r.doc_id: r for r in bpe_encode(docs, merges).collect()}
    texts = {r.doc_id: r.text for r in docs.collect()}
    assert set(got) == set(texts)
    for doc_id, text in texts.items():
        words = text.split(" ")
        want_tokens = [t for w in words for t in ref_encode(w)]
        assert got[doc_id].n_words == len(words)
        assert got[doc_id].n_tokens == len(want_tokens), f"doc {doc_id}"
        assert got[doc_id].first_tokens == " ".join(want_tokens[:8]), f"doc {doc_id}"
    # merges exist on this corpus and they compress
    assert merges
    total_chars = sum(sum(len(w) for w in t.split(" ")) for t in texts.values())
    total_tokens = sum(r.n_tokens for r in got.values())
    assert total_tokens < total_chars


def _reference_wordpiece(word_freqs: dict[str, int], n_merges: int = 10,
                         min_pair: int = 2):
    """Pure-Python WordPiece trainer (Schuster & Nakajima 2012): pick
    the pair maximizing n(ab)/(n(a)·n(b)) (IEEE double, ties on
    (a, b)), strip the right side's '##' before concatenating unless
    that would empty it, left-to-right non-overlapping apply."""
    vocab = {
        w: [w[0]] + ["##" + c for c in w[1:]] for w in word_freqs if w != ""
    }
    merges = []
    for rank in range(n_merges):
        pc: dict[tuple[str, str], int] = {}
        sc: dict[str, int] = {}
        for w, syms in vocab.items():
            f = word_freqs[w]
            for s in syms:
                sc[s] = sc.get(s, 0) + f
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pc[p] = pc.get(p, 0) + f
        cand = [(a, b, n) for (a, b), n in pc.items() if n >= min_pair]
        if not cand:
            break
        a, b, n = min(
            cand, key=lambda t: (-(t[2] / (sc[t[0]] * sc[t[1]])), t[0], t[1])
        )
        merged = a + (b[2:] if b.startswith("##") and len(b) > 2 else b)
        merges.append((rank, a, b, merged, n, sc[a], sc[b]))
        for w, syms in vocab.items():
            out: list[str] = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = merged
                else:
                    out.append(s)
            vocab[w] = out
    return merges


def test_wordpiece_train_matches_reference(spark, sf_dir):
    from collections import Counter

    from bigquery_postgres_events_etl_spark.io import load_table
    from bigquery_postgres_events_etl_spark.registry import all_queries

    got = [
        (r["rank"], r["left"], r["right"], r["merged"],
         r["n_pair"], r["n_left"], r["n_right"])
        for r in all_queries()["text_wordpiece_train"](spark, sf_dir)
        .orderBy("rank")
        .collect()
    ]
    texts = [r.text for r in load_table(spark, sf_dir, "documents").collect()]
    freqs = Counter(w for t in texts for w in t.split(" ") if w != "")
    assert got == _reference_wordpiece(dict(freqs), n_merges=10)
    assert len(got) == 10
    # continuation stripping: merged composes left + right-sans-prefix
    for _, a, b, merged, *_ in got:
        want = a + (b[2:] if b.startswith("##") and len(b) > 2 else b)
        assert merged == want


def test_wordpiece_picks_likelihood_not_frequency(spark, tmp_path):
    """The planted corpus separates the two pick rules: pair
    ('a','##a') is the most FREQUENT (10 > 3) but its symbols are
    common (score 10/(10·10)); ('x','##y') is rarer with rare symbols
    (score 3/(3·3)) — BPE would merge aa first, WordPiece must merge
    xy first."""
    from bigquery_postgres_events_etl_spark.operators.text import wordpiece_train

    text = " ".join(["aa"] * 10 + ["xy"] * 3)
    docs = spark.createDataFrame(
        [(1, "src0", "en", len(text), text)],
        "doc_id long, source string, lang string, n_chars long, text string",
    )
    rows = wordpiece_train(docs, n_merges=2).orderBy("rank").collect()
    assert (rows[0]["left"], rows[0]["right"]) == ("x", "##y")
    assert rows[0]["merged"] == "xy"
    assert (rows[0]["n_pair"], rows[0]["n_left"], rows[0]["n_right"]) == (3, 3, 3)


def test_wordpiece_encode_matches_reference(spark, sf_dir):
    """The distributed greedy longest-match encoder must segment every
    document exactly as the pure-Python spec over the SAME trained
    vocabulary, with whole-word [UNK] on any miss."""
    from bigquery_postgres_events_etl_spark.io import load_table, parallelize
    from bigquery_postgres_events_etl_spark.operators.text import (
        wordpiece_encode,
        wordpiece_vocab,
    )

    docs = parallelize(load_table(spark, sf_dir, "documents"))
    vocab = wordpiece_vocab(docs, n_merges=10)
    vset = frozenset(vocab)

    def ref_encode(word):
        out, pos, n = [], 0, len(word)
        while pos < n:
            hit = None
            for ln in range(n - pos, 0, -1):
                cand = ("##" if pos > 0 else "") + word[pos : pos + ln]
                if cand in vset:
                    hit = (cand, ln)
                    break
            if hit is None:
                return ["[UNK]"]
            out.append(hit[0])
            pos += hit[1]
        return out

    got = {r.doc_id: r for r in wordpiece_encode(docs, vocab).collect()}
    texts = {r.doc_id: r.text for r in docs.collect()}
    assert set(got) == set(texts)
    for doc_id, text in texts.items():
        words = text.split(" ") if text else []
        want = [t for w in words for t in ref_encode(w)]
        assert got[doc_id].n_words == len(words)
        assert got[doc_id].n_tokens == len(want), f"doc {doc_id}"
        assert got[doc_id].first_tokens == " ".join(want[:8]), f"doc {doc_id}"
    # same-corpus train+encode can never hit [UNK]: the alphabet covers
    # every (char, position-class) the corpus itself exhibits
    assert all("[UNK]" not in r.first_tokens for r in got.values())


def test_wordpiece_encode_unk_on_out_of_vocab(spark):
    """Encoding with a REDUCED vocabulary hits the [UNK] rule: any
    position with no matching piece makes the whole word one [UNK]
    token (the HF WordPiece contract)."""
    from bigquery_postgres_events_etl_spark.operators.text import wordpiece_encode

    docs = spark.createDataFrame(
        [(1, "ab zq a")], "doc_id long, text string"
    )
    out = wordpiece_encode(docs, ["a", "##b", "z"]).collect()[0]
    # 'ab' -> a ##b (2); 'zq' -> [UNK] (1: z matches but ##q misses);
    # 'a' -> a (1)
    assert out.n_words == 3
    assert out.n_tokens == 4
    assert out.first_tokens == "a ##b [UNK] a"


def test_token_entropy_matches_pure_python(spark, sf_dir):
    """The entropy double is pinned HERE (vs a pure-Python Shannon
    reference) because the registry's compared output is all-integer:
    a decimal-rounded transcendental can round differently across
    libm builds at a boundary (the r5 weighted-sample hash-fail
    class), so the oracle checks n_tokens/n_distinct/Σc² and this
    test owns the entropy values — plus the identity linking them."""
    import math
    from collections import Counter

    from bigquery_postgres_events_etl_spark.io import load_table
    from bigquery_postgres_events_etl_spark.operators.queries_text import (
        text_token_entropy_full,
    )

    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    }
    rows = {r["doc_id"]: r for r in text_token_entropy_full(spark, sf_dir).collect()}
    assert set(rows) == set(docs)
    for doc_id, text in docs.items():
        # the engine tokenizes with F.split(text, " ") (limit -1):
        # consecutive/leading/trailing spaces yield EMPTY-STRING
        # tokens, and Python's str.split(" ") has identical semantics
        # — the reference must keep them too, or n_tokens/sum_c2
        # diverge on any text with doubled spaces (r6 ADVICE).
        counts = Counter(text.split(" "))
        n = sum(counts.values())
        ref = -sum((c / n) * math.log(c / n) for c in counts.values())
        r = rows[doc_id]
        assert r["n_tokens"] == n
        assert r["n_distinct"] == len(counts)
        assert r["sum_c2"] == sum(c * c for c in counts.values())
        # per-term DECIMAL(20,9) rounding: error ≤ 5e-10 per distinct count
        assert abs(r["entropy"] - ref) <= 5e-10 * len(counts) + 1e-12
        assert -1e-12 <= r["entropy"] <= math.log(max(len(counts), 1)) + 1e-9


def test_bigram_lm_profile_and_score_match_pure_python(spark, sf_dir):
    """The cross-entropy double is pinned HERE (vs a pure-Python
    math.log reference built independently from the raw texts)
    because the registry's compared output is the all-integer
    likelihood profile: per-row decimal-rounded ln is the
    transcendental class registry.py forbids for compared columns
    (r5 weighted-sample hash-fail class), so the oracle checks
    (doc_id, num, den, c_sum) and this test owns the entropy fold —
    plus the profile's exact agreement with the reference model."""
    import math
    from collections import Counter, defaultdict

    from bigquery_postgres_events_etl_spark.io import load_table
    from bigquery_postgres_events_etl_spark.operators.text import (
        NB_TARGET_SOURCES,
        bigram_lm_profile,
        bigram_lm_score,
    )

    docs = load_table(spark, sf_dir, "documents")
    raw = docs.select("doc_id", "source", "text").collect()
    # reference model: same tokenizer semantics as F.split(text, " ")
    # (keeps empty tokens — the r6 ADVICE lesson)
    bigrams = {}
    for r in raw:
        if r["text"] is None:
            continue
        t = r["text"].split(" ")
        if len(t) >= 2:
            bigrams[r["doc_id"]] = list(zip(t, t[1:]))
    bc: Counter = Counter()
    curated_sources = set(NB_TARGET_SOURCES)
    src = {r["doc_id"]: r["source"] for r in raw}
    for doc_id, bgs in bigrams.items():
        if src[doc_id] in curated_sources:
            bc.update(bgs)
    cc: dict = defaultdict(int)
    for (prev, _cur), c in bc.items():
        cc[prev] += c
    vocab = {tok for bg in bc for tok in bg}
    v = len(vocab)

    # exact profile agreement
    ref_profile: dict = defaultdict(int)
    for doc_id, bgs in bigrams.items():
        for bg in bgs:
            num = bc.get(bg, 0) + 1
            den = cc.get(bg[0], 0) + v
            ref_profile[(doc_id, num, den)] += 1
    got_profile = {
        (r["doc_id"], r["num"], r["den"]): r["c_sum"]
        for r in bigram_lm_profile(docs).collect()
    }
    assert got_profile == dict(ref_profile)

    # entropy fold agreement (per-class DECIMAL(20,9) ln rounding:
    # error ≤ 5e-10 per occurrence, so ≤ 5e-10 after the /n division)
    rows = {r["doc_id"]: r for r in bigram_lm_score(docs).collect()}
    assert set(rows) == set(bigrams)
    for doc_id, bgs in bigrams.items():
        n = len(bgs)
        ref = -sum(
            math.log((bc.get(bg, 0) + 1) / (cc.get(bg[0], 0) + v))
            for bg in bgs
        ) / n
        r = rows[doc_id]
        assert r["n_bigrams"] == n
        assert abs(r["cross_entropy"] - ref) <= 5e-10 + 1e-12
        assert r["cross_entropy"] > 0


def test_ngram_novelty_planted_extremes(spark):
    """A candidate that copies a reference doc verbatim scores novelty
    0; a candidate sharing no trigram with any reference doc scores 1;
    a half-copied candidate lands strictly between."""
    from bigquery_postgres_events_etl_spark.operators.queries_text import (
        NOVELTY_REF_MOD,
    )

    assert NOVELTY_REF_MOD == 3  # doc_ids below are chosen for % 3
    ref_text = "alpha beta gamma delta epsilon zeta"
    rows = [
        (0, ref_text),                                   # reference slice
        (1, ref_text),                                   # verbatim copy
        (2, "one two three four five six"),              # fully novel
        (4, "alpha beta gamma one two three"),           # half copied
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    import bigquery_postgres_events_etl_spark.operators.queries_text as qt

    # drive the entry's core directly: same code path as the registry
    # entry but over the planted frame instead of the parquet fixture
    from bigquery_postgres_events_etl_spark.operators.dedup import (
        exploded_shingles,
    )

    sh = exploded_shingles(docs, qt.NOVELTY_N).distinct()
    ref = (
        sh.where(F.col("doc_id") % qt.NOVELTY_REF_MOD == 0)
        .select("shingle").distinct().withColumn("__seen", F.lit(1))
    )
    cand = sh.where(F.col("doc_id") % qt.NOVELTY_REF_MOD != 0)
    out = {
        r.doc_id: r
        for r in cand.join(ref, "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count_if(F.col("__seen").isNull()).alias("n_novel"),
        )
        .collect()
    }
    assert out[1].n_novel == 0
    assert out[2].n_novel == out[2].n_grams
    assert 0 < out[4].n_novel < out[4].n_grams


def test_rake_keywords_known_scores(spark, sf_dir):
    """RAKE on planted docs: stopwords delimit phrases, word score =
    deg/freq in fixed point, multiword phrases outrank their parts,
    and identical phrases within a doc collapse with an occurrence
    count."""
    import tempfile

    from bigquery_postgres_events_etl_spark.registry import all_queries
    from bigquery_postgres_events_etl_spark.operators.queries_text import (
        RAKE_SCALE,
    )

    docs = spark.createDataFrame(
        [
            (0, "machine learning is fun"),
            (1, "machine learning and data"),
            (2, "machine learning of machine learning"),
        ],
        "doc_id long, text string",
    )
    with tempfile.TemporaryDirectory() as tmp:
        docs.write.mode("overwrite").parquet(tmp + "/documents.parquet")
        rows = all_queries()["text_rake_keywords"](spark, tmp).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # word stats over the corpus: machine/learning freq 4 (two phrases
    # in doc 2), deg = sum of phrase lengths = 8 -> score 2.0 each
    top0 = min(by_doc[0], key=lambda r: r.rank)
    assert top0.phrase == "machine learning"
    assert top0.score_fp == 4 * RAKE_SCALE
    top2 = min(by_doc[2], key=lambda r: r.rank)
    assert top2.phrase == "machine learning" and top2.n_occurrences == 2
    # single leftover words score below the two-word phrase
    assert all(
        r.score_fp < 4 * RAKE_SCALE for r in by_doc[0] if r.rank > 1
    )


def test_source_overlap_planted_vocabularies(spark):
    """Identical vocabularies give Jaccard 1, disjoint give 0, and a
    half-overlapping pair reports the exact ratio."""
    import tempfile

    from bigquery_postgres_events_etl_spark.registry import all_queries

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma", "s1"),
            (1, "alpha beta gamma", "s2"),     # identical to s1
            (2, "delta epsilon zeta", "s3"),   # disjoint from s1
            (3, "alpha beta delta epsilon", "s4"),  # overlaps s1 by 2 of 5
        ],
        "doc_id long, text string, source string",
    )
    with tempfile.TemporaryDirectory() as tmp:
        docs.write.parquet(tmp + "/documents.parquet")
        out = {
            (r.source_a, r.source_b): r
            for r in all_queries()["corpus_source_overlap"](spark, tmp).collect()
        }
    assert out[("s1", "s2")].jaccard == 1.0
    assert ("s1", "s3") not in out or out[("s1", "s3")].n_inter == 0
    s14 = out[("s1", "s4")]
    assert (s14.n_inter, s14.vocab_a, s14.vocab_b) == (2, 3, 4)
    assert s14.jaccard == 2 / 5


def test_isotonic_calibration_invariants(spark, sf_dir):
    """PAVA output on the fixture: iso_rate is non-decreasing in
    bucket order, pools are contiguous runs identified by their start
    bucket, each pool's exact rational equals the pooled raw counts,
    and pooling preserves the total curated mass."""
    from bigquery_postgres_events_etl_spark.registry import all_queries

    rows = sorted(
        all_queries()["ml_eval_isotonic_calibration"](spark, sf_dir).collect(),
        key=lambda r: r.bucket,
    )
    assert rows
    iso = [r.iso_rate for r in rows]
    assert iso == sorted(iso)
    # pools are contiguous: pool_start never exceeds bucket and is
    # non-decreasing; members of one pool share iso_num/iso_den
    by_pool = {}
    for r in rows:
        assert r.pool_start <= r.bucket
        by_pool.setdefault(r.pool_start, []).append(r)
    for start, members in by_pool.items():
        assert members[0].bucket == start
        assert len({(m.iso_num, m.iso_den) for m in members}) == 1
        assert sum(m.n_docs for m in members) == members[0].iso_den
        assert sum(m.n_curated for m in members) == members[0].iso_num
        assert members[0].iso_rate == members[0].iso_num / members[0].iso_den
    assert sum(r.n_curated for r in rows) == sum(
        m[0].iso_num for m in (sorted(v, key=lambda x: x.bucket) for v in by_pool.values())
    )


def test_corpus_datasheet_planted_counts(spark):
    """Datasheet counts on a planted corpus: duplicate surplus counts
    copies-minus-one per identical text, short docs respect the char
    threshold, vocabulary and token totals are exact."""
    import tempfile

    from bigquery_postgres_events_etl_spark.registry import all_queries

    docs = spark.createDataFrame(
        [
            (0, "alpha beta", "en", "s1"),
            (1, "alpha beta", "en", "s1"),      # dup of 0
            (2, "alpha beta", "fr", "s2"),      # dup of 0 (3 copies total)
            (3, "gamma " * 30, "en", "s2"),     # long doc, 30 tokens + ''
        ],
        "doc_id long, text string, lang string, source string",
    )
    with tempfile.TemporaryDirectory() as tmp:
        docs.write.parquet(tmp + "/documents.parquet")
        out = {
            r.metric: r.value
            for r in all_queries()["corpus_datasheet"](spark, tmp).collect()
        }
    assert out["n_docs"] == 4
    assert out["n_exact_dup_docs"] == 2      # 3 copies -> surplus 2
    assert out["n_sources"] == 2 and out["n_langs"] == 2
    assert out["n_short_docs"] == 3          # the three 10-char docs
    # "gamma " * 30 split on ' ' yields 30 'gamma' + 1 trailing ''
    assert out["n_tokens"] == 2 * 3 + 31
    assert out["n_distinct_tokens"] == 4     # alpha, beta, gamma, ''


def _unigram_reference(texts, rounds=2, max_piece=4, min_seed=2, lb=16,
                       scale=10**9):
    """Pure-Python hard-EM unigram-LM twin (same seed rule, same
    fixed-point floor(ln)·scale costs, same (total, len) Viterbi
    tie-break) for exact-parity testing of unigram_lm_train."""
    import math

    words = {}
    for t in texts:
        for wd in t.split(" "):
            if wd and len(wd) <= lb:
                words[wd] = words.get(wd, 0) + 1
    c = {}
    for wd, f in words.items():
        L = len(wd)
        for s in range(L):
            for ln_ in range(1, min(max_piece, L - s) + 1):
                p = wd[s:s + ln_]
                c[p] = c.get(p, 0) + f
    vocab = {p: n for p, n in c.items() if len(p) == 1 or n >= min_seed}
    for _ in range(rounds):
        T = sum(vocab.values())
        cost = {p: math.floor(math.log(T / n) * scale) for p, n in vocab.items()}
        newc = {}
        for wd, f in words.items():
            L = len(wd)
            sb = {L: 0}
            for pos in range(L - 1, -1, -1):
                best = None
                for ln_ in range(1, min(max_piece, L - pos) + 1):
                    p = wd[pos:pos + ln_]
                    if p in cost and pos + ln_ in sb:
                        tot = cost[p] + sb[pos + ln_]
                        best = tot if best is None else min(best, tot)
                if best is not None:
                    sb[pos] = best
            pos = 0
            while pos < L:
                pick = None
                for ln_ in range(1, min(max_piece, L - pos) + 1):
                    p = wd[pos:pos + ln_]
                    if p in cost and pos + ln_ in sb:
                        k = (cost[p] + sb[pos + ln_], ln_)
                        if pick is None or k < pick[:2]:
                            pick = (*k, p)
                newc[pick[2]] = newc.get(pick[2], 0) + f
                pos += pick[1]
        vocab = newc
    T = sum(vocab.values())
    return sorted(
        (p, n, math.floor(math.log(T / n) * scale)) for p, n in vocab.items()
    )


def test_unigram_lm_train_matches_reference(spark, sf_dir):
    """The distributed hard-EM unigram trainer must match the
    pure-Python twin EXACTLY on the driver fixture — every surviving
    piece, every re-estimated count, every fixed-point cost."""
    from bigquery_postgres_events_etl_spark.io import load_table
    from bigquery_postgres_events_etl_spark.operators.text import (
        unigram_lm_train,
    )

    docs = load_table(spark, sf_dir, "documents")
    got = sorted(
        (r.piece, r.freq, r.cost_fp) for r in unigram_lm_train(docs).collect()
    )
    texts = [r.text for r in docs.select("text").collect()]
    assert got == _unigram_reference(texts)


def test_unigram_lm_planted_compression(spark):
    """On a corpus dominated by one repeated word, EM consolidates
    mass onto the max-length pieces tiling that word (the compression
    property that makes unigram-LM a tokenizer, not a char model) —
    and a second word sharing no chars still stays covered."""
    from bigquery_postgres_events_etl_spark.operators.text import (
        unigram_lm_train,
    )

    rows = [("abcdabcd xy",)] * 20 + [("xy",)] * 3
    docs = spark.createDataFrame(rows, "text string")
    out = {r.piece: r.freq for r in unigram_lm_train(docs).collect()}
    # 'abcdabcd' tiles as two max-length 'abcd' pieces; 'xy' survives
    assert out.get("abcd", 0) == 40
    assert out.get("xy", 0) == 23
    # no single-char leftovers once EM consolidates
    assert all(len(p) > 1 for p in out)


def test_unigram_encode_planted_roundtrip(spark):
    """Encode under the trained vocab: on the planted compression
    corpus the dominant word tiles as two 'abcd' pieces, so its doc
    encodes to exactly 3 tokens (abcd abcd xy); per-doc n_tokens is
    the sum of its words' Viterbi lengths and first_tokens is the
    reading-order prefix; empty docs come back zeroed."""
    from bigquery_postgres_events_etl_spark.operators.text import (
        unigram_encode,
    )

    rows = [(0, "abcdabcd xy"), (1, "xy"), (2, "")] + [
        (i, "abcdabcd xy") for i in range(3, 22)
    ] + [(22, "xy"), (23, "xy")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in unigram_encode(docs).collect()}
    assert len(out) == 24
    assert out[0].n_words == 2 and out[0].n_tokens == 3
    assert out[0].first_tokens == "abcd abcd xy"
    assert out[1].n_words == 1 and out[1].n_tokens == 1
    assert out[1].first_tokens == "xy"
    assert out[2].n_words == 0 and out[2].n_tokens == 0
    assert out[2].first_tokens == ""


def test_ece_invariants_on_fixture(spark, sf_dir):
    """ECE report invariants: bins within 0..9, avg_conf in
    [0.5, 1], accuracy in [0, 1], gap = |accuracy − avg_conf|, the
    scalar ece equals the bin-weighted gap sum and is constant across
    rows."""
    from bigquery_postgres_events_etl_spark.registry import all_queries

    rows = all_queries()["ml_eval_ece"](spark, sf_dir).collect()
    assert rows
    n_total = sum(r.n_docs for r in rows)
    for r in rows:
        assert 0 <= r.bin <= 9
        assert 0.5 <= r.avg_conf <= 1.0 + 1e-12
        assert 0.0 <= r.accuracy <= 1.0
        assert abs(r.gap - abs(r.accuracy - r.avg_conf)) < 1e-12
    want = sum(round(r.n_docs * r.gap / n_total, 9) for r in rows)
    assert all(abs(r.ece - want) < 1e-9 for r in rows)
    assert 0.0 <= rows[0].ece <= 1.0


def test_ndcg_bm25_bounds_and_identity(spark, sf_dir):
    """NDCG invariants: 0 < ndcg ≤ 1 (the BM25 ranking can never beat
    the relevance-ideal), dcg ≤ idcg, and ndcg == dcg/idcg exactly."""
    from bigquery_postgres_events_etl_spark.registry import all_queries

    r = all_queries()["ml_eval_ndcg_bm25"](spark, sf_dir).first()
    assert r.k == 10
    assert r.idcg > 0 and 0 < r.dcg <= r.idcg + 1e-12
    assert 0 < r.ndcg <= 1.0 + 1e-12
    assert abs(r.ndcg - r.dcg / r.idcg) < 1e-15


def test_mrr_bm25_bounds_and_consistency(spark, sf_dir):
    """MRR@k invariants: mrr = 1/first_rel_pos exactly when any hit is
    judged relevant (else 0 with NULL pos), both rates in [0,1],
    n_judged <= k, and judged_at_k = n_judged/k."""
    from bigquery_postgres_events_etl_spark.registry import all_queries

    row = all_queries()["ml_eval_mrr_bm25"](spark, sf_dir).collect()[0]
    assert row.k == 10
    assert 0 <= row.n_judged <= row.k
    assert 0.0 <= row.mrr_at_k <= 1.0
    assert row.judged_at_k == row.n_judged / row.k
    if row.n_judged > 0:
        assert 1 <= row.first_rel_pos <= row.k
        assert row.mrr_at_k == 1.0 / row.first_rel_pos
    else:
        assert row.first_rel_pos is None and row.mrr_at_k == 0.0


def test_mrr_bm25_planted_first_hit(spark, tmp_path):
    """A corpus where exactly one document contains a query term must
    yield first_rel_pos 1 (BM25 ranks it first), mrr 1.0, and
    judged_at_k 1/k."""
    from bigquery_postgres_events_etl_spark.registry import all_queries

    rows = [(0, "src0", "en", 20, "vector store lookup")] + [
        (i, f"src{i % 2}", "en", 20, f"plain filler text {i}")
        for i in range(1, 30)
    ]
    spark.createDataFrame(
        rows, "doc_id long, source string, lang string, n_chars long, text string"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    row = all_queries()["ml_eval_mrr_bm25"](spark, str(tmp_path)).collect()[0]
    assert row.n_judged == 1
    assert row.first_rel_pos == 1
    assert row.mrr_at_k == 1.0
    assert row.judged_at_k == 1 / 10


def test_auc_nb_matches_pure_python(spark, sf_dir):
    """The registered rank-sum AUC must equal the direct pairwise
    definition P(score_pos > score_neg) + 0.5·P(=) computed in exact
    Fractions over the same scores and labels — pins the midrank
    identity (auc_num/auc_den) against first principles."""
    from fractions import Fraction

    from bigquery_postgres_events_etl_spark.io import load_table
    from bigquery_postgres_events_etl_spark.operators.text import (
        NB_TARGET_SOURCES,
        nb_quality_score,
    )
    from bigquery_postgres_events_etl_spark.registry import all_queries

    row = all_queries()["ml_eval_auc_nb"](spark, sf_dir).collect()[0]
    docs = load_table(spark, sf_dir, "documents")
    scored = nb_quality_score(docs).select("doc_id", "nb_score").collect()
    labels = {
        r.doc_id: r.source in NB_TARGET_SOURCES
        for r in docs.select("doc_id", "source").collect()
    }
    pos = [r.nb_score for r in scored if labels[r.doc_id]]
    neg = [r.nb_score for r in scored if not labels[r.doc_id]]
    assert row.n_pos == len(pos) and row.n_neg == len(neg)
    num = sum(
        2 if sp > sn else (1 if sp == sn else 0) for sp in pos for sn in neg
    )
    assert Fraction(row.auc_num, row.auc_den) == Fraction(
        num, 2 * len(pos) * len(neg)
    )
    assert row.auc == row.auc_num / row.auc_den
    assert 0.0 <= row.auc <= 1.0


def test_auc_nb_planted_separation(spark, tmp_path):
    """A corpus where curated sources use a disjoint vocabulary from
    the rest must score AUC 1.0 (perfect separation)."""
    from bigquery_postgres_events_etl_spark.registry import all_queries

    rows = [
        (i, "src0" if i % 2 == 0 else "src5", "en", 20,
         "alpha beta gamma" if i % 2 == 0 else "zeta eta theta")
        for i in range(40)
    ]
    spark.createDataFrame(
        rows, "doc_id long, source string, lang string, n_chars long, text string"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    row = all_queries()["ml_eval_auc_nb"](spark, str(tmp_path)).collect()[0]
    assert row.n_pos == 20 and row.n_neg == 20
    assert row.auc == 1.0


def test_registry_rejects_duplicate_names():
    """register() must fail LOUDLY on a name collision (a silent
    overwrite shadows the certified first registration — the r13
    near-miss this guard pins)."""
    import pytest

    from bigquery_postgres_events_etl_spark.registry import register

    with pytest.raises(ValueError, match="duplicate registry entry"):
        register("ml_eval_auc_nb", None)(lambda spark, sf: None)


def test_registry_allows_module_reload_reregistration():
    """importlib.reload of ONE operator module re-executes its
    register() calls against the live _REGISTRY (only reloading
    registry.py itself rebuilds the dict), so a same-(module,
    qualname) re-registration is a reload, not a collision — it must
    be permitted (the r13 ADVICE edge on the duplicate guard)."""
    from bigquery_postgres_events_etl_spark.registry import _REGISTRY, register

    name = "ml_eval_auc_nb"
    prev = _REGISTRY[name]
    try:
        register(name, prev[1])(prev[0])  # exactly what a reload replays
        assert _REGISTRY[name][0] is prev[0]
    finally:
        _REGISTRY[name] = prev


def test_registry_rejects_same_module_second_function():
    """A SECOND function in the same module claiming a taken name is a
    true collision (different qualname), not a reload — still loud."""
    import pytest

    from bigquery_postgres_events_etl_spark.registry import _REGISTRY, register

    name = "__dup_guard_probe__"

    def probe_a(spark, sf):
        return None

    def probe_b(spark, sf):
        return None

    try:
        register(name, None)(probe_a)
        with pytest.raises(ValueError, match="duplicate registry entry"):
            register(name, None)(probe_b)
    finally:
        _REGISTRY.pop(name, None)


def test_conformal_matches_reference_and_covers(spark, sf_dir):
    """ml_eval_conformal's quantile/coverage must replay exactly from
    the engine's own nb scores in pure Python (split by the same md5
    hash, rank by the same integer k), and the empirical test-split
    coverage must sit at-or-above the 1−α = 0.9 target minus binomial
    noise — the distribution-free guarantee the operator exists for."""
    import hashlib
    from decimal import ROUND_HALF_UP, Decimal

    from bigquery_postgres_events_etl_spark.io import load_table, parallelize
    from bigquery_postgres_events_etl_spark.operators.text import nb_quality_score
    from bigquery_postgres_events_etl_spark.registry import all_queries

    docs = parallelize(load_table(spark, sf_dir, "documents"))
    scores = {
        r["doc_id"]: r["nb_score"]
        for r in nb_quality_score(docs).select("doc_id", "nb_score").collect()
    }

    def is_cal(doc_id):
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16)
        return h % 5 == 0

    def nonconf(s):
        # -CAST(nb_score AS DECIMAL(20,9)): decimal cast is HALF_UP
        return -Decimal(repr(s)).quantize(
            Decimal("1e-9"), rounding=ROUND_HALF_UP
        )

    cal = sorted(
        (nonconf(s), d) for d, s in scores.items() if is_cal(d)
    )
    test = [(nonconf(s), d) for d, s in scores.items() if not is_cal(d)]
    n_cal = len(cal)
    k = (9 * (n_cal + 1) + 9) // 10
    qhat = cal[k - 1][0] if k <= n_cal else None
    n_covered = sum(1 for nc, _ in test if qhat is None or nc <= qhat)

    (row,) = all_queries()["ml_eval_conformal"](spark, sf_dir).collect()
    assert row["n_cal"] == n_cal
    assert row["k_rank"] == k
    assert (row["qhat"] is None) == (qhat is None)
    if qhat is not None:
        assert Decimal(str(row["qhat"])) == qhat
    assert row["n_test"] == len(test)
    assert row["n_covered"] == n_covered
    assert row["coverage"] == n_covered / len(test)
    # the guarantee: marginal coverage ≥ 1−α up to binomial noise on
    # a few hundred test docs (3σ ≈ 0.05 at n_test ≈ 400)
    assert row["coverage"] >= 0.85
    assert row["n_test"] + row["n_cal"] == len(scores)


def test_conformal_tiny_calibration_covers_everything(spark, tmp_path):
    """n_cal < 9 makes k_rank > n_cal: q̂ is NULL (=+∞) and EVERY test
    doc is covered — the documented undersized-calibration
    convention."""
    from bigquery_postgres_events_etl_spark.registry import all_queries

    # doc_ids chosen so the md5 split puts ≤ 8 docs in calibration
    rows = [
        (i, "src0" if i % 2 == 0 else "src5", "en", 20,
         "alpha beta gamma" if i % 2 == 0 else "zeta eta theta")
        for i in range(20)
    ]
    spark.createDataFrame(
        rows, "doc_id long, source string, lang string, n_chars long, text string"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    (row,) = all_queries()["ml_eval_conformal"](spark, str(tmp_path)).collect()
    if row["n_cal"] < 9:
        assert row["qhat"] is None
        assert row["n_covered"] == row["n_test"]
        assert row["coverage"] == 1.0
    else:  # hash landed ≥ 9 of 20 in cal — still a valid conformal row
        assert row["qhat"] is not None


def test_wordpiece_train_property_random_corpora(spark):
    """Hypothesis sweep: on random small corpora (alphabet includes
    '#', so the ##-conflation and strip-guard paths are reachable)
    the distributed trainer must equal the pure-Python WordPiece
    reference merge-for-merge — the cdc_chunks randomized-parity
    pattern."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from bigquery_postgres_events_etl_spark.operators.text import wordpiece_train

    word = st.text(alphabet="ab#", min_size=1, max_size=6)

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(st.lists(word, min_size=2, max_size=30))
    def run(words):
        from collections import Counter

        docs = spark.createDataFrame(
            [(1, " ".join(words))], "doc_id long, text string"
        )
        got = [
            (r["rank"], r["left"], r["right"], r["merged"],
             r["n_pair"], r["n_left"], r["n_right"])
            for r in wordpiece_train(docs, n_merges=4).orderBy("rank").collect()
        ]
        want = _reference_wordpiece(
            dict(Counter(w for w in words if w != "")), n_merges=4
        )
        assert got == want

    run()


def test_wordpiece_encode_property_random_vocab(spark):
    """Hypothesis sweep: greedy longest-match + whole-word [UNK]
    against the pure-Python spec under RANDOM (word list, vocab)
    pairs — including vocabularies that cannot segment some words."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from bigquery_postgres_events_etl_spark.operators.text import wordpiece_encode

    piece = st.text(alphabet="ab#", min_size=1, max_size=3)
    word = st.text(alphabet="ab#", min_size=1, max_size=5)

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        st.lists(word, min_size=1, max_size=12),
        st.sets(
            st.one_of(piece, piece.map(lambda p: "##" + p)),
            min_size=1,
            max_size=12,
        ),
    )
    def run(words, vocab):
        vset = frozenset(vocab)

        def ref(word):
            out, pos, n = [], 0, len(word)
            while pos < n:
                hit = None
                for ln in range(n - pos, 0, -1):
                    cand = ("##" if pos > 0 else "") + word[pos : pos + ln]
                    if cand in vset:
                        hit = (cand, ln)
                        break
                if hit is None:
                    return ["[UNK]"]
                out.append(hit[0])
                pos += hit[1]
            return out

        docs = spark.createDataFrame(
            [(1, " ".join(words))], "doc_id long, text string"
        )
        (row,) = wordpiece_encode(docs, sorted(vset)).collect()
        want = [t for w in words for t in ref(w)]
        assert row.n_words == len(words)
        assert row.n_tokens == len(want)
        assert row.first_tokens == " ".join(want[:8])

    run()


def test_tokenizer_driver_argmax_matches_distributed_pick(spark):
    """r14 moved the under-gate per-round best-pair pick driver-side
    for BOTH trained tokenizers (one collected tagged aggregation +
    Python argmax with the same IEEE score and UTF8 tie-break). The
    distributed join+orderBy path above the gate must produce the
    IDENTICAL merge table — forced by zeroing the gate."""
    from bigquery_postgres_events_etl_spark.operators import text as text_mod
    from bigquery_postgres_events_etl_spark.operators.text import (
        bpe_train,
        wordpiece_train,
        wordpiece_vocab,
    )

    docs = _docs(
        spark,
        [
            "low lower lowest low low",
            "new newer newest new new",
            "wide wider widest wide",
            "low newer low wide wide",
        ],
    )
    wp_d = [tuple(r) for r in wordpiece_train(docs, n_merges=6).collect()]
    bpe_d = [tuple(r) for r in bpe_train(docs, n_merges=6).collect()]
    # vocab under the gate takes the round-0 null-tagged-key alphabet
    # shortcut; above the gate it falls back to the dedicated
    # explode+distinct scan — pin the two alphabet sources equal too
    # (r14 ADVICE: a drift in the empty-word filter on one side only
    # would otherwise go unnoticed)
    vocab_d = wordpiece_vocab(docs, n_merges=6)
    old = text_mod.TOKENIZER_DRIVER_COUNTS_MAX_ROWS
    text_mod.TOKENIZER_DRIVER_COUNTS_MAX_ROWS = 0  # force distributed
    try:
        wp_s = [tuple(r) for r in wordpiece_train(docs, n_merges=6).collect()]
        bpe_s = [tuple(r) for r in bpe_train(docs, n_merges=6).collect()]
        vocab_s = wordpiece_vocab(docs, n_merges=6)
    finally:
        text_mod.TOKENIZER_DRIVER_COUNTS_MAX_ROWS = old
    assert wp_d and wp_d == wp_s
    assert bpe_d and bpe_d == bpe_s
    assert vocab_d and vocab_d == vocab_s
