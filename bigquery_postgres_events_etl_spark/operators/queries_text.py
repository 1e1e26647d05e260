"""Oracle-checked text-analysis queries over ``documents``."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table, parallelize
from ..registry import register
from .text import (
    EN_STOPWORDS,
    LANG_ID_THRESHOLD,
    NB_TARGET_SOURCES,
    doc_fingerprints,
    language_id,
    quality_score,
    text_stats,
    tfidf_top_terms,
    token_frequencies,
)

_STOP_LIST = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
_H60 = "('0x' || substr(md5(shingle), 1, 15))::BIGINT"


@register(
    "text_stats",
    """
    WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id,
           length(text) AS n_chars,
           len(toks) AS n_tokens,
           len(list_distinct(toks)) AS n_distinct_tokens,
           len(list_distinct(toks)) / len(toks) AS ttr,
           greatest(len(toks), CAST(ceil(length(text) / 4) AS BIGINT)) AS est_bpe_tokens
    FROM t
    """,
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace + BPE-ish estimate), lexical stats."""
    return text_stats(load_table(spark, sf_dir, "documents"))


@register(
    "text_token_frequencies",
    """
    SELECT token, count(*) AS freq
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    GROUP BY token ORDER BY freq DESC, token LIMIT 50
    """,
)
def q_token_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_frequencies(parallelize(load_table(spark, sf_dir, "documents")))


@register(
    "text_language_id",
    f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id,
           len(list_filter(toks, t -> t IN ({_STOP_LIST}))) AS n_stopwords,
           len(toks) AS n_tokens,
           len(list_filter(toks, t -> t IN ({_STOP_LIST}))) / len(toks) AS stopword_ratio,
           CASE WHEN len(list_filter(toks, t -> t IN ({_STOP_LIST}))) / len(toks)
                     > {LANG_ID_THRESHOLD}
                THEN 'en' ELSE 'unknown' END AS lang_pred
    FROM t
    """,
)
def q_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Function-word-share language-ID heuristic (single pass)."""
    return language_id(load_table(spark, sf_dir, "documents"))


@register(
    "text_quality_score",
    f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id,
           len(toks) AS n_tokens,
           least(len(toks) / 100.0, 1.0) AS len_score,
           len(list_distinct(toks)) / len(toks) AS diversity,
           len(list_filter(toks, t -> t IN ({_STOP_LIST}))) / len(toks) AS stop_share,
           least(len(toks) / 100.0, 1.0) * 0.4
             + (len(list_distinct(toks)) / len(toks)) * 0.4
             + (len(list_filter(toks, t -> t IN ({_STOP_LIST}))) / len(toks)) * 0.2
             AS quality
    FROM t
    """,
)
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length/diversity/stopword quality heuristics, one pass."""
    return quality_score(load_table(spark, sf_dir, "documents"))


@register(
    "text_tfidf_top_terms",
    """
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
             tf.tf * n.n_docs / dfreq.df AS tfidf
      FROM tf JOIN dfreq USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tf, df, tfidf, CAST(rank AS BIGINT) AS rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, term) AS rank
      FROM scored
    ) WHERE rank <= 3
    """,
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc top-3 terms by rational TF-IDF (log-free, bit-exact)."""
    from pyspark.sql import functions as F

    df = tfidf_top_terms(parallelize(load_table(spark, sf_dir, "documents")))
    return df.withColumn("rank", F.col("rank").cast("long"))


@register(
    "text_fingerprints",
    f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest(CASE WHEN len(t) >= 3
                         THEN list_transform(generate_series(1, len(t) - 2),
                                             i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                         ELSE [] END) AS shingle
      FROM toks
    ),
    hashed AS (SELECT doc_id, shingle, {_H60} AS h FROM sh)
    SELECT doc_id, h AS fingerprint, CAST(rank AS BIGINT) AS rank FROM (
      SELECT doc_id, h,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY h, shingle) AS rank
      FROM hashed
    ) WHERE rank <= 5
    """,
)
def q_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style min-K shingle-hash fingerprints."""
    from pyspark.sql import functions as F

    df = doc_fingerprints(parallelize(load_table(spark, sf_dir, "documents")))
    return df.withColumn("rank", F.col("rank").cast("long"))


@register(
    "text_bpe_tokenize",
    r"""
    WITH t AS (
      SELECT doc_id,
             regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]') AS pieces
      FROM documents
    )
    SELECT doc_id,
           len(pieces) AS n_pieces,
           coalesce(array_to_string(pieces[1:5], ' '), '') AS first5,
           len(list_distinct(pieces)) AS n_distinct_pieces
    FROM t
    """,
)
def q_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish regex tokenization: letter runs / digit runs /
    single punctuation — the pre-tokenization split every BPE variant
    starts from, as one codegen'd regexp_extract_all (the same simple
    character-class pattern behaves identically in Java and RE2
    regex flavors).  `first5` is serialized to a space-joined string
    (the comparator cannot hash list cells); tokenization semantics
    are unchanged."""
    from pyspark.sql import functions as F

    d = load_table(spark, sf_dir, "documents")
    pieces = F.regexp_extract_all(F.lower("text"), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9 ]"), 0)
    return d.select(
        "doc_id",
        F.size(pieces).cast("long").alias("n_pieces"),
        F.concat_ws(" ", F.slice(pieces, 1, 5)).alias("first5"),
        F.size(F.array_distinct(pieces)).cast("long").alias("n_distinct_pieces"),
    )


@register(
    "text_repetition_stats",
    """
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    tokstats AS (
      SELECT doc_id, len(t) AS n_tokens,
             (len(t) - len(list_distinct(t))) / len(t) AS dup_token_frac
      FROM toks
    ),
    bi AS (
      SELECT doc_id,
             unnest(CASE WHEN len(t) >= 2
                         THEN list_transform(generate_series(1, len(t) - 1),
                                             i -> t[i] || ' ' || t[i+1])
                         ELSE [] END) AS bigram
      FROM toks
    ),
    bc AS (SELECT doc_id, bigram, count(*) AS cnt FROM bi GROUP BY doc_id, bigram),
    bstats AS (
      SELECT doc_id,
             CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
             CAST(MAX(cnt) AS BIGINT) AS top_cnt,
             CAST(SUM(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS BIGINT) AS dup_cnt
      FROM bc GROUP BY doc_id
    )
    SELECT ts.doc_id, ts.n_tokens, ts.dup_token_frac,
           b.n_bigrams,
           b.top_cnt / b.n_bigrams AS top_bigram_frac,
           b.dup_cnt / b.n_bigrams AS dup_bigram_frac
    FROM tokstats ts JOIN bstats b ON ts.doc_id = b.doc_id
    """,
)
def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style internal-repetition signals (dup-token fraction,
    top/dup bigram share) — catches boilerplate n-gram dedup misses."""
    from .text import repetition_stats

    return repetition_stats(parallelize(load_table(spark, sf_dir, "documents")))


@register(
    "text_gopher_rules",
    f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    s AS (
      SELECT doc_id,
             len(toks) AS n_tokens,
             CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS total_len,
             len(list_filter(toks, x -> x IN ({_STOP_LIST}))) AS stopword_hits
      FROM t
    )
    SELECT doc_id, n_tokens,
           total_len / n_tokens AS mean_word_len,
           stopword_hits,
           (n_tokens >= 30 AND n_tokens <= 100000) AS pass_token_count,
           (total_len / n_tokens >= 3.0 AND total_len / n_tokens <= 10.0) AS pass_word_len,
           (stopword_hits >= 2) AS pass_stopwords,
           ((n_tokens >= 30 AND n_tokens <= 100000)
            AND (total_len / n_tokens >= 3.0 AND total_len / n_tokens <= 10.0)
            AND (stopword_hits >= 2)) AS passes
    FROM s
    """,
)
def q_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher rule-based quality gate (token-count bounds, mean word
    length, stopword floor) — per-rule flags, all map-side."""
    from .text import gopher_rules

    return gopher_rules(load_table(spark, sf_dir, "documents"))


_PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PII_PHONE = "\\+?\\d{3}[-. ]\\d{3}[-. ]\\d{4}"
_PII_IPV4 = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"


@register(
    "text_pii_scan",
    f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_PII_EMAIL}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(text, '{_PII_PHONE}')) AS BIGINT) AS n_phones,
           CAST(len(regexp_extract_all(text, '{_PII_IPV4}')) AS BIGINT) AS n_ipv4,
           CAST(len(regexp_extract_all(text, '{_PII_EMAIL}'))
              + len(regexp_extract_all(text, '{_PII_PHONE}'))
              + len(regexp_extract_all(text, '{_PII_IPV4}')) AS BIGINT) AS n_pii,
           regexp_replace(
             regexp_replace(
               regexp_replace(text, '{_PII_EMAIL}', '<EMAIL>', 'g'),
               '{_PII_PHONE}', '<PHONE>', 'g'),
             '{_PII_IPV4}', '<IP>', 'g') AS redacted
    FROM documents
    """,
)
def q_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII inventory + redaction (emails / phones / IPv4 → typed
    placeholders); patterns live in the Java-regex ∩ RE2 common
    subset so both engines compile them identically."""
    from .text import pii_scan

    return pii_scan(load_table(spark, sf_dir, "documents"))


@register(
    "text_token_rarity",
    """
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term)
    SELECT tf.doc_id,
           CAST(sum(tf.tf) AS BIGINT) AS n_tokens,
           CAST(sum(tf.tf * dfreq.df) AS BIGINT) AS sum_df,
           CAST(min(dfreq.df) AS BIGINT) AS min_df,
           CAST(max(dfreq.df) AS BIGINT) AS max_df,
           CAST(sum(tf.tf * dfreq.df) AS DOUBLE) / sum(tf.tf) AS mean_df
    FROM tf JOIN dfreq USING (term)
    GROUP BY tf.doc_id
    """,
)
def q_token_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-frequency mass per doc — integer-exact aggregation,
    one final IEEE division (bit-deterministic, log-free)."""
    from .text import token_rarity

    return token_rarity(parallelize(load_table(spark, sf_dir, "documents")))


@register(
    "text_bigram_coherence",
    """
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    big AS (
      SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
      FROM (SELECT doc_id, toks,
                   unnest(generate_series(1, len(toks) - 1)) AS i
            FROM t WHERE len(toks) >= 2)
    ),
    c2 AS (SELECT w1, w2, count(*) AS c_bigram FROM big GROUP BY 1, 2),
    c1 AS (SELECT w1, SUM(c_bigram) AS c_prefix FROM c2 GROUP BY 1)
    SELECT b.doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(c2.c_bigram) AS BIGINT) AS sum_bigram,
           CAST(SUM(c1.c_prefix) AS BIGINT) AS sum_prefix,
           CAST(SUM(c2.c_bigram) AS DOUBLE) / SUM(c1.c_prefix) AS coherence
    FROM big b
    JOIN c2 ON b.w1 = c2.w1 AND b.w2 = c2.w2
    JOIN c1 ON b.w1 = c1.w1
    GROUP BY 1
    """,
)
def text_bigram_coherence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-bigram fluency signal: pooled conditional probability of
    each document's word transitions under the corpus's own bigram
    counts — integer sums, one final division (the coherence signal
    token rarity cannot see: gibberish with common unigrams)."""
    from .text import bigram_coherence

    return bigram_coherence(parallelize(load_table(spark, sf_dir, "documents")))


@register(
    "text_ccnet_buckets",
    """
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    big AS (
      SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
      FROM (SELECT doc_id, toks,
                   unnest(generate_series(1, len(toks) - 1)) AS i
            FROM t WHERE len(toks) >= 2)
    ),
    c2 AS (SELECT w1, w2, count(*) AS c_bigram FROM big GROUP BY 1, 2),
    c1 AS (SELECT w1, SUM(c_bigram) AS c_prefix FROM c2 GROUP BY 1),
    coh AS (
      SELECT b.doc_id,
             CAST(SUM(c2.c_bigram) AS DOUBLE) / SUM(c1.c_prefix) AS coherence
      FROM big b
      JOIN c2 ON b.w1 = c2.w1 AND b.w2 = c2.w2
      JOIN c1 ON b.w1 = c1.w1
      GROUP BY 1
    )
    SELECT doc_id, coherence,
           CAST(ntile(3) OVER (ORDER BY coherence DESC, doc_id) AS BIGINT)
             AS ccnet_bucket
    FROM coh
    """,
)
def text_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's head/middle/tail split: tercile buckets by the
    corpus-bigram coherence score (the fluency proxy standing in for
    the paper's LM perplexity) — bucket 1 = most fluent (head).
    ntile(3) derives from the two-pass global ranking, so there is no
    unpartitioned window at any scale (same machinery as
    pipeline_length_buckets)."""
    from pyspark.sql import functions as F

    from .ranking import ntile_from_rn, with_global_ranks
    from .text import bigram_coherence

    coh = bigram_coherence(
        parallelize(load_table(spark, sf_dir, "documents"))
    ).select("doc_id", "coherence")
    ranked = with_global_ranks(
        coh, key_order=[("coherence", "desc")], tie_order=[("doc_id", "asc")]
    )
    return ranked.select(
        "doc_id",
        "coherence",
        ntile_from_rn(F.col("rn"), F.col("n_total"), 3).alias("ccnet_bucket"),
    )


_BM25_TERMS = ["table", "vector", "stream", "merge"]


def _bm25_contrib(i: int) -> str:
    """One term's BM25 contribution — IDENTICAL expression text on
    both engines; ln() differs by 1 ulp across JVM/libm on ~8% of
    inputs, so the product rounds to DECIMAL(20,9) before the exact
    decimal sum (cast-parity verified empirically)."""
    idf = (
        f"ln((CAST(n_docs AS DOUBLE) - df{i} + CAST(0.5 AS DOUBLE))"
        f" / (df{i} + CAST(0.5 AS DOUBLE)) + CAST(1 AS DOUBLE))"
    )
    sat = (
        f"(tf{i} * (CAST(1.2 AS DOUBLE) + CAST(1 AS DOUBLE)))"
        f" / (tf{i} + CAST(1.2 AS DOUBLE)"
        f" * (CAST(1 AS DOUBLE) - CAST(0.75 AS DOUBLE)"
        f" + CAST(0.75 AS DOUBLE) * dl / avgdl))"
    )
    return f"CAST({idf} * {sat} AS DECIMAL(20,9))"


@register(
    "text_bm25_topk",
    f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    d AS (
      SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
             {", ".join(f"CAST(len(list_filter(toks, x -> x = '{t}')) AS BIGINT) AS tf{i}" for i, t in enumerate(_BM25_TERMS))}
      FROM t
    ),
    s AS (
      SELECT count(*) AS n_docs,
             CAST(SUM(CAST(dl AS DECIMAL(27,0))) AS DOUBLE) / count(*) AS avgdl,
             {", ".join(f"count(*) FILTER (WHERE tf{i} > 0) AS df{i}" for i in range(len(_BM25_TERMS)))}
      FROM d
    )
    SELECT doc_id, dl,
           CAST({" + ".join(_bm25_contrib(i) for i in range(len(_BM25_TERMS)))}
                AS DOUBLE) AS bm25
    FROM d, s
    ORDER BY bm25 DESC, doc_id LIMIT 10
    """,
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword search over the corpus (Lucene's default lexical
    scorer): one map-side scan computes per-term tf + doc length, a
    one-row (N, avgdl, df...) stats frame broadcasts back, scores are
    map-side arithmetic, and the top-10 is a TakeOrderedAndProject —
    the corpus itself never shuffles."""
    from .text import bm25_topk

    return bm25_topk(
        parallelize(load_table(spark, sf_dir, "documents")), _BM25_TERMS
    )


# Shared recursive-CTE replication of the BPE TRAINING loop (see the
# text_bpe_train_merges docstring for the state-machine argument):
# trn_words = corpus word frequencies, trn = the pick/apply recursion.
# Both BPE oracles are built from this one body.
_BPE_TRAIN_CTES = """
trn_words AS (
  SELECT word, CAST(count(*) AS BIGINT) AS freq
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
  GROUP BY word
),
trn AS (
  SELECT 0 AS step, 0 AS rank, 'pick' AS phase, word, freq,
         list_transform(range(1, length(word) + 1), i -> word[i]) AS syms,
         CAST(NULL AS VARCHAR) AS pa, CAST(NULL AS VARCHAR) AS pb,
         CAST(NULL AS BIGINT) AS pn
  FROM trn_words
  UNION ALL
  SELECT step, rank, phase, word, freq, syms, pa, pb, pn FROM (
    -- L4: collapse to one row per word, apply the state transition
    SELECT
      step, word, freq,
      CASE WHEN prev_phase = 'apply' AND any_change = 0
           THEN prev_rank + 1 ELSE prev_rank END AS rank,
      CASE WHEN prev_phase = 'pick' THEN 'apply'
           WHEN any_change = 1 THEN 'apply'
           ELSE 'pick' END AS phase,
      CASE WHEN prev_phase = 'apply' AND idx > 0
           THEN list_concat(list_concat(
                  syms[1:idx - 1], [prev_pa || prev_pb]), syms[idx + 2:])
           ELSE syms END AS syms,
      CASE WHEN prev_phase = 'pick' THEN best_a
           WHEN any_change = 1 THEN prev_pa ELSE NULL END AS pa,
      CASE WHEN prev_phase = 'pick' THEN best_b
           WHEN any_change = 1 THEN prev_pb ELSE NULL END AS pb,
      CASE WHEN prev_phase = 'pick' THEN best_n
           WHEN any_change = 1 THEN prev_pn ELSE NULL END AS pn,
      prev_phase, best_n, prev_rank, rn_word
    FROM (
      -- L3: global best pair + per-word collapse rank
      SELECT *,
        FIRST_VALUE(a) OVER w_best AS best_a,
        FIRST_VALUE(b) OVER w_best AS best_b,
        FIRST_VALUE(tot) OVER w_best AS best_n,
        ROW_NUMBER() OVER (PARTITION BY word ORDER BY a NULLS FIRST, b) AS rn_word
      FROM (
        -- L2: global weighted pair totals + any-change flag
        SELECT *,
          SUM(wcnt) OVER (PARTITION BY a, b) AS tot,
          MAX(CASE WHEN idx > 0 THEN 1 ELSE 0 END) OVER () AS any_change
        FROM (
          -- L1: one scan of rec; explode pick-phase pairs laterally
          SELECT
            r.step + 1 AS step, r.rank AS prev_rank, r.phase AS prev_phase,
            r.word, r.freq, r.syms,
            r.pa AS prev_pa, r.pb AS prev_pb, r.pn AS prev_pn,
            pr.a, pr.b, pr.wcnt,
            CASE WHEN r.phase = 'apply' THEN
              coalesce(list_position(
                list_transform(range(1, len(r.syms)),
                  i -> r.syms[i] = r.pa AND r.syms[i + 1] = r.pb), true), 0)
            ELSE 0 END AS idx
          FROM trn r
          LEFT JOIN LATERAL (
            SELECT a, b, CAST(COUNT(*) * r.freq AS BIGINT) AS wcnt FROM (
              SELECT r.syms[i] AS a, r.syms[i + 1] AS b
              FROM unnest(range(1, len(r.syms))) AS t(i)
              WHERE r.phase = 'pick'
            ) GROUP BY a, b
          ) pr ON true
        )
      )
      WINDOW w_best AS (ORDER BY tot DESC NULLS LAST, a, b
                        ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND UNBOUNDED FOLLOWING)
    )
    WHERE rn_word = 1
      AND NOT (prev_phase = 'pick'
               AND (best_n IS NULL OR best_n < 2 OR prev_rank >= 10))
  )
)
"""

_BPE_TRAIN_ORACLE = (
    "WITH RECURSIVE " + _BPE_TRAIN_CTES + """
SELECT DISTINCT CAST(rank AS BIGINT) AS rank, pa AS "left", pb AS "right",
       pa || pb AS merged, pn AS n_occurrences
FROM trn WHERE phase = 'apply'
ORDER BY rank
"""
)

_BPE_ENCODE_ORACLE = (
    "WITH RECURSIVE " + _BPE_TRAIN_CTES + "," + """
merges AS (
  SELECT DISTINCT CAST(rank AS BIGINT) AS rank, pa, pb
  FROM trn WHERE phase = 'apply'
),
corpus_words AS (
  SELECT DISTINCT word FROM (
    SELECT unnest(string_split(text, ' ')) AS word
    FROM documents WHERE text != ''
  ) t
),
enc AS (
  SELECT 0 AS step, word,
         list_transform(range(1, length(word) + 1), i -> word[i]) AS syms
  FROM corpus_words
  UNION ALL
  SELECT step, word, syms FROM (
    SELECT e.step, e.word,
      flatten(list_transform(range(1, len(e.syms) + 1), i ->
        CASE
          WHEN i > 1 AND e.starts[i - 1] THEN []
          WHEN i <= len(e.starts) AND e.starts[i] THEN [e.pa || e.pb]
          ELSE [e.syms[i]]
        END)) AS syms
    FROM (
      SELECT step, word, syms, pa, pb,
        list_transform(range(1, len(syms)), i ->
          syms[i] = pa AND syms[i + 1] = pb
          AND (pa != pb OR
               (i - (1 + coalesce(list_max(
                  list_filter(range(1, i), j -> syms[j] != pa)), 0))) % 2 = 0)
        ) AS starts
      FROM (
        SELECT r.step + 1 AS step, r.word, r.syms, mm.pa, mm.pb
        FROM enc r
        JOIN LATERAL (
          SELECT m.rank, m.pa, m.pb
          FROM unnest(range(1, len(r.syms))) AS t(i)
          JOIN merges m ON m.pa = r.syms[i] AND m.pb = r.syms[i + 1]
          ORDER BY m.rank LIMIT 1
        ) mm ON true
      )
    ) e
  )
),
word_enc AS (
  SELECT word, syms, CAST(len(syms) AS BIGINT) AS enc_len FROM (
    SELECT word, syms,
           ROW_NUMBER() OVER (PARTITION BY word ORDER BY step DESC) AS rn
    FROM enc
  ) WHERE rn = 1
),
doc_words AS (
  SELECT d.doc_id, t.pos, sp.sp[t.pos] AS word
  FROM (SELECT doc_id, string_split(text, ' ') AS sp
        FROM documents WHERE text != '') sp
  JOIN documents d USING (doc_id),
       unnest(range(1, len(sp.sp) + 1)) AS t(pos)
),
doc_enc AS (
  SELECT doc_id, pos, w.enc_len, w.syms,
         coalesce(SUM(w.enc_len) OVER (PARTITION BY doc_id ORDER BY pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM doc_words dw JOIN word_enc w USING (word)
),
agg AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_words,
         CAST(coalesce(sum(enc_len), 0) AS BIGINT) AS n_tokens,
         array_to_string(
           (flatten(list(syms ORDER BY pos) FILTER (WHERE cum_before < 8)))[1:8],
           ' ') AS first_tokens
  FROM doc_enc GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(a.n_words, 0) AS n_words,
       coalesce(a.n_tokens, 0) AS n_tokens,
       coalesce(a.first_tokens, '') AS first_tokens
FROM documents d LEFT JOIN agg a USING (doc_id)

"""
)



@register("text_bpe_train_merges", _BPE_TRAIN_ORACLE)
def text_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn 10 BPE merges from the corpus (one corpus pass for word
    frequencies, then vocab-table iteration). HASH-oracle-checked
    since r9 — the training loop is replicated in one recursive CTE
    (a flattened two-phase state machine over the vocab): a PICK step
    computes global weighted pair counts via a window over the
    laterally-exploded symbol pairs and argmaxes with the exact Spark
    tie-break (count DESC, left ASC, right ASC; all-ASCII fixture, so
    string collation agrees), then APPLY steps replace ONE leftmost
    occurrence per word per step until a step changes nothing —
    provably equal to the canonical left-to-right non-overlapping scan
    because a merged symbol (left‖right) can never equal either half,
    so replacements never create earlier or new matches (run-overlap
    cases pinned in the prototype tests); the rank then advances and
    the next PICK runs, stopping at 10 merges or best-count < 2.
    Output is all strings + integers — no float hazard anywhere.
    The pure-Python reference parity pytest in
    tests/test_text_quality.py stays as the third opinion."""
    from .text import bpe_train

    return bpe_train(parallelize(load_table(spark, sf_dir, "documents")))


@register(
    "text_feature_hashing",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents
    )
    SELECT doc_id,
           ('0x' || substr(md5(token), 1, 15))::BIGINT % 64 AS bucket,
           count(*) AS n
    FROM tok GROUP BY doc_id, bucket
    """,
)
def text_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick (Weinberger et al. 2009): tokens map to a
    FIXED 64-bucket feature space by hash, so the feature
    dimensionality is a constant independent of vocabulary size — no
    vocab table, no broadcast, no OOV handling; the sparse (doc,
    bucket, count) output feeds linear models directly. One explode +
    one partial-aggregated shuffle; at a web-scale vocab this is the
    difference between a bounded pipeline and a vocabulary join
    (cf. text_tfidf_top_terms' gated broadcast)."""
    docs = load_table(spark, sf_dir, "documents")
    from .dedup import md5_hash60, with_tokens

    return (
        with_tokens(parallelize(docs))
        .select("doc_id", F.explode("tokens").alias("token"))
        .groupBy(
            "doc_id",
            F.pmod(md5_hash60("token"), F.lit(64)).alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


# Derived from the ONE positive-class constant (text.NB_TARGET_SOURCES)
# so the oracle predicate, the Spark scoring path, and every label
# predicate below can never drift apart (ADVICE r12).
_NB_SRC_SQL = ", ".join(f"'{s}'" for s in NB_TARGET_SOURCES)


@register(
    "text_nb_quality_train",
    f"""
    WITH tok AS (
      SELECT doc_id, source, unnest(string_split(text, ' ')) AS token
      FROM documents
    )
    SELECT token,
           CAST(SUM(CASE WHEN source IN ({_NB_SRC_SQL}) THEN 1 ELSE 0 END) AS BIGINT) AS c_pos,
           CAST(SUM(CASE WHEN source IN ({_NB_SRC_SQL}) THEN 0 ELSE 1 END) AS BIGINT) AS c_neg
    FROM tok GROUP BY token
    """,
)
def text_nb_quality_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Naive-Bayes quality-classifier TRAINING: per-token class-
    conditional counts (curated sources vs rest) — one explode, one
    aggregation, integer output (mergeable for incremental retrain)."""
    from .text import nb_token_counts

    return nb_token_counts(parallelize(load_table(spark, sf_dir, "documents")))


# Shared NB scoring CTE chain — the text_nb_quality_score oracle body,
# also consumed by the model-eval entries (queries_stattests) so the
# score SQL cannot drift between the scorer and its evaluators.
NB_SCORE_CTES = f"""tok AS (
      SELECT doc_id, source, unnest(string_split(text, ' ')) AS token
      FROM documents
    ),
    counts AS (
      SELECT token,
             SUM(CASE WHEN source IN ({_NB_SRC_SQL}) THEN 1 ELSE 0 END) AS c_pos,
             SUM(CASE WHEN source IN ({_NB_SRC_SQL}) THEN 0 ELSE 1 END) AS c_neg
      FROM tok GROUP BY token
    ),
    totals AS (
      SELECT CAST(SUM(c_pos) AS BIGINT) AS pos_total,
             CAST(SUM(c_neg) AS BIGINT) AS neg_total,
             count(*) AS vocab
      FROM counts
    ),
    priors AS (
      SELECT CAST(ln(CAST(SUM(CASE WHEN source IN ({_NB_SRC_SQL}) THEN 1 ELSE 0 END) AS DOUBLE)
                    / CAST(SUM(CASE WHEN source IN ({_NB_SRC_SQL}) THEN 0 ELSE 1 END) AS DOUBLE))
                  AS DECIMAL(20,9)) AS prior
      FROM documents
    ),
    per_doc AS (
      SELECT t.doc_id,
             CAST(count(*) AS BIGINT) AS n_tokens,
             SUM(CAST(ln((c.c_pos + CAST(1 AS DOUBLE)) / (tt.pos_total + CAST(tt.vocab AS DOUBLE)))
                    - ln((c.c_neg + CAST(1 AS DOUBLE)) / (tt.neg_total + CAST(tt.vocab AS DOUBLE)))
                  AS DECIMAL(20,9))) AS llr
      FROM tok t JOIN counts c USING (token) CROSS JOIN totals tt
      GROUP BY t.doc_id
    )"""


@register(
    "text_nb_quality_score",
    f"""
    WITH {NB_SCORE_CTES}
    SELECT d.doc_id, d.n_tokens,
           CAST(d.llr + p.prior AS DOUBLE) AS nb_score,
           (d.llr + p.prior) > 0 AS predicted_curated
    FROM per_doc d CROSS JOIN priors p
    """,
)
def text_nb_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Naive-Bayes quality-classifier SCORING: per-doc Laplace-
    smoothed log-likelihood ratio + class prior, keep/drop verdict
    decided on the exact decimal (boundary cannot flip between
    engines). The CCNet/GPT-3 'looks like the curated corpus' gate."""
    from .text import nb_quality_score

    return nb_quality_score(parallelize(load_table(spark, sf_dir, "documents")))


@register("text_compression_ratio", None)  # zlib output: no DuckDB twin
def text_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style zlib-compressibility signal: very low ratio =
    repetitive boilerplate, ratio near 1 = high-entropy noise.
    Arrow-batched mapInPandas over the stdlib zlib (a real codec
    kernel, deterministic for a fixed level/library); rows-only —
    parity vs direct zlib and the repetition ordering are
    pytest-pinned."""
    from .text import compression_ratio

    return compression_ratio(parallelize(load_table(spark, sf_dir, "documents")))


@register(
    "text_token_entropy",
    """
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    tc AS (SELECT doc_id, token, count(*) AS c FROM tok GROUP BY doc_id, token),
    tot AS (
      SELECT doc_id, c,
             SUM(c) OVER (PARTITION BY doc_id) AS n,
             COUNT(*) OVER (PARTITION BY doc_id) AS n_distinct
      FROM tc
    )
    SELECT doc_id,
           CAST(MAX(n) AS BIGINT) AS n_tokens,
           CAST(MAX(n_distinct) AS BIGINT) AS n_distinct,
           CAST(SUM(c * c) AS BIGINT) AS sum_c2
    FROM tot GROUP BY doc_id
    """,
)
def text_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each document's unigram distribution — the
    information-density quality signal between the repetition stats
    (which catch exact loops) and the compression ratio (which needs
    a codec): near-zero entropy = one token stamped over and over,
    max (ln n_distinct) = perfectly flat usage.

    The compared output is all-integer (registry transcendental
    boundary-safety rule — the r5 weighted-sample failure class):
    n_tokens, n_distinct, and the collision mass Σc² (the Simpson-
    diversity numerator, which pins the count histogram's second
    moment — a deeper check than the moments entropy summarizes).
    The entropy double itself lives on the _full frame, pinned
    against a pure-Python reference in tests/test_text_quality.py.

    Plan: explode → (doc, token) count → doc-partitioned window for
    the total → one aggregation; both shuffles carry integer slivers,
    and the window is partitioned by doc_id (never global)."""
    return text_token_entropy_full(spark, sf_dir).drop("entropy")


def text_token_entropy_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The entropy-bearing frame — user-facing surface; the
    registered entry compares the all-integer projection of this."""
    from pyspark.sql import Window

    from .dedup import with_tokens

    tok = with_tokens(parallelize(load_table(spark, sf_dir, "documents"))).select(
        "doc_id", F.explode("tokens").alias("token")
    )
    tc = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("doc_id")
    tot = tc.select(
        "doc_id",
        "c",
        F.sum("c").over(w).alias("n"),
        F.count(F.lit(1)).over(w).alias("n_distinct"),
    )
    contrib = F.expr(
        "CAST(-(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))"
        " * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) AS DECIMAL(20,9))"
    )
    return tot.groupBy("doc_id").agg(
        F.max("n").cast("long").alias("n_tokens"),
        F.max("n_distinct").cast("long").alias("n_distinct"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("sum_c2"),
        F.sum(contrib).cast("double").alias("entropy"),
    )


@register("text_bpe_encode_trained", _BPE_ENCODE_ORACLE)
def text_bpe_encode_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize the corpus with the merges bpe_train LEARNS from it —
    train and inference in one plan (the merge table is tiny; the
    corpus pass is embarrassingly parallel mapInPandas with a
    per-batch word cache). HASH-oracle-checked since r9: the oracle
    re-derives the merges with the shared training recursion
    (_BPE_TRAIN_CTES), then a SECOND recursive CTE replays the
    Sennrich encode per DISTINCT word — each step picks the word's
    lowest-rank applicable pair (lateral + LIMIT 1) and merges ALL its
    occurrences in one parity-masked rewrite (merge-start iff the
    candidate's offset within its same-char run is even — exactly the
    canonical left-to-right scan; all-occurrences-per-step matters
    because a later merged symbol can re-enable a lower-rank pair, and
    the repo encoder finishes the current pair first). Docs reassemble
    by position with the encoder's exact first-8-tokens accumulation
    quirk (include a word's full encoding iff the running token count
    is still < 8, then truncate to 8). All-integer/string output.
    The pure-Python parity pytest stays as the third opinion."""
    from .text import bpe_encode, bpe_train

    docs = parallelize(load_table(spark, sf_dir, "documents"))
    merges = [
        (r["left"], r["right"])
        for r in bpe_train(docs, n_merges=10).orderBy("rank").collect()
    ]
    return bpe_encode(docs, merges)


# ---------------------------------------------------------------------
# WordPiece tokenizer oracles — UNROLLED round CTEs (the DoReMi
# pattern: n_merges is a fixed constant, so each merge round is one
# MATERIALIZED CTE triplet instead of the BPE recursion's two-phase
# state machine; the likelihood pick needs pair counts AND symbol
# counts per round, which the unrolled form expresses naturally)
# ---------------------------------------------------------------------

_WORDPIECE_N_MERGES = 10


def _wordpiece_ctes(n_merges: int = _WORDPIECE_N_MERGES, min_pair: int = 2) -> str:
    """Round-unrolled replication of wordpiece_train: wpv{r} is the
    vocab state, wpp{r}/wps{r} the weighted pair/symbol counts,
    wpb{r} the likelihood-argmax pick (score compared as the same
    IEEE cast/multiply/divide chain the engine orders by —
    exactly-rounded ops over exact integers, bit-identical across
    engines; ties on (a, b)). The apply step reuses the BPE-encode
    parity-mask (merge-start iff the offset within a same-char run is
    even — the canonical left-to-right scan), and a round whose best
    pair count is < min_pair leaves the vocab unchanged, so every
    later round is identically empty — the engine loop's break."""
    parts = [
        """wp_words AS MATERIALIZED (
  SELECT word, CAST(count(*) AS BIGINT) AS freq
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
  WHERE word != ''
  GROUP BY word
)""",
        """wpv0 AS MATERIALIZED (
  SELECT word, freq,
         list_transform(range(1, length(word) + 1),
           i -> CASE WHEN i = 1 THEN word[i] ELSE '##' || word[i] END) AS syms
  FROM wp_words
)""",
    ]
    for r in range(n_merges):
        parts.append(f"""wpp{r} AS MATERIALIZED (
  SELECT a, b, CAST(SUM(freq) AS BIGINT) AS n
  FROM (SELECT v.freq, v.syms[i] AS a, v.syms[i + 1] AS b
        FROM wpv{r} v, unnest(range(1, len(v.syms))) AS t(i))
  GROUP BY a, b
)""")
        parts.append(f"""wps{r} AS MATERIALIZED (
  SELECT s, CAST(SUM(freq) AS BIGINT) AS c
  FROM (SELECT v.freq, unnest(v.syms) AS s FROM wpv{r} v)
  GROUP BY s
)""")
        parts.append(f"""wpb{r} AS MATERIALIZED (
  SELECT p.a, p.b, p.n, sa.c AS ca, sb.c AS cb,
         p.a || CASE WHEN p.b LIKE '##_%' THEN substring(p.b, 3)
                     ELSE p.b END AS merged
  FROM wpp{r} p JOIN wps{r} sa ON sa.s = p.a JOIN wps{r} sb ON sb.s = p.b
  WHERE p.n >= {min_pair}
  ORDER BY CAST(p.n AS DOUBLE)
             / (CAST(sa.c AS DOUBLE) * CAST(sb.c AS DOUBLE)) DESC,
           p.a, p.b
  LIMIT 1
)""")
        parts.append(f"""wpv{r + 1} AS MATERIALIZED (
  SELECT word, freq,
         CASE WHEN a IS NULL THEN syms ELSE
           flatten(list_transform(range(1, len(syms) + 1), i ->
             CASE WHEN i > 1 AND starts[i - 1] THEN []
                  WHEN i <= len(starts) AND starts[i] THEN [merged]
                  ELSE [syms[i]] END))
         END AS syms
  FROM (
    SELECT v.word, v.freq, v.syms, b.a, b.merged,
      CASE WHEN b.a IS NULL THEN NULL ELSE
        list_transform(range(1, len(v.syms)), i ->
          v.syms[i] = b.a AND v.syms[i + 1] = b.b
          AND (b.a != b.b OR
               (i - (1 + coalesce(list_max(
                  list_filter(range(1, i), j -> v.syms[j] != b.a)), 0))) % 2 = 0))
      END AS starts
    FROM wpv{r} v LEFT JOIN wpb{r} b ON true
  )
)""")
    return ",\n".join(parts)


_WORDPIECE_TRAIN_ORACLE = (
    "WITH " + _wordpiece_ctes() + "\nSELECT * FROM (\n"
    + "\n  UNION ALL\n".join(
        f'  SELECT CAST({r} AS BIGINT) AS rank, a AS "left", b AS "right",'
        f" merged, n AS n_pair, ca AS n_left, cb AS n_right FROM wpb{r}"
        for r in range(_WORDPIECE_N_MERGES)
    )
    + "\n) ORDER BY rank\n"
)

_WORDPIECE_ENCODE_ORACLE = (
    "WITH RECURSIVE " + _wordpiece_ctes() + ",\n"
    + """wp_vocab AS MATERIALIZED (
  SELECT DISTINCT piece FROM (
    SELECT unnest(syms) AS piece FROM wpv0
"""
    + "".join(
        f"    UNION ALL SELECT merged FROM wpb{r}\n"
        for r in range(_WORDPIECE_N_MERGES)
    )
    + """  ) t
),
wpe_words AS MATERIALIZED (
  SELECT DISTINCT word FROM (
    SELECT unnest(string_split(text, ' ')) AS word
    FROM documents WHERE text != ''
  ) t
),
-- the vocabulary rides INSIDE the recursion rows as a list column and
-- the longest-match is pure list arithmetic: DuckDB 1.0.0 silently
-- matches nothing when a recursive CTE's LATERAL joins a CTE whose
-- derivation contains any unnest (minimal repro in the r14 notes), so
-- no join may appear inside the recursive step
wpv_list AS MATERIALIZED (SELECT list(DISTINCT piece) AS vlist FROM wp_vocab),
wpe AS (
  SELECT word, CAST(1 AS BIGINT) AS pos, CAST(0 AS BIGINT) AS n_tokens,
         CAST([] AS VARCHAR[]) AS toks, vl.vlist
  FROM wpe_words CROSS JOIN wpv_list vl
  UNION ALL
  SELECT word,
         CASE WHEN best_l IS NULL THEN CAST(length(word) + 1 AS BIGINT)
              ELSE pos + best_l END AS pos,
         CASE WHEN best_l IS NULL THEN CAST(1 AS BIGINT)
              ELSE n_tokens + 1 END AS n_tokens,
         CASE WHEN best_l IS NULL THEN ['[UNK]']
              ELSE list_append(toks,
                     (CASE WHEN pos > 1 THEN '##' ELSE '' END)
                       || substring(word, pos, best_l)) END AS toks,
         vlist
  FROM (
    SELECT word, pos, n_tokens, toks, vlist,
           list_max(list_filter(range(1, length(word) - pos + 2),
             L -> list_contains(vlist,
                    (CASE WHEN pos > 1 THEN '##' ELSE '' END)
                      || substring(word, pos, L)))) AS best_l
    FROM wpe WHERE pos <= length(word)
  ) e
),
wp_word_enc AS (
  SELECT word, toks AS syms, n_tokens AS enc_len FROM (
    SELECT word, toks, n_tokens,
           ROW_NUMBER() OVER (PARTITION BY word ORDER BY pos DESC) AS rn
    FROM wpe
  ) WHERE rn = 1
),
wp_doc_words AS (
  SELECT d.doc_id, t.pos, sp.sp[t.pos] AS word
  FROM (SELECT doc_id, string_split(text, ' ') AS sp
        FROM documents WHERE text != '') sp
  JOIN documents d USING (doc_id),
       unnest(range(1, len(sp.sp) + 1)) AS t(pos)
),
wp_doc_enc AS (
  SELECT doc_id, pos, w.enc_len, w.syms,
         coalesce(SUM(w.enc_len) OVER (PARTITION BY doc_id ORDER BY pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM wp_doc_words dw JOIN wp_word_enc w USING (word)
),
wp_agg AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_words,
         CAST(coalesce(sum(enc_len), 0) AS BIGINT) AS n_tokens,
         array_to_string(
           (flatten(list(syms ORDER BY pos) FILTER (WHERE cum_before < 8)))[1:8],
           ' ') AS first_tokens
  FROM wp_doc_enc GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(a.n_words, 0) AS n_words,
       coalesce(a.n_tokens, 0) AS n_tokens,
       coalesce(a.first_tokens, '') AS first_tokens
FROM documents d LEFT JOIN wp_agg a USING (doc_id)
"""
)


@register("text_wordpiece_train", _WORDPIECE_TRAIN_ORACLE)
def text_wordpiece_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn 10 WordPiece merges from the corpus — the third
    production tokenizer (BPE: most-frequent-pair; unigram-LM:
    hard-EM prune; WordPiece: max likelihood gain n(ab)/(n(a)·n(b))).
    One corpus pass for word frequencies, then two small
    vocab-table aggregations per round (pair counts + symbol counts).
    Hash-oracle-checked: the unrolled-CTE twin replays every round
    with the identical integer counts and the identical IEEE score
    chain; compared columns are labels + exact integers only."""
    from .text import wordpiece_train

    return wordpiece_train(
        parallelize(load_table(spark, sf_dir, "documents")),
        n_merges=_WORDPIECE_N_MERGES,
    )


@register("text_wordpiece_encode_trained", _WORDPIECE_ENCODE_ORACLE)
def text_wordpiece_encode_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize the corpus with the WordPiece vocabulary its own
    training learns (alphabet + merged tokens): greedy
    longest-match-first per word, whole-word [UNK] on any miss — the
    BERT runtime tokenizer. The oracle re-derives the vocabulary with
    the shared unrolled training CTEs, then a recursive CTE replays
    the greedy cursor walk per DISTINCT word (lateral longest-match;
    a missed position jumps the cursor past the end with the single
    [UNK] emission), and docs reassemble by position with the shared
    first-8-tokens accumulation contract (bpe/unigram column
    parity)."""
    from .text import wordpiece_encode, wordpiece_vocab

    docs = parallelize(load_table(spark, sf_dir, "documents"))
    return wordpiece_encode(docs, wordpiece_vocab(docs, _WORDPIECE_N_MERGES))


# Shared bigram-LM CTE chain (the text_bigram_lm_score oracle body
# through the per-doc likelihood classes) — also consumed by the
# learnability-selection entry so the model SQL cannot drift between
# the scorer and its consumers (the NB_SCORE_CTES precedent).
BIGRAM_LM_CTES = f"""toks AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
    bi AS (
      SELECT doc_id, source,
             unnest(list_transform(generate_series(1, len(t) - 1), i -> t[i])) AS prev,
             unnest(list_transform(generate_series(1, len(t) - 1), i -> t[i+1])) AS cur
      FROM toks WHERE len(t) >= 2
    ),
    tc_bi AS (
      SELECT doc_id, source, prev, cur, count(*) AS c
      FROM bi GROUP BY 1, 2, 3, 4
    ),
    bc AS (
      SELECT prev, cur, CAST(SUM(c) AS BIGINT) AS bc
      FROM tc_bi WHERE source IN ({_NB_SRC_SQL}) GROUP BY 1, 2
    ),
    cc AS (SELECT prev, CAST(SUM(bc) AS BIGINT) AS cc FROM bc GROUP BY 1),
    vocab AS (
      SELECT count(*) AS v FROM (
        SELECT DISTINCT tok FROM (
          SELECT prev AS tok FROM bc UNION ALL SELECT cur FROM bc
        )
      )
    ),
    classes AS (
      SELECT t.doc_id,
             CAST(COALESCE(b.bc, 0) + 1 AS BIGINT) AS num,
             CAST(COALESCE(cx.cc, 0) + vv.v AS BIGINT) AS den,
             t.c
      FROM tc_bi t
      LEFT JOIN bc b ON b.prev = t.prev AND b.cur = t.cur
      LEFT JOIN cc cx ON cx.prev = t.prev
      CROSS JOIN vocab vv
    )"""


@register(
    "text_bigram_lm_score",
    f"""
    WITH {BIGRAM_LM_CTES}
    SELECT doc_id, num, den, CAST(SUM(c) AS BIGINT) AS c_sum
    FROM classes GROUP BY 1, 2, 3
    """,
)
def text_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM fluency scoring against the curated sources — the
    CCNet-style 'perplexity vs a clean reference' quality gate,
    trained and applied wholly in-engine. The compared surface is the
    EXACT integer likelihood profile (doc_id, num=bc+1, den=cc+V,
    c_sum) — cross-entropy = −Σ c_sum·ln(num/den)/Σ c_sum is a
    consumer-side fold (operators.text.bigram_lm_score runs it
    in-engine, pytest-pinned vs a pure-Python math.log reference);
    per-row decimal-rounded ln is the transcendental class
    registry.py forbids for compared columns, so it stays out of the
    oracle frame entirely. See operators.text.bigram_lm_profile for
    the model and the gated broadcasts."""
    from .text import bigram_lm_profile

    return bigram_lm_profile(parallelize(load_table(spark, sf_dir, "documents")))


_NB_CAL_BUCKET = (
    "GREATEST(-4, LEAST(4, CAST(floor(nb_score / CAST(5 AS DOUBLE)) AS BIGINT)))"
)


@register(
    "text_nb_calibration",
    f"""
    WITH tok AS (
      SELECT doc_id, source, unnest(string_split(text, ' ')) AS token
      FROM documents
    ),
    counts AS (
      SELECT token,
             SUM(CASE WHEN source IN ({_NB_SRC_SQL}) THEN 1 ELSE 0 END) AS c_pos,
             SUM(CASE WHEN source IN ({_NB_SRC_SQL}) THEN 0 ELSE 1 END) AS c_neg
      FROM tok GROUP BY token
    ),
    totals AS (
      SELECT CAST(SUM(c_pos) AS BIGINT) AS pos_total,
             CAST(SUM(c_neg) AS BIGINT) AS neg_total,
             count(*) AS vocab
      FROM counts
    ),
    priors AS (
      SELECT CAST(ln(CAST(SUM(CASE WHEN source IN ({_NB_SRC_SQL}) THEN 1 ELSE 0 END) AS DOUBLE)
                    / CAST(SUM(CASE WHEN source IN ({_NB_SRC_SQL}) THEN 0 ELSE 1 END) AS DOUBLE))
                  AS DECIMAL(20,9)) AS prior
      FROM documents
    ),
    per_doc AS (
      SELECT t.doc_id,
             SUM(CAST(ln((c.c_pos + CAST(1 AS DOUBLE)) / (tt.pos_total + CAST(tt.vocab AS DOUBLE)))
                    - ln((c.c_neg + CAST(1 AS DOUBLE)) / (tt.neg_total + CAST(tt.vocab AS DOUBLE)))
                  AS DECIMAL(20,9))) AS llr
      FROM tok t JOIN counts c USING (token) CROSS JOIN totals tt
      GROUP BY t.doc_id
    ),
    scored AS (
      SELECT d.doc_id, CAST(d.llr + p.prior AS DOUBLE) AS nb_score
      FROM per_doc d CROSS JOIN priors p
    ),
    labeled AS (
      SELECT s.nb_score, {_NB_CAL_BUCKET} AS bucket,
             CASE WHEN doc.source IN ({_NB_SRC_SQL}) THEN 1 ELSE 0 END AS is_curated
      FROM scored s JOIN documents doc USING (doc_id)
    )
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(is_curated) AS BIGINT) AS n_curated,
           CAST(SUM(is_curated) AS DOUBLE) / count(*) AS curated_rate
    FROM labeled GROUP BY bucket
    """,
)
def text_nb_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration/reliability curve for the NB quality classifier:
    score buckets vs the observed curated rate — the evaluation
    surface that decides where to put the keep/drop threshold (a
    monotone curve = usable ranking even if probabilities are off,
    the usual NB situation). Buckets are integer-floored score bands
    clamped to ±4; all counts integer, one final division.

    Scan shape (r6 verdict item #2): scoring and the per-doc source
    labels both derive from the ONE persisted (doc_id, source, token,
    c) sliver — this entry used to re-tokenize/re-read documents 4×
    (text + priors + the label join); now it is the tc scan plus the
    (source)-only priors scalar. The label join is inner on doc_id,
    and scored only contains docs with ≥1 token, so deriving labels
    from tc's distinct (doc_id, source) is exactly equivalent to
    joining the documents table."""
    from pyspark.sql import functions as F

    from .text import nb_score_with_tc

    docs = parallelize(load_table(spark, sf_dir, "documents"))
    scored_full, tc = nb_score_with_tc(docs)
    scored = scored_full.select("doc_id", "nb_score")
    labels = tc.select("doc_id", "source").distinct()
    labeled = scored.join(labels, "doc_id").select(
        "nb_score",
        F.greatest(
            F.lit(-4),
            F.least(
                F.lit(4),
                F.floor(F.col("nb_score") / F.lit(5).cast("double")).cast("long"),
            ),
        ).alias("bucket"),
        F.when(F.col("source").isin(*NB_TARGET_SOURCES), 1).otherwise(0).alias("is_curated"),
    )
    return labeled.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("is_curated").cast("long").alias("n_curated"),
        (F.sum("is_curated").cast("double") / F.count(F.lit(1))).alias("curated_rate"),
    )


# Deliberately multibyte snippets appended per-doc (doc_id % 5): CJK
# without spaces, RTL Arabic with combining marks, emoji incl. a ZWJ
# family sequence, Latin diacritics, symbols/superscripts. Both sides
# build the SAME derived column, so the hash compare pins cross-engine
# UTF-8 semantics: codepoint length, byte length, single-space
# tokenization with empties kept, and md5-over-UTF-8-bytes hashing
# (the probe for this entry verified each primitive bit-equal on
# Spark 4.1 and DuckDB, including the ZWJ sequence).
_UNI_SNIPPETS = [
    "日本語のテキストにはスペースがない",
    "مِن اليمين إلى اليسار عربية",
    "🚀🔥 emoji 👩‍👩‍👧‍👧 familie ✨",
    "naïve café résumé façade",
    "Ångström Ω ≈ π × 10⁻¹⁰ m",
]
_UNI_ARR_SQL = "[" + ", ".join(f"'{s}'" for s in _UNI_SNIPPETS) + "]"
_UNI_ARR_SPARK = "array(" + ", ".join(f"'{s}'" for s in _UNI_SNIPPETS) + ")"


@register(
    "text_stats_unicode",
    f"""
    WITH u AS (
      SELECT doc_id,
             text || ' ' || ({_UNI_ARR_SQL})[CAST(doc_id % 5 AS INTEGER) + 1]
               AS utext
      FROM documents
    ),
    t AS (SELECT doc_id, utext, string_split(utext, ' ') AS toks FROM u)
    SELECT doc_id,
           length(utext) AS n_chars,
           strlen(utext) AS n_bytes,
           len(toks) AS n_tokens,
           len(list_distinct(toks)) AS n_distinct_tokens,
           ('0x' || substr(md5(utext), 1, 15))::BIGINT AS utext_h60,
           list_min(list_transform(toks,
             s -> ('0x' || substr(md5(s), 1, 15))::BIGINT)) AS min_token_h60
    FROM t
    """,
)
def q_text_stats_unicode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text stats over a DERIVED multibyte column — the driver-hash
    twin of tests/test_unicode_text.py (r8 verdict item #2): the
    ASCII fixture text is concatenated with CJK/RTL/emoji/diacritic
    literals identically on both engines, then codepoint length, byte
    length, exact single-space tokenization (empties kept) and 60-bit
    md5 hashes of the UTF-8 bytes are compared value-for-value.
    Map-side single pass, no shuffle, no UDF."""
    u = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(
            "concat(text, ' ',"
            f" element_at({_UNI_ARR_SPARK}, CAST(doc_id % 5 AS INT) + 1))"
        ).alias("utext"),
    )
    t = u.select("doc_id", "utext", F.split("utext", " ", -1).alias("toks"))
    h60 = "CAST(conv(substring(md5({0}), 1, 15), 16, 10) AS BIGINT)"
    return t.select(
        "doc_id",
        F.length("utext").cast("long").alias("n_chars"),
        F.octet_length("utext").cast("long").alias("n_bytes"),
        F.size("toks").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("toks")).cast("long").alias("n_distinct_tokens"),
        F.expr(h60.format("utext")).alias("utext_h60"),
        F.expr(
            "array_min(transform(toks, s -> "
            + h60.format("s")
            + "))"
        ).alias("min_token_h60"),
    )


NOVELTY_N = 3
NOVELTY_REF_MOD = 3  # doc_id % 3 == 0 is the "already-seen" reference slice


@register(
    "text_ngram_novelty",
    f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh0 AS (
      SELECT doc_id,
             unnest(CASE WHEN len(t) >= {NOVELTY_N}
                         THEN list_transform(
                             generate_series(1, len(t) - {NOVELTY_N - 1}),
                             i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                         ELSE [] END) AS shingle
      FROM toks
    ),
    sh AS (SELECT DISTINCT doc_id, shingle FROM sh0),
    ref AS (SELECT DISTINCT shingle FROM sh
            WHERE doc_id % {NOVELTY_REF_MOD} = 0),
    cand AS (SELECT doc_id, shingle FROM sh
             WHERE doc_id % {NOVELTY_REF_MOD} != 0)
    SELECT c.doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(count(*) FILTER (WHERE r.shingle IS NULL) AS BIGINT) AS n_novel,
           CAST(count(*) FILTER (WHERE r.shingle IS NULL) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS novelty
    FROM cand c LEFT JOIN ref r ON r.shingle = c.shingle
    GROUP BY c.doc_id
    """,
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram novelty scoring (the WIMBD-style corpus-analysis metric,
    and the additive side of exact-substring dedup): per candidate
    document, the fraction of its DISTINCT word trigrams that appear
    nowhere in the reference slice of the corpus (doc_id % 3 == 0 —
    the already-trained-on stand-in). High novelty → new content worth
    keeping; near-zero novelty → the document restates what the
    reference already covers.

    Exact arithmetic: both counts are integers and ``novelty`` is one
    IEEE division of them — hash-exact across engines.

    Scale: the shingle frame builds once (persisted sliver) and feeds
    both sides; the reference gram set is CORPUS-sized — unlike
    decontaminate's parameter-bounded benchmark it must NOT broadcast,
    so the membership probe is a shuffle LEFT join on the gram key,
    partial-aggregated per doc. O(|grams|) end to end, no all-pairs."""
    from .dedup import exploded_shingles

    docs = parallelize(load_table(spark, sf_dir, "documents"))
    # persisted shared sliver: ref and cand both read it (the
    # semantic_dedup persist contract — harnesses clearCache per entry)
    sh = exploded_shingles(docs, NOVELTY_N).distinct().persist()
    ref = (
        sh.where(F.col("doc_id") % NOVELTY_REF_MOD == 0)
        .select("shingle")
        .distinct()
        .withColumn("__seen", F.lit(1))
    )
    cand = sh.where(F.col("doc_id") % NOVELTY_REF_MOD != 0)
    return (
        cand.join(ref, "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.count_if(F.col("__seen").isNull()).cast("long").alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_novel",
            (F.col("n_novel").cast("double") / F.col("n_grams").cast("double")).alias(
                "novelty"
            ),
        )
    )


RAKE_SCALE = 10**6
RAKE_TOP_K = 3
_RAKE_STOP_SQL = ", ".join(f"'{w}'" for w in EN_STOPWORDS)


@register(
    "text_rake_keywords",
    f"""
    WITH tok AS (
      SELECT doc_id, g.i AS pos, t[g.i] AS token,
             t[g.i] IN ({_RAKE_STOP_SQL}) AS stop
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
           UNNEST(generate_series(1, len(t))) AS g(i)
    ),
    isl AS (
      SELECT doc_id, pos, token, island FROM (
        SELECT doc_id, pos, token, stop,
               SUM(CASE WHEN stop THEN 1 ELSE 0 END)
                 OVER (PARTITION BY doc_id ORDER BY pos) AS island
        FROM tok
      ) WHERE NOT stop
    ),
    phrase_agg AS (
      SELECT doc_id, island,
             string_agg(token, ' ' ORDER BY pos) AS phrase,
             CAST(COUNT(*) AS BIGINT) AS n_words
      FROM isl GROUP BY doc_id, island
    ),
    word_occ AS (
      SELECT i.token, p.n_words
      FROM isl i JOIN phrase_agg p
        ON p.doc_id = i.doc_id AND p.island = i.island
    ),
    word_score AS (
      SELECT token,
             (SUM(n_words) * {RAKE_SCALE}) // COUNT(*) AS score_fp
      FROM word_occ GROUP BY token
    ),
    phrase_score AS (
      SELECT i.doc_id, i.island,
             CAST(SUM(w.score_fp) AS BIGINT) AS score_fp
      FROM isl i JOIN word_score w ON w.token = i.token
      GROUP BY i.doc_id, i.island
    ),
    doc_phrases AS (
      SELECT p.doc_id, p.phrase, p.n_words, s.score_fp,
             CAST(COUNT(*) AS BIGINT) AS n_occurrences
      FROM phrase_agg p
      JOIN phrase_score s ON s.doc_id = p.doc_id AND s.island = p.island
      GROUP BY p.doc_id, p.phrase, p.n_words, s.score_fp
    )
    SELECT doc_id, phrase, n_words, n_occurrences, score_fp,
           CAST(rank AS BIGINT) AS rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY score_fp DESC, phrase) AS rank
      FROM doc_phrases
    ) WHERE rank <= {RAKE_TOP_K}
    """,
)
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010) in exact fixed
    point: candidate phrases are maximal stopword-free token runs
    (gaps-and-islands over the stopword flag — one doc-partitioned
    window); each word scores corpus-wide degree/frequency, computed
    as ``(Σ phrase_len · SCALE) div freq`` — an exact BIGINT, so the
    per-doc top-3 phrase ranking hash-checks cross-engine where
    RAKE's usual float ratio could not. Identical phrases within a
    doc collapse with an occurrence count; ties break on the phrase
    text.

    Plan: one tokenize+explode pass; the phrase assembly is one
    doc-partitioned window + agg; the word-stats frame is
    vocabulary-sized (shuffle carries (token, len) slivers); the
    scoring join is phrase-members ⨝ vocabulary. No all-pairs, no
    UDF, no driver loop."""
    docs = parallelize(load_table(spark, sf_dir, "documents"))
    tok = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "token")
    ).select(
        "doc_id",
        (F.col("pos0") + 1).alias("pos"),
        "token",
        F.col("token").isin(EN_STOPWORDS).alias("stop"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    isl = (
        tok.select(
            "doc_id",
            "pos",
            "token",
            "stop",
            F.sum(F.col("stop").cast("int")).over(w).alias("island"),
        )
        .where(~F.col("stop"))
        .drop("stop")
        .persist()  # feeds phrase assembly, word stats, and scoring
    )
    phrase_agg = isl.groupBy("doc_id", "island").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "token"))),
                lambda s: s.getField("token"),
            ),
            " ",
        ).alias("phrase"),
        F.count(F.lit(1)).cast("long").alias("n_words"),
    )
    word_occ = isl.join(phrase_agg.select("doc_id", "island", "n_words"),
                        ["doc_id", "island"])
    word_score = word_occ.groupBy("token").agg(
        F.expr(f"(SUM(n_words) * {RAKE_SCALE}) div COUNT(*)").alias("score_fp")
    )
    phrase_score = (
        isl.join(word_score, "token")
        .groupBy("doc_id", "island")
        .agg(F.sum("score_fp").cast("long").alias("score_fp"))
    )
    doc_phrases = (
        phrase_agg.join(phrase_score, ["doc_id", "island"])
        .groupBy("doc_id", "phrase", "n_words", "score_fp")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occurrences"))
    )
    wr = Window.partitionBy("doc_id").orderBy(
        F.col("score_fp").desc(), F.col("phrase")
    )
    return (
        doc_phrases.withColumn("rank", F.row_number().over(wr).cast("long"))
        .where(F.col("rank") <= RAKE_TOP_K)
        .select(
            "doc_id", "phrase", "n_words", "n_occurrences", "score_fp", "rank"
        )
    )


@register(
    "corpus_source_overlap",
    """
    WITH sv AS (
      SELECT DISTINCT source, unnest(string_split(text, ' ')) AS token
      FROM documents
    ),
    sizes AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS vocab FROM sv GROUP BY 1),
    inter AS (
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(COUNT(*) AS BIGINT) AS n_inter
      FROM sv a JOIN sv b ON a.token = b.token AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT i.source_a, i.source_b, i.n_inter,
           sa.vocab AS vocab_a, sb.vocab AS vocab_b,
           CAST(i.n_inter AS DOUBLE)
             / CAST(sa.vocab + sb.vocab - i.n_inter AS DOUBLE) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.source = i.source_a
    JOIN sizes sb ON sb.source = i.source_b
    """,
)
def corpus_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source-vocabulary overlap — the corpus-diagnostics
    matrix a mixture designer reads before setting sampling weights
    (two sources with near-identical vocabularies are redundant;
    near-disjoint ones cover different registers): per source pair
    the distinct-token intersection, both vocabulary sizes, and
    vocabulary Jaccard as one IEEE division of exact integers.

    Scale: the distinct (source, token) sliver is vocabulary-sized
    (|sources| × |vocab| worst case, typically ≪ corpus); the pair
    intersection is a token-key self-join of that sliver with
    partial-aggregated counts — never touches the corpus twice and
    never goes all-pairs over documents."""
    docs = parallelize(load_table(spark, sf_dir, "documents"))
    sv = (
        docs.select(
            "source", F.explode(F.split("text", " ")).alias("token")
        )
        .distinct()
        .persist()  # feeds sizes and both intersection arms
    )
    sizes = sv.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("vocab"))
    a = sv.select(F.col("source").alias("source_a"), "token")
    b = sv.select(F.col("source").alias("source_b"), "token")
    inter = (
        a.join(b, "token")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_inter"))
    )
    return (
        inter.join(
            sizes.select(F.col("source").alias("source_a"), F.col("vocab").alias("vocab_a")),
            "source_a",
        )
        .join(
            sizes.select(F.col("source").alias("source_b"), F.col("vocab").alias("vocab_b")),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            "n_inter",
            "vocab_a",
            "vocab_b",
            (
                F.col("n_inter").cast("double")
                / (F.col("vocab_a") + F.col("vocab_b") - F.col("n_inter")).cast(
                    "double"
                )
            ).alias("jaccard"),
        )
    )


PAVA_ROUNDS = 8  # ≥ (max buckets − 1) = every merge sequence converges

# pool aggregates at round p.r — (pool, pooled n, pooled pos), used
# inside the recursive step's violating-pair search
_PAV_AGG = """(SELECT x.pool AS pool, SUM(c.n_docs) AS sn, SUM(c.n_curated) AS sp
               FROM pav x JOIN cal c ON c.bucket = x.bucket AND x.r = p.r
               GROUP BY x.pool)"""
# leftmost ADJACENT violating pool pair (cross-multiplied rate
# comparison — exact integers); adjacency = no pool strictly between
_PAV_PSTAR = f"""(SELECT MIN(a.pool) FROM {_PAV_AGG} a JOIN {_PAV_AGG} b
                  ON a.pool < b.pool
                 AND NOT EXISTS (SELECT 1 FROM pav z
                                 WHERE z.r = p.r AND z.pool > a.pool
                                   AND z.pool < b.pool)
                 WHERE a.sp * b.sn > b.sp * a.sn)"""
_PAV_QSTAR = f"""(SELECT MIN(z2.pool) FROM pav z2
                  WHERE z2.r = p.r AND z2.pool > {_PAV_PSTAR})"""


@register(
    "ml_eval_isotonic_calibration",
    f"""
    WITH RECURSIVE {NB_SCORE_CTES},
    scored AS (
      SELECT d.doc_id, CAST(d.llr + p.prior AS DOUBLE) AS nb_score
      FROM per_doc d CROSS JOIN priors p
    ),
    labeled AS (
      SELECT s.nb_score, {_NB_CAL_BUCKET} AS bucket,
             CASE WHEN doc.source IN ({_NB_SRC_SQL}) THEN 1 ELSE 0 END AS is_curated
      FROM scored s JOIN documents doc USING (doc_id)
    ),
    cal AS (
      SELECT bucket,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(SUM(is_curated) AS BIGINT) AS n_curated
      FROM labeled GROUP BY bucket
    ),
    pav (r, bucket, pool) AS (
      SELECT 0, bucket, bucket FROM cal
      UNION ALL
      SELECT p.r + 1, p.bucket,
             CASE WHEN p.pool = {_PAV_QSTAR} THEN {_PAV_PSTAR}
                  ELSE p.pool END
      FROM pav p WHERE p.r < {PAVA_ROUNDS}
    ),
    final AS (SELECT bucket, pool FROM pav WHERE r = {PAVA_ROUNDS}),
    pools AS (
      SELECT f.pool, CAST(SUM(c.n_docs) AS BIGINT) AS iso_den,
             CAST(SUM(c.n_curated) AS BIGINT) AS iso_num
      FROM final f JOIN cal c USING (bucket)
      GROUP BY f.pool
    )
    SELECT c.bucket, c.n_docs, c.n_curated,
           CAST(c.n_curated AS DOUBLE) / c.n_docs AS raw_rate,
           CAST(f.pool AS BIGINT) AS pool_start,
           po.iso_num, po.iso_den,
           CAST(po.iso_num AS DOUBLE) / po.iso_den AS iso_rate
    FROM cal c
    JOIN final f USING (bucket)
    JOIN pools po ON po.pool = f.pool
    """,
)
def ml_eval_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic calibration of the NB quality classifier — PAVA
    (pool-adjacent-violators) over the reliability-curve buckets, so
    the calibrated curated-rate is non-decreasing in score. Every
    comparison is an exact integer cross-product and every pooled
    rate an exact rational (iso_num/iso_den emitted beside the one
    division), so the fit hash-checks cross-engine. The isotonic
    solution is UNIQUE regardless of merge order, which is what lets
    the Spark side run the classic O(B) stack PAVA while the oracle
    replays bounded leftmost merges in a recursive CTE — both land on
    the same pools.

    Scale: the bucket table is schema-bounded (≤9 rows — the clamped
    integer score bands), so PAVA is driver work over a
    vocabulary-bounded collect; everything corpus-sized is the NB
    scoring pass the calibration entry already pays."""
    from .text import nb_score_with_tc

    docs = parallelize(load_table(spark, sf_dir, "documents"))
    scored_full, tc = nb_score_with_tc(docs)
    labels = tc.select("doc_id", "source").distinct().select(
        "doc_id",
        F.col("source").isin(*NB_TARGET_SOURCES).cast("int").alias("is_curated"),
    )
    bucket = F.greatest(
        F.lit(-4),
        F.least(F.lit(4), F.floor(F.col("nb_score") / F.lit(5.0)).cast("long")),
    )
    cal = (
        scored_full.select("doc_id", "nb_score")
        .join(labels, "doc_id")
        .select(bucket.alias("bucket"), "is_curated")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("is_curated").cast("long").alias("n_curated"),
        )
        .collect()  # ≤9 rows — schema-bounded score bands
    )
    rows = sorted((r.bucket, r.n_docs, r.n_curated) for r in cal)
    # classic stack PAVA: pools carry (start_bucket, n, pos); merge
    # while the top two violate (pos/n non-increasing left-to-right)
    stack: list[list[int]] = []
    for b, n, pos in rows:
        stack.append([b, n, pos])
        while len(stack) >= 2 and stack[-2][2] * stack[-1][1] > stack[-1][2] * stack[-2][1]:
            s = stack.pop()
            stack[-1][1] += s[1]
            stack[-1][2] += s[2]
    out = []
    for start, sn, sp in stack:
        for b, n, pos in rows:
            if b >= start and (
                not [p for p in stack if start < p[0] <= b]
            ):
                out.append((b, n, pos, pos / n, start, sp, sn, sp / sn))
    return spark.createDataFrame(
        out,
        "bucket BIGINT, n_docs BIGINT, n_curated BIGINT, raw_rate DOUBLE, "
        "pool_start BIGINT, iso_num BIGINT, iso_den BIGINT, iso_rate DOUBLE",
    )


DATASHEET_SHORT_CHARS = 100


@register(
    "corpus_datasheet",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    dup AS (
      SELECT CAST(COALESCE(SUM(cnt - 1), 0) AS BIGINT) AS n_exact_dup_docs
      FROM (SELECT md5(text) AS h, COUNT(*) AS cnt
            FROM documents GROUP BY md5(text)) g
      WHERE cnt >= 2
    ),
    base AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(length(text)) AS BIGINT) AS total_chars,
             CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
             CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
             CAST(SUM(CASE WHEN length(text) < {DATASHEET_SHORT_CHARS}
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_short_docs
      FROM documents
    ),
    toks AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(COUNT(DISTINCT token) AS BIGINT) AS n_distinct_tokens
      FROM tok
    )
    SELECT metric, value FROM (
      SELECT 'n_docs' AS metric, n_docs AS value FROM base
      UNION ALL SELECT 'total_chars', total_chars FROM base
      UNION ALL SELECT 'n_sources', n_sources FROM base
      UNION ALL SELECT 'n_langs', n_langs FROM base
      UNION ALL SELECT 'n_short_docs', n_short_docs FROM base
      UNION ALL SELECT 'n_tokens', n_tokens FROM toks
      UNION ALL SELECT 'n_distinct_tokens', n_distinct_tokens FROM toks
      UNION ALL SELECT 'n_exact_dup_docs', n_exact_dup_docs FROM dup
    )
    """,
)
def corpus_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-page corpus datasheet (Gebru et al., "Datasheets for
    Datasets") — the integer headline numbers a dataset card leads
    with: document/char/token counts, vocabulary size, source and
    language counts, short-doc count, and exact-duplicate surplus
    (Σ (copies−1) over md5-identical texts). All integers in
    (metric, value) rows so downstream cards diff cleanly.

    Plan: one narrow metadata aggregation, one tokenize pass for the
    token pair, one digest groupBy for dups — three partial-aggregated
    scans, each to a scalar sliver; no joins, no windows."""
    docs = parallelize(load_table(spark, sf_dir, "documents"))
    base = docs.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.length("text")).cast("long").alias("total_chars"),
        F.countDistinct("source").cast("long").alias("n_sources"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.count_if(F.length("text") < DATASHEET_SHORT_CHARS)
        .cast("long")
        .alias("n_short_docs"),
    )
    tok = docs.select(F.explode(F.split("text", " ")).alias("token"))
    toks = tok.agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.countDistinct("token").cast("long").alias("n_distinct_tokens"),
    )
    dup = (
        docs.groupBy(F.md5("text").alias("h"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= 2)
        .agg(
            F.coalesce(F.sum(F.col("cnt") - 1), F.lit(0))
            .cast("long")
            .alias("n_exact_dup_docs")
        )
    )
    # ONE 1-row frame then stack-unpivot — a unionAll of per-metric
    # selects would re-derive each scalar frame per branch (8 scans)
    combined = base.crossJoin(toks).crossJoin(dup)
    metrics = [
        "n_docs",
        "total_chars",
        "n_sources",
        "n_langs",
        "n_short_docs",
        "n_tokens",
        "n_distinct_tokens",
        "n_exact_dup_docs",
    ]
    stack = ", ".join(f"'{m}', {m}" for m in metrics)
    return combined.select(
        F.expr(f"stack({len(metrics)}, {stack}) AS (metric, value)")
    )


# ---------------------------------------------------------------------
# Unigram-LM tokenizer training (r11 verdict item 6) — hash oracle
# generated as an UNROLLED chain of MATERIALIZED CTEs: the DP has the
# static depth bound UNIGRAM_MAX_WORD, so each suffix-DP level and
# each forward step is its own plain aggregation CTE (a recursive CTE
# cannot be layered per EM round — DuckDB does not evaluate a
# recursive CTE referenced from inside another's recursive term; the
# BPE oracle's single-recursion state machine avoids this, the
# unrolled chain here avoids it MORE simply). MATERIALIZED is
# required: each level references the previous in two branches, so
# inlining would expand the plan 2^depth.
# ---------------------------------------------------------------------


def _unigram_oracle(
    rounds: int,
    max_piece: int,
    min_seed: int,
    lb: int,
    scale: int,
    encode: bool = False,
) -> str:
    ctes = [
        f"""
w AS MATERIALIZED (
  SELECT word, CAST(count(*) AS BIGINT) AS freq
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
  WHERE word != '' AND length(word) <= {lb} GROUP BY word
)""",
        f"""
grid AS MATERIALIZED (
  SELECT word, freq, CAST(s AS BIGINT) AS start, CAST(l AS BIGINT) AS len,
         substr(word, CAST(s AS INT), CAST(l AS INT)) AS piece
  FROM w,
       unnest(range(1, length(word) + 1)) AS ts(s),
       unnest(range(1, least({max_piece}, length(word) - s + 1) + 1)) AS tl(l)
)""",
        f"""
c0 AS MATERIALIZED (
  SELECT piece, SUM(freq) AS c FROM grid GROUP BY piece
  HAVING length(piece) = 1 OR SUM(freq) >= {min_seed}
)""",
    ]
    n_seg_rounds = rounds + (1 if encode else 0)
    for r in range(n_seg_rounds):
        ctes.append(f"t{r} AS MATERIALIZED (SELECT SUM(c) AS t FROM c{r})")
        ctes.append(
            f"""
m{r} AS MATERIALIZED (
  SELECT g.word, g.freq, g.start, g.len, g.piece,
         CAST(floor(ln(CAST((SELECT t FROM t{r}) AS DOUBLE)
              / CAST(v.c AS DOUBLE)) * {scale}) AS BIGINT) AS cost
  FROM grid g JOIN c{r} v USING (piece)
)"""
        )
        ctes.append(
            f"""
sb{r}_0 AS MATERIALIZED (
  SELECT word, CAST(length(word) + 1 AS BIGINT) AS pos,
         CAST(0 AS BIGINT) AS sc
  FROM w
)"""
        )
        for lvl in range(1, lb + 1):
            ctes.append(
                f"""
sb{r}_{lvl} AS MATERIALIZED (
  SELECT word, pos, sc FROM sb{r}_{lvl - 1}
  UNION ALL
  SELECT m.word, m.start AS pos, MIN(m.cost + s.sc) AS sc
  FROM m{r} m JOIN sb{r}_{lvl - 1} s
    ON s.word = m.word AND s.pos = m.start + m.len
  WHERE m.start = length(m.word) - {lvl} + 1
  GROUP BY m.word, m.start
)"""
            )
        ctes.append(
            f"""
f{r}_0 AS MATERIALIZED (
  SELECT word, freq, CAST(1 AS BIGINT) AS pos,
         CAST(NULL AS VARCHAR) AS piece
  FROM w
)"""
        )
        for s in range(1, lb + 1):
            ctes.append(
                f"""
f{r}_{s} AS MATERIALIZED (
  SELECT word, freq, pos, piece FROM (
    SELECT m.word, p.freq, m.start + m.len AS pos, m.piece,
           ROW_NUMBER() OVER (PARTITION BY m.word
                              ORDER BY m.cost + sx.sc ASC, m.len ASC) AS rn
    FROM f{r}_{s - 1} p
    JOIN m{r} m ON m.word = p.word AND m.start = p.pos
    JOIN sb{r}_{lb} sx ON sx.word = m.word AND sx.pos = m.start + m.len
    WHERE p.pos <= length(p.word)
  ) q WHERE rn = 1
)"""
            )
        if encode and r == rounds:
            union = " UNION ALL ".join(
                f"SELECT word, freq, CAST({s} AS BIGINT) AS step, piece"
                f" FROM f{r}_{s}"
                for s in range(1, lb + 1)
            )
            ctes.append(f"enc_use AS MATERIALIZED ({union})")
        else:
            union = " UNION ALL ".join(
                f"SELECT word, freq, piece FROM f{r}_{s}" for s in range(1, lb + 1)
            )
            ctes.append(f"use{r} AS MATERIALIZED ({union})")
            ctes.append(
                f"""
c{r + 1} AS MATERIALIZED (
  SELECT piece, SUM(freq) AS c FROM use{r} GROUP BY piece
)"""
            )
    if encode:
        ctes.append(
            """
word_enc AS MATERIALIZED (
  SELECT word, CAST(count(*) AS BIGINT) AS enc_len,
         list(piece ORDER BY step) AS syms
  FROM enc_use GROUP BY word
)"""
        )
        ctes.append(
            """
doc_words AS MATERIALIZED (
  SELECT d.doc_id, t.pos, sp.sp[t.pos] AS word
  FROM (SELECT doc_id, string_split(text, ' ') AS sp
        FROM documents WHERE text != '') sp
  JOIN documents d USING (doc_id),
       unnest(range(1, len(sp.sp) + 1)) AS t(pos)
)"""
        )
        ctes.append(
            """
doc_enc AS MATERIALIZED (
  SELECT doc_id, pos, w.enc_len, w.syms,
         coalesce(SUM(w.enc_len) OVER (PARTITION BY doc_id ORDER BY pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_before
  FROM doc_words dw JOIN word_enc w USING (word)
)"""
        )
        ctes.append(
            """
enc_agg AS MATERIALIZED (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_words,
         CAST(coalesce(sum(enc_len), 0) AS BIGINT) AS n_tokens,
         array_to_string(
           (flatten(list(syms ORDER BY pos) FILTER (WHERE cum_before < 8)))[1:8],
           ' ') AS first_tokens
  FROM doc_enc GROUP BY doc_id
)"""
        )
        return (
            "WITH "
            + ",".join(ctes)
            + """
SELECT d.doc_id,
       coalesce(a.n_words, 0) AS n_words,
       coalesce(a.n_tokens, 0) AS n_tokens,
       coalesce(a.first_tokens, '') AS first_tokens
FROM documents d LEFT JOIN enc_agg a USING (doc_id)
"""
        )
    return (
        "WITH "
        + ",".join(ctes)
        + f"""
SELECT v.piece, CAST(v.c AS BIGINT) AS freq,
       CAST(floor(ln(CAST((SELECT SUM(c) FROM c{rounds}) AS DOUBLE)
            / CAST(v.c AS DOUBLE)) * {scale}) AS BIGINT) AS cost_fp
FROM c{rounds} v
"""
    )


from .text import (  # noqa: E402
    UNIGRAM_COST_SCALE,
    UNIGRAM_EM_ROUNDS,
    UNIGRAM_MAX_PIECE,
    UNIGRAM_MAX_WORD,
    UNIGRAM_MIN_SEED,
)


@register(
    "text_unigram_lm_train",
    _unigram_oracle(
        UNIGRAM_EM_ROUNDS,
        UNIGRAM_MAX_PIECE,
        UNIGRAM_MIN_SEED,
        UNIGRAM_MAX_WORD,
        UNIGRAM_COST_SCALE,
    ),
)
def text_unigram_lm_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM (SentencePiece) tokenizer training over the corpus
    (r11 verdict item 6) — the OTHER production tokenizer beside the
    BPE pair: hard-EM (Viterbi E-step under fixed-point integer
    ln-costs, count M-step with hard prune) for 2 rounds over a
    bounded seed vocabulary; see operators/text.py:unigram_lm_train
    for the full semantics, exactness, and scale argument. Output:
    the final vocabulary (piece, freq, cost_fp). A pure-Python EM
    parity pytest additionally pins the whole trajectory
    (tests/test_text_quality.py)."""
    from .text import unigram_lm_train

    return unigram_lm_train(parallelize(load_table(spark, sf_dir, "documents")))


@register(
    "ml_eval_ece",
    f"""
    WITH tok AS (
      SELECT doc_id, source, unnest(string_split(text, ' ')) AS token
      FROM documents
    ),
    counts AS (
      SELECT token,
             SUM(CASE WHEN source IN ({_NB_SRC_SQL}) THEN 1 ELSE 0 END) AS c_pos,
             SUM(CASE WHEN source IN ({_NB_SRC_SQL}) THEN 0 ELSE 1 END) AS c_neg
      FROM tok GROUP BY token
    ),
    totals AS (
      SELECT CAST(SUM(c_pos) AS BIGINT) AS pos_total,
             CAST(SUM(c_neg) AS BIGINT) AS neg_total,
             count(*) AS vocab
      FROM counts
    ),
    priors AS (
      SELECT CAST(ln(CAST(SUM(CASE WHEN source IN ({_NB_SRC_SQL}) THEN 1 ELSE 0 END) AS DOUBLE)
                    / CAST(SUM(CASE WHEN source IN ({_NB_SRC_SQL}) THEN 0 ELSE 1 END) AS DOUBLE))
                  AS DECIMAL(20,9)) AS prior
      FROM documents
    ),
    per_doc AS (
      SELECT t.doc_id,
             SUM(CAST(ln((c.c_pos + CAST(1 AS DOUBLE)) / (tt.pos_total + CAST(tt.vocab AS DOUBLE)))
                    - ln((c.c_neg + CAST(1 AS DOUBLE)) / (tt.neg_total + CAST(tt.vocab AS DOUBLE)))
                  AS DECIMAL(20,9))) AS llr
      FROM tok t JOIN counts c USING (token) CROSS JOIN totals tt
      GROUP BY t.doc_id
    ),
    scored AS (
      SELECT d.doc_id, CAST(d.llr + p.prior AS DOUBLE) AS nb_score
      FROM per_doc d CROSS JOIN priors p
    ),
    labeled AS (
      SELECT s.nb_score,
             CAST(1.0 / (1.0 + EXP(-ABS(s.nb_score))) AS DECIMAL(20,9)) AS conf_dec,
             CASE WHEN (s.nb_score >= 0)
                       = (doc.source IN ({_NB_SRC_SQL})) THEN 1 ELSE 0 END AS correct
      FROM scored s
      JOIN (SELECT DISTINCT doc_id, source FROM tok) doc USING (doc_id)
    ),
    n_all AS (SELECT CAST(count(*) AS BIGINT) AS n FROM labeled),
    bins AS (
      SELECT LEAST(9, CAST(FLOOR((CAST(conf_dec AS DOUBLE) - 0.5) * 20)
                           AS BIGINT)) AS bin,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(SUM(correct) AS BIGINT) AS n_correct,
             CAST(SUM(conf_dec) AS DOUBLE) AS conf_sum
      FROM labeled GROUP BY 1
    ),
    gaps AS (
      SELECT bin, n_docs, n_correct,
             conf_sum / n_docs AS avg_conf,
             CAST(n_correct AS DOUBLE) / n_docs AS accuracy,
             ABS(CAST(n_correct AS DOUBLE) / n_docs - conf_sum / n_docs) AS gap
      FROM bins
    )
    SELECT g.bin, g.n_docs, g.n_correct, g.avg_conf, g.accuracy, g.gap,
           CAST(SUM(CAST(g.n_docs * g.gap / a.n AS DECIMAL(20,9)))
                OVER () AS DOUBLE) AS ece
    FROM gaps g CROSS JOIN n_all a
    """,
)
def ml_eval_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected Calibration Error (Guo et al. 2017) of the NB quality
    classifier — the scalar companion to the reliability curve
    (text_nb_calibration) and the isotonic recalibration entry:
    confidence of the PREDICTED class conf = σ(|score|), 10 equal
    bins over [0.5, 1], ECE = Σ (n_b/N)·|accuracy_b − avg_conf_b|.
    A well-calibrated filter can use its scores as keep-probabilities;
    a miscalibrated one needs the isotonic map — this entry is the
    number that says which.

    Exactness: per-doc confidence is rounded to DECIMAL(20,9) before
    ANY aggregation (the NB-llr precedent), so bin sums are exact
    decimal; accuracy/avg_conf are one IEEE division each; the ECE
    window-sum adds per-bin DECIMAL(20,9) contributions (order-free).
    Scan shape: the one persisted tc sliver feeds scoring AND labels
    (the text_nb_calibration lesson)."""
    from pyspark.sql import Window as W

    from .text import nb_score_with_tc

    docs = parallelize(load_table(spark, sf_dir, "documents"))
    scored_full, tc = nb_score_with_tc(docs)
    labels = tc.select("doc_id", "source").distinct()
    labeled = (
        scored_full.select("doc_id", "nb_score")
        .join(labels, "doc_id")
        .select(
            F.expr(
                "CAST(1.0 / (1.0 + EXP(-ABS(nb_score))) AS DECIMAL(20,9))"
            ).alias("conf_dec"),
            F.when(
                (F.col("nb_score") >= 0)
                == F.col("source").isin(*NB_TARGET_SOURCES),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .alias("correct"),
        )
    )
    n_all = labeled.agg(F.count(F.lit(1)).cast("long").alias("n"))
    bins = labeled.groupBy(
        F.least(
            F.lit(9),
            F.floor((F.col("conf_dec").cast("double") - 0.5) * 20).cast("long"),
        ).alias("bin")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("correct").cast("long").alias("n_correct"),
        F.sum("conf_dec").cast("double").alias("conf_sum"),
    )
    gaps = bins.select(
        "bin",
        "n_docs",
        "n_correct",
        (F.col("conf_sum") / F.col("n_docs")).alias("avg_conf"),
        (F.col("n_correct").cast("double") / F.col("n_docs")).alias("accuracy"),
        F.abs(
            F.col("n_correct").cast("double") / F.col("n_docs")
            - F.col("conf_sum") / F.col("n_docs")
        ).alias("gap"),
    )
    return gaps.crossJoin(F.broadcast(n_all)).select(
        "bin",
        "n_docs",
        "n_correct",
        "avg_conf",
        "accuracy",
        "gap",
        F.sum(
            (F.col("n_docs") * F.col("gap") / F.col("n"))
            .cast("decimal(20,9)")
        )
        .over(W.partitionBy())
        .cast("double")
        .alias("ece"),
    )


@register(
    "text_unigram_encode_trained",
    _unigram_oracle(
        UNIGRAM_EM_ROUNDS,
        UNIGRAM_MAX_PIECE,
        UNIGRAM_MIN_SEED,
        UNIGRAM_MAX_WORD,
        UNIGRAM_COST_SCALE,
        encode=True,
    ),
)
def text_unigram_encode_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENCODE the corpus with the unigram-LM vocabulary trained by
    text_unigram_lm_train — completing train+encode for the second
    tokenizer exactly as the BPE pair does: one more Viterbi pass
    under the final vocabulary's fixed-point costs, rolled up per
    document to (doc_id, n_words, n_tokens, first_tokens) — the
    text_bpe_encode_trained column contract, so both tokenizers'
    corpus footprints compare directly. The oracle extends the
    trainer's unrolled MATERIALIZED-CTE chain with the encode round
    plus the BPE-encode doc rollup shape."""
    from .text import unigram_encode

    return unigram_encode(parallelize(load_table(spark, sf_dir, "documents")))


NDCG_K = 10

# Shared eval CTE chain — tokenized docs → per-doc term frequencies →
# corpus stats → graded relevance → BM25 top-k ranking. The ndcg and
# mrr/judged-coverage oracles build on the SAME string so the ranking
# SQL cannot drift between the metrics that grade it.
_BM25_EVAL_CTES = f"""t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    d AS (
      SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
             {", ".join(f"CAST(len(list_filter(toks, x -> x = '{t}')) AS BIGINT) AS tf{i}" for i, t in enumerate(_BM25_TERMS))}
      FROM t
    ),
    s AS (
      SELECT count(*) AS n_docs,
             CAST(SUM(CAST(dl AS DECIMAL(27,0))) AS DOUBLE) / count(*) AS avgdl,
             {", ".join(f"count(*) FILTER (WHERE tf{i} > 0) AS df{i}" for i in range(len(_BM25_TERMS)))}
      FROM d
    ),
    rel AS (
      SELECT doc_id, CAST({" + ".join(f"tf{i}" for i in range(len(_BM25_TERMS)))} AS BIGINT) AS rel
      FROM d
    ),
    ranked AS (
      SELECT doc_id, bm25, ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS pos
      FROM (
        SELECT doc_id,
               CAST({" + ".join(_bm25_contrib(i) for i in range(len(_BM25_TERMS)))}
                    AS DOUBLE) AS bm25
        FROM d, s
        ORDER BY bm25 DESC, doc_id LIMIT {NDCG_K}
      ) q
    )"""


@register(
    "ml_eval_ndcg_bm25",
    f"""
    WITH {_BM25_EVAL_CTES},
    dcg AS (
      SELECT SUM(CAST(r.rel / (ln(p.pos + 1) / ln(2)) AS DECIMAL(20,9))) AS v
      FROM ranked p JOIN rel r USING (doc_id)
    ),
    ideal AS (
      SELECT rel, ROW_NUMBER() OVER (ORDER BY rel DESC, doc_id) AS pos
      FROM (SELECT doc_id, rel FROM rel ORDER BY rel DESC, doc_id LIMIT {NDCG_K}) q
    ),
    idcg AS (
      SELECT SUM(CAST(rel / (ln(pos + 1) / ln(2)) AS DECIMAL(20,9))) AS v
      FROM ideal
    )
    SELECT CAST({NDCG_K} AS BIGINT) AS k,
           CAST(d.v AS DOUBLE) AS dcg,
           CAST(i.v AS DOUBLE) AS idcg,
           CAST(d.v AS DOUBLE) / NULLIF(CAST(i.v AS DOUBLE), 0) AS ndcg
    FROM dcg d, idcg i
    """,
)
def ml_eval_ndcg_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 of the BM25 retriever — the ranking-QUALITY metric the
    retrieval family was missing (the recall reports grade candidate
    coverage; NDCG grades ORDER): graded relevance is the document's
    total query-term count (the deterministic lexical truth), gains
    linear, discount 1/log2(pos+1), ideal ranking = top-10 by
    (rel DESC, doc_id). Per-position terms round to DECIMAL(20,9)
    before the sums (the BM25 ln precedent — log2 spelled as
    ln(x)/ln(2) IDENTICALLY on both engines), so DCG/IDCG are exact
    decimal sums and NDCG is one final division.

    Scale: the BM25 scan/stats machinery (corpus never shuffles, one
    1-row stats broadcast); the two ranking windows ride 10-row
    LIMIT frames (bounded by k, not data)."""
    from pyspark.sql import Window as W

    from .text import bm25_topk, with_tokens

    docs = parallelize(load_table(spark, sf_dir, "documents"))
    terms = _BM25_TERMS
    rel = with_tokens(docs).select(
        "doc_id",
        sum(
            F.expr(f"size(filter(tokens, x -> x = '{t}'))").cast("bigint")
            for t in terms
        ).alias("rel"),
    ).persist()
    top = bm25_topk(docs, terms, k=NDCG_K).select("doc_id", "bm25")
    ranked = top.withColumn(
        "pos",
        F.row_number().over(W.orderBy(F.desc("bm25"), F.asc("doc_id"))),
    ).join(rel, "doc_id")
    disc = "CAST(rel / (ln(pos + 1) / ln(2)) AS DECIMAL(20,9))"
    dcg = ranked.agg(F.expr(f"SUM({disc})").cast("double").alias("dcg"))
    ideal = (
        rel.orderBy(F.desc("rel"), F.asc("doc_id"))
        .limit(NDCG_K)
        .withColumn(
            "pos",
            F.row_number().over(W.orderBy(F.desc("rel"), F.asc("doc_id"))),
        )
    )
    idcg = ideal.agg(F.expr(f"SUM({disc})").cast("double").alias("idcg"))
    return (
        dcg.crossJoin(F.broadcast(idcg))
        .select(
            F.lit(NDCG_K).cast("long").alias("k"),
            "dcg",
            "idcg",
            # NULLIF pins the no-term-matches corpus (idcg 0 or NULL
            # from an empty SUM) to NULL on both engines instead of
            # diverging on 0-division semantics (ADVICE r12).
            (F.col("dcg") / F.nullif(F.col("idcg"), F.lit(0.0))).alias("ndcg"),
        )
    )


@register(
    "ml_eval_mrr_bm25",
    f"""
    WITH {_BM25_EVAL_CTES}
    SELECT CAST({NDCG_K} AS BIGINT) AS k,
           n_judged,
           first_rel_pos,
           coalesce(CAST(1 AS DOUBLE) / CAST(first_rel_pos AS DOUBLE),
                    CAST(0 AS DOUBLE)) AS mrr_at_k,
           CAST(n_judged AS DOUBLE) / CAST({NDCG_K} AS DOUBLE) AS judged_at_k
    FROM (
      SELECT CAST(count(*) FILTER (WHERE r.rel > 0) AS BIGINT) AS n_judged,
             CAST(min(p.pos) FILTER (WHERE r.rel > 0) AS BIGINT)
               AS first_rel_pos
      FROM ranked p JOIN rel r USING (doc_id)
    ) q
    """,
)
def ml_eval_mrr_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MRR@10 + judged-at-k coverage of the BM25 retriever — the
    retrieval-ROBUSTNESS sibling of ml_eval_ndcg_bm25 (r12 verdict
    item 6), from the SAME one-pass ranked frame: MRR grades how
    early the first relevant document appears (1/rank of the first
    top-k hit with rel > 0, 0 if none), judged_at_k is the fraction
    of the top k with any relevance — the metric that says whether a
    low NDCG means bad ORDERING or an unjudged/empty candidate pool.
    Relevance is the deterministic lexical grade the NDCG entry
    defined (total query-term count), the ranking window rides the
    same LIMIT-k frame, and the only floats are two IEEE divisions —
    bit-equal cross-engine; the degenerate no-hits corpus pins to
    (0, NULL, 0.0) on both engines via coalesce, not a 0-division."""
    from pyspark.sql import Window as W

    from .text import bm25_topk, with_tokens

    docs = parallelize(load_table(spark, sf_dir, "documents"))
    terms = _BM25_TERMS
    rel = with_tokens(docs).select(
        "doc_id",
        sum(
            F.expr(f"size(filter(tokens, x -> x = '{t}'))").cast("bigint")
            for t in terms
        ).alias("rel"),
    )
    top = bm25_topk(docs, terms, k=NDCG_K).select("doc_id", "bm25")
    ranked = top.withColumn(
        "pos",
        F.row_number().over(W.orderBy(F.desc("bm25"), F.asc("doc_id"))),
    ).join(rel, "doc_id")
    m = ranked.agg(
        F.count(F.when(F.col("rel") > 0, F.lit(1)))
        .cast("long")
        .alias("n_judged"),
        F.min(F.when(F.col("rel") > 0, F.col("pos")))
        .cast("long")
        .alias("first_rel_pos"),
    )
    return m.select(
        F.lit(NDCG_K).cast("long").alias("k"),
        "n_judged",
        "first_rel_pos",
        F.coalesce(
            F.lit(1.0) / F.col("first_rel_pos").cast("double"), F.lit(0.0)
        ).alias("mrr_at_k"),
        (F.col("n_judged").cast("double") / F.lit(float(NDCG_K))).alias(
            "judged_at_k"
        ),
    )


# ---------------------------------------------------------------------
# split-conformal prediction — distribution-free coverage for the NB
# quality score (Vovk et al.; Papadopoulos et al. 2002 split variant)
# ---------------------------------------------------------------------

# target coverage 1−α = 9/10, kept as exact integers so the quantile
# rank k = ⌈(1−α)(n+1)⌉ = (9(n+1)+9) div 10 is the same BIGINT on both
# engines (no float ceil at any n)
_CONFORMAL_COV_NUM, _CONFORMAL_COV_DEN = 9, 10
# 1-in-5 md5 hash split: deterministic, engine-identical, and
# independent of the score (the exchangeability the guarantee needs)
_CONFORMAL_SPLIT_MOD = 5


@register(
    "ml_eval_conformal",
    f"""
    WITH {NB_SCORE_CTES},
    sc AS (
      SELECT d.doc_id,
             CAST(-(d.llr + p.prior) AS DECIMAL(20,9)) AS nonconf,
             (('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT
                % {_CONFORMAL_SPLIT_MOD} = 0) AS is_cal
      FROM per_doc d CROSS JOIN priors p
    ),
    cal AS (
      SELECT nonconf,
             ROW_NUMBER() OVER (ORDER BY nonconf, doc_id) AS rn,
             COUNT(*) OVER () AS n_cal
      FROM sc WHERE is_cal
    ),
    q AS (
      SELECT MAX(nonconf) AS qhat FROM cal
      WHERE rn = ({_CONFORMAL_COV_NUM} * (n_cal + 1) + {_CONFORMAL_COV_DEN - 1})
                   // {_CONFORMAL_COV_DEN}
    ),
    caln AS (SELECT CAST(count(*) AS BIGINT) AS n_cal FROM sc WHERE is_cal),
    cov AS (
      SELECT CAST(count(*) AS BIGINT) AS n_test,
             CAST(coalesce(SUM(CASE WHEN q.qhat IS NULL OR s.nonconf <= q.qhat
                                    THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_covered,
             MAX(q.qhat) AS qhat
      FROM sc s CROSS JOIN q WHERE NOT s.is_cal
    )
    SELECT c.n_cal,
           CAST(({_CONFORMAL_COV_NUM} * (c.n_cal + 1) + {_CONFORMAL_COV_DEN - 1})
                  // {_CONFORMAL_COV_DEN} AS BIGINT) AS k_rank,
           v.qhat, v.n_test, v.n_covered,
           CAST(v.n_covered AS DOUBLE) / NULLIF(CAST(v.n_test AS DOUBLE), 0) AS coverage
    FROM caln c CROSS JOIN cov v
    """,
)
def ml_eval_conformal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction for the NB quality score — the eval
    family's distribution-free calibration-guarantee member (AUC/ECE/
    isotonic measure fit; this one GUARANTEES marginal coverage):
    nonconformity = −nb_score on an md5 hash-split calibration sliver
    (1 in 5 docs), q̂ = the ⌈(1−α)(n_cal+1)⌉-th smallest nonconformity
    (α = 1/10 — the finite-sample-corrected empirical quantile), and a
    test doc is COVERED iff −nb_score ≤ q̂. Exchangeability of the
    hash split gives P(covered) ≥ 1−α with no distributional
    assumption (Vovk; Papadopoulos 2002; Angelopoulos & Bates 2023
    tutorial form).

    Hash-oracle friendly by construction: nonconformity is the exact
    DECIMAL(20,9) NB score negated — taken from the score's exact
    decimal (nb_quality_score_dec), never round-tripped through the
    double (the r14 driver hash-fail: CAST(double AS DECIMAL) is
    engine-divergent and the oracle side never did it) — the quantile
    rank is pure integer arithmetic, q̂ is an exact decimal, coverage
    flags are integers, and the one division at the end is a single
    IEEE op. n_cal < 9
    makes k_rank > n_cal → q̂ NULL → everything covered (q̂ = +∞, the
    conformal convention for an undersized calibration set).

    Scale: the corpus-sized work is the shared NB scoring plan; the
    calibration sliver ranks via the two-pass global ranking (no
    unpartitioned window over data); q̂ broadcasts back as a 1-row
    frame (the bm25-stats contract)."""
    from .dedup import md5_hash60
    from .ranking import with_global_ranks
    from .text import nb_quality_score_dec

    docs = parallelize(load_table(spark, sf_dir, "documents"))
    h = md5_hash60(F.col("doc_id").cast("string"))
    base = (
        # EXACT-decimal score (r15 driver hash-parity fix): the oracle
        # computes nonconf = CAST(-(llr + prior) AS DECIMAL(20,9))
        # straight from exact decimals, but this side used to re-round
        # the nb_score DOUBLE back to DECIMAL(20,9) — an asymmetric
        # chain through the engine-divergent double→decimal cast
        # (registry hazard; the r14 CORRECTNESS hash_match=false).
        # nb_score_dec IS the oracle's exact decimal, so both engines
        # now run the identical exact chain; negation of a scale-9
        # decimal is exact, so values equal the oracle's by
        # construction (and equal the old output everywhere the old
        # round-trip happened to be lossless).
        nb_quality_score_dec(docs)
        .select(
            "doc_id",
            (-F.col("nb_score_dec")).cast("decimal(20,9)").alias("nonconf"),
            (h % _CONFORMAL_SPLIT_MOD == 0).alias("is_cal"),
        )
        # narrow persisted projection: ranked (cal) and coverage (test)
        # both read it, and the NB scoring plan above is the expensive
        # part worth computing once
        .persist()
    )
    k_of = (
        f"CAST(({_CONFORMAL_COV_NUM} * (n_cal + 1) + {_CONFORMAL_COV_DEN - 1})"
        f" DIV {_CONFORMAL_COV_DEN} AS BIGINT)"
    )
    ranked = with_global_ranks(
        base.where(F.col("is_cal")).select("nonconf", "doc_id"),
        key_order=[("nonconf", "asc")],
        tie_order=[("doc_id", "asc")],
    )
    qhat = (
        ranked.withColumnRenamed("n_total", "n_cal")
        .where(F.col("rn") == F.expr(k_of))
        .agg(F.max("nonconf").alias("qhat"))  # 1 row, NULL when k>n_cal
    )
    caln = base.where(F.col("is_cal")).agg(
        F.count(F.lit(1)).cast("long").alias("n_cal")
    )
    cov = (
        base.where(~F.col("is_cal"))
        .crossJoin(F.broadcast(qhat))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("qhat").isNull()
                        | (F.col("nonconf") <= F.col("qhat")),
                        1,
                    ).otherwise(0)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("n_covered"),
            F.max("qhat").alias("qhat"),
        )
    )
    return caln.crossJoin(F.broadcast(cov)).select(
        "n_cal",
        F.expr(k_of).alias("k_rank"),
        "qhat",
        "n_test",
        "n_covered",
        (
            F.col("n_covered").cast("double")
            / F.nullif(F.col("n_test").cast("double"), F.lit(0.0))
        ).alias("coverage"),
    )
