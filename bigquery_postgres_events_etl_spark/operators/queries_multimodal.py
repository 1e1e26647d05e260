"""Oracle-checked multimodal queries (binary-column plumbing over the
``documents`` fixture — text payloads as opaque utf-8 bytes)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register
from .multimodal import documents_as_media, extract_binary_features, sample_video_frames

_CHUNK = 64


@register(
    "multimodal_binary_stats",
    f"""
    SELECT doc_id AS media_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS payload_md5,
           CAST(ceil(octet_length(encode(text)) / {_CHUNK}.0) AS BIGINT) AS n_chunks
    FROM documents
    """,
)
def multimodal_binary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata pass over opaque payloads: size, digest, chunk
    plan — all JVM-side, payload bytes never leave the executor."""
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    return media.select(
        "media_id",
        "n_bytes",
        F.md5("payload").alias("payload_md5"),
        F.ceil(F.col("n_bytes") / F.lit(float(_CHUNK))).cast("long").alias("n_chunks"),
    )


@register(
    "multimodal_feature_extract",
    """
    WITH chars AS (
      SELECT doc_id AS media_id,
             octet_length(encode(text)) AS n_bytes,
             list_sum(list_transform(generate_series(1, length(text)),
                                     i -> ord(substr(text, i, 1)))) AS byte_sum,
             ord(substr(text, 1, 1)) AS first_byte,
             ord(substr(text, length(text), 1)) AS last_byte
      FROM documents
    )
    SELECT media_id, n_bytes,
           CAST(byte_sum AS BIGINT) AS byte_sum,
           CAST(first_byte AS INTEGER) AS first_byte,
           CAST(last_byte AS INTEGER) AS last_byte
    FROM chars
    """,
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas feature extraction (the one
    deliberately-Pandas operator: stand-in for a codec/embedding
    model). Oracle = per-char codepoint sums (fixture text is ASCII,
    so codepoints == utf-8 bytes) — validates the batch plumbing
    produces exactly the per-row values."""
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    return extract_binary_features(media)


@register(
    "multimodal_frame_sample",
    f"""
    WITH m AS (SELECT doc_id AS media_id, octet_length(encode(text)) AS n_bytes
               FROM documents)
    SELECT media_id,
           CAST(i AS INTEGER) AS frame_idx,
           CAST(i * {_CHUNK} AS INTEGER) AS byte_offset
    FROM m, unnest(generate_series(0, greatest(CAST(n_bytes // {_CHUNK} AS INTEGER) - 1, 0))) t(i)
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling explode shape (stub codec): one row per sampled
    byte offset per payload."""
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    df = sample_video_frames(media, every_n_bytes=_CHUNK)
    return df.select(
        "media_id",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        F.col("byte_offset").cast("int").alias("byte_offset"),
    )


@register(
    "multimodal_image_resize",
    """
    WITH decoded AS (
      SELECT doc_id AS media_id,
             octet_length(encode(text)) % 640 + 16 AS width,
             octet_length(encode(text)) % 480 + 16 AS height
      FROM documents
    )
    SELECT media_id,
           CAST(width AS INTEGER) AS width,
           CAST(height AS INTEGER) AS height,
           CAST(CASE WHEN width * 224 >= height * 224
                     THEN least(width, 224)
                     ELSE width * least(height, 224) // height END AS INTEGER) AS out_width,
           CAST(CASE WHEN width * 224 >= height * 224
                     THEN height * least(width, 224) // width
                     ELSE least(height, 224) END AS INTEGER) AS out_height,
           (CASE WHEN width * 224 >= height * 224
                 THEN least(width, 224)
                 ELSE width * least(height, 224) // height END < width)
           OR
           (CASE WHEN width * 224 >= height * 224
                 THEN height * least(width, 224) // width
                 ELSE least(height, 224) END < height) AS downscaled
    FROM decoded
    """,
)
def multimodal_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize planning over decoded image metadata: fit-within-224²
    target dims in pure integer arithmetic (binding dimension by
    cross-multiplication, scaled edge by exact integer division) —
    map-side column math; the payload only meets a codec in the
    executor-side ``resize_images`` kernel (optional-Pillow, stubbed
    here like decode). Uses the deterministic fake decode so the
    oracle can mirror the dims from byte lengths."""
    from .multimodal import fake_decode_images, plan_resize

    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    return plan_resize(fake_decode_images(media))


@register(
    "multimodal_audio_resample",
    """
    WITH dec AS (
      SELECT doc_id AS media_id,
             octet_length(encode(text)) AS n_in,
             list_aggregate(list_transform(
               generate_series(1, length(text), 4), i -> substr(text, i, 1)
             ), 'string_agg', '') AS decimated
      FROM documents
    )
    SELECT media_id,
           CAST(n_in AS BIGINT) AS n_samples_in,
           CAST(length(decimated) AS BIGINT) AS n_samples_out,
           CAST(length(decimated) AS BIGINT) AS n_bytes_out,
           md5(decimated) AS resampled_md5
    FROM dec
    """,
)
def multimodal_audio_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-resample stub over the byte envelope: 4× decimation of
    the payload (8-bit-PCM stand-in) inside an Arrow batch; the
    oracle reproduces the decimated stream character-wise (fixture
    text is ASCII, so bytes == codepoints) and both engines md5 the
    result — validating the exact bytes the kernel emitted, not just
    counts."""
    from .multimodal import resample_audio

    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    return resample_audio(media, decimation=4)


@register(
    "multimodal_content_dedup",
    """
    WITH digests AS (
      SELECT doc_id AS media_id, md5(text) AS payload_md5,
             octet_length(encode(text)) AS n_bytes
      FROM documents
    )
    SELECT payload_md5,
           count(*) AS n_copies,
           min(media_id) AS canonical_id,
           min(n_bytes) AS n_bytes
    FROM digests
    GROUP BY payload_md5
    """,
)
def multimodal_content_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact media dedup by content digest — the image/audio twin of
    dedup_exact (how production pipelines drop byte-identical assets
    re-crawled under different URLs, and the first pass of any
    filter-list check): digest computed JVM-side per payload, ONE
    hash-aggregated shuffle of (digest, id, size) slivers — payload
    bytes never shuffle. Canonical survivor = smallest id; groups with
    n_copies > 1 are the deletion set (this corpus has none — the
    near-dup tiers exist for exactly that reason — so the full digest
    report is returned rather than an empty dup list)."""
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    return (
        media.select(
            "media_id", F.md5("payload").alias("payload_md5"), "n_bytes"
        )
        .groupBy("payload_md5")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("media_id").alias("canonical_id"),
            F.min("n_bytes").alias("n_bytes"),
        )
    )


# DuckDB twin of the byte-bigram perceptual-hash kernel
# (operators.multimodal.perceptual_hash, the deterministic no-codec
# path that ALWAYS runs on these text/plain payloads — PIL, even when
# importable, cannot decode them, so the kernel choice is stable):
# bigram g = byte[i]*31 + byte[i+1]; bucket = (g*2654435761)>>20 & 63;
# bit b set iff votes[b] > n/64 — compared as 64*votes > n, exactly
# the kernel's float compare because n/64.0 is a power-of-2 division
# (lossless in IEEE for n < 2^53). Byte access via ascii(substr(..))
# is valid because the fixture text is pure ASCII (verified at all
# three sf fixtures; a multibyte corpus would need a blob-indexing
# twin). Bit 63 assembles as the two's-complement negative, matching
# _SIMHASH_CTE's convention. All arithmetic stays < 2^45 — bit-equal
# int64 on both engines.
_PHASH_SIM_CTE = """
bg AS (
  SELECT doc_id AS media_id,
         unnest(list_transform(generate_series(1, length(text) - 1),
                i -> ascii(substr(text, i, 1)) * 31 + ascii(substr(text, i + 1, 1)))) AS g
  FROM documents WHERE length(text) >= 2
),
bk AS (SELECT media_id, ((g * 2654435761) >> 20) & 63 AS b FROM bg),
votes AS (SELECT media_id, b, count(*) AS c FROM bk GROUP BY 1, 2),
tot AS (SELECT media_id, count(*) AS n FROM bk GROUP BY 1),
bits AS (
  SELECT v.media_id, v.b FROM votes v JOIN tot t USING (media_id)
  WHERE v.c * 64 > t.n
),
sim0 AS (
  SELECT media_id,
         CAST(SUM(CASE WHEN b = 63 THEN -9223372036854775807 - 1
                       ELSE (1::BIGINT << b) END) AS BIGINT) AS phash
  FROM bits GROUP BY media_id
),
sim AS (
  -- NULL text is EXCLUDED, not coalesced: the kernel returns NULL
  -- phash for a NULL payload and the banding drops it; only
  -- non-null-but-short texts (len < 2, no bigrams) take the kernel's
  -- explicit phash = 0
  SELECT d.doc_id AS media_id, COALESCE(s.phash, 0) AS phash
  FROM documents d LEFT JOIN sim0 s ON s.media_id = d.doc_id
  WHERE d.text IS NOT NULL
)
"""

# pigeonhole banding twin of dedup.hamming_band_pairs(max_hamming=6,
# max_bucket=256): 7 chunks x 9 bits, hot-bucket valve INCLUDED (the
# valve is part of the registered output, not an approximation), then
# the exact bit_count verify. `p` carries the signatures + hamming so
# ONE fragment serves both the pairs entry (selects them) and the
# cluster entry (closure uses only a, b).
_PHASH_PAIRS_P_CTE = _PHASH_SIM_CTE + """,
ch AS (
  SELECT media_id, phash, c, (phash >> (c * 9)) & 511 AS chunk_val
  FROM sim CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS c) cs
),
bucketed AS (SELECT c, chunk_val, count(*) AS nb FROM ch GROUP BY 1, 2),
ok AS (
  SELECT ch.media_id, ch.phash, ch.c, ch.chunk_val
  FROM ch JOIN bucketed b ON b.c = ch.c AND b.chunk_val = ch.chunk_val
  WHERE b.nb BETWEEN 2 AND 256
),
p AS (
  SELECT DISTINCT x.media_id AS a, y.media_id AS b,
         x.phash AS pa, y.phash AS pb,
         CAST(bit_count(xor(x.phash, y.phash)) AS INTEGER) AS hamming
  FROM ok x JOIN ok y
    ON x.c = y.c AND x.chunk_val = y.chunk_val AND x.media_id < y.media_id
  WHERE bit_count(xor(x.phash, y.phash)) <= 6
)
"""


@register(
    "multimodal_phash_near_dup",
    "WITH " + _PHASH_PAIRS_P_CTE + """
    SELECT a AS media_a, b AS media_b, pa AS phash_a, pb AS phash_b, hamming
    FROM p
    """,
)
def multimodal_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-duplicate media pairs — the NEAR-dup twin
    of multimodal_content_dedup (dHash under a real image codec; a
    locality-sensitive byte-bigram signature over these text payloads,
    see multimodal.perceptual_hash): 64-bit signature per payload,
    then the generic pigeonhole Hamming banding shared with the text
    SimHash tier (7×9-bit chunks, hot-bucket valve at 256). The
    DuckDB oracle recomputes signature, banding, valve, and the exact
    bit_count verify (same bit-equality argument as the cluster
    entry's _PHASH_SIM_CTE); locality + exact-dup-superset properties
    are additionally pytest-pinned."""
    from .multimodal import phash_near_pairs

    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    return phash_near_pairs(media, max_hamming=6)


def _phash_cluster_oracle_sql() -> str:
    from .queries_dedup import _CLOSURE_FROM_P_CTE

    return (
        "WITH RECURSIVE "
        + _PHASH_PAIRS_P_CTE
        + _CLOSURE_FROM_P_CTE
        + """
    SELECT c.node AS media_id, c.cid AS cluster_id,
           CAST(s.n AS BIGINT) AS cluster_size,
           (c.node = c.cid) AS is_canonical
    FROM comp c JOIN sz s ON s.cid = c.cid
    """
    )


@register("multimodal_phash_clusters", _phash_cluster_oracle_sql())
def multimodal_phash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media near-dup CLUSTER resolution: perceptual-hash pairs →
    connected components → (media_id, cluster_id, cluster_size,
    is_canonical) — the deletion step for near-duplicate media, built
    from the SAME pointer-jumping machinery as the text dedup
    clusters (operators/cluster.py; union-find-oracle-pinned there).
    Keeping is_canonical=true rows is the dedup action. The oracle
    recomputes the whole path — byte-bigram phash, pigeonhole banding
    WITH the hot-bucket valve, recursive min-reachability closure —
    in DuckDB SQL (see _PHASH_SIM_CTE for the bit-equality argument),
    so the driver hash-checks the fixpoint even though the Spark side
    iterates."""
    from pyspark.sql import functions as F

    from .cluster import dup_clusters
    from .multimodal import phash_near_pairs

    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    pairs = phash_near_pairs(media, max_hamming=6).select(
        F.col("media_a").alias("doc_a"), F.col("media_b").alias("doc_b")
    )
    return dup_clusters(pairs).select(
        F.col("doc_id").alias("media_id"),
        "cluster_id",
        "cluster_size",
        "is_canonical",
    )


@register(
    "multimodal_bmp_resize_real",
    """
    WITH m AS (
      SELECT doc_id AS media_id,
             doc_id % 37 + 4 AS w, doc_id % 29 + 4 AS h
      FROM documents
    ),
    p AS (
      SELECT media_id, w, h,
             CASE WHEN w >= h THEN least(w, 16)
                  ELSE (w * least(h, 16)) // h END AS ow,
             CASE WHEN w >= h THEN (h * least(w, 16)) // w
                  ELSE least(h, 16) END AS oh
      FROM m
    )
    SELECT media_id,
           CAST(ow AS INTEGER) AS out_width,
           CAST(oh AS INTEGER) AS out_height,
           CAST(54 + oh * (((ow * 3 + 3) // 4) * 4) AS BIGINT) AS n_bytes_out
    FROM p
    """,
)
def multimodal_bmp_resize_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode → resize → re-encode as a registry entry: a
    deterministic 24-bit BMP per document (multimodal.
    synthesize_bmp_media — dims and gradient pixels pure functions of
    doc_id) flows through the stdlib codec's Arrow-batched resize
    kernel (resize_images, max 16×16). The oracle recomputes the
    geometry invariants the kernel must satisfy — integer
    aspect-preserving output dims (w>=h ⟺ w·16 >= h·16 is the
    width-bound test at a square box) and the exact BMP file size
    (54-byte header + height × 4-padded row stride) — so the driver
    hash-checks that real pixel bytes went through a real encoder of
    the planned geometry. The pixel CONTENT is pinned by the
    md5-pinned pytest (oracle SQL cannot run a codec); this entry
    pins the codec's observable contract cross-engine.

    Scale: synthesis and resize are both map-side mapInPandas — no
    shuffle at any size; payloads are bounded (≤ 40×32×3 bytes)."""
    from .multimodal import resize_images, synthesize_bmp_media

    media = synthesize_bmp_media(load_table(spark, sf_dir, "documents"))
    return resize_images(media, max_w=16, max_h=16).select(
        "media_id", "out_width", "out_height", "n_bytes_out"
    )


@register(
    "multimodal_wav_resample_real",
    """
    WITH m AS (
      SELECT doc_id AS media_id,
             doc_id % 97 + 20 AS n_in,
             doc_id % 2 + 1 AS ch
      FROM documents
    )
    SELECT media_id,
           CAST(n_in AS BIGINT) AS n_frames_in,
           CAST((n_in + 3) // 4 AS BIGINT) AS n_frames_out,
           CAST(44 + ((n_in + 3) // 4) * ch * 2 AS BIGINT) AS n_bytes_out
    FROM m
    """,
)
def multimodal_wav_resample_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode → decimate → re-encode as a registry entry —
    the audio twin of multimodal_bmp_resize_real: a deterministic PCM
    WAV per document (multimodal.synthesize_wav_media) flows through
    the stdlib wave codec in resample_audio (every 4th frame kept,
    valid WAV out at framerate/4). The oracle recomputes the codec's
    observable contract in closed form — frame counts and the exact
    output container size (44-byte PCM header + frames × channels ×
    2 bytes) measured from the REAL re-encoded bytes — so the driver
    hash-checks that real audio frames went through a real encoder;
    the container bytes themselves are md5-pinned in pytest (SQL
    cannot run a codec). Map-side, no shuffle at any scale."""
    from .multimodal import resample_audio, synthesize_wav_media

    media = synthesize_wav_media(load_table(spark, sf_dir, "documents"))
    return resample_audio(media, decimation=4).select(
        "media_id",
        F.col("n_samples_in").alias("n_frames_in"),
        F.col("n_samples_out").alias("n_frames_out"),
        "n_bytes_out",
    )


@register(
    "multimodal_bmp_dhash_real",
    """
    WITH g AS (SELECT doc_id AS media_id, doc_id % 37 + 4 AS w,
                      doc_id % 29 + 4 AS h
               FROM documents),
    cells AS (
      SELECT media_id, w, h, oy, ox
      FROM g
      CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS oy) a
      CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS ox) b
    ),
    lums AS (
      SELECT media_id, oy * 8 + ox AS i,
        (299 * ((((ox * w) // 9) * 7 + media_id) % 256)
         + 587 * ((((oy * h) // 8) * 11 + 3 * media_id) % 256)
         + 114 * ((((oy * h) // 8) * ((ox * w) // 9) + 5 * media_id) % 256))
          // 1000 AS l0,
        (299 * (((((ox + 1) * w) // 9) * 7 + media_id) % 256)
         + 587 * ((((oy * h) // 8) * 11 + 3 * media_id) % 256)
         + 114 * ((((oy * h) // 8) * (((ox + 1) * w) // 9) + 5 * media_id) % 256))
          // 1000 AS l1
      FROM cells
    )
    SELECT media_id,
      CAST(SUM(CASE WHEN l1 > l0 THEN
          CASE WHEN i = 63 THEN -9223372036854775807 - 1
               ELSE (1::BIGINT << i) END
        ELSE 0 END) AS BIGINT) AS phash
    FROM lums GROUP BY media_id
    """,
)
def multimodal_bmp_dhash_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL perceptual dHash, hash-checked at the PIXEL level: a
    deterministic BMP per document flows through the full codec
    kernel — decode → integer ITU-R 601 grayscale → 9×8
    nearest-neighbor resize → horizontal-gradient bits — and the
    DuckDB oracle recomputes the IDENTICAL 64-bit fingerprint in
    closed form (every stage is integer arithmetic over the
    synthesized gradient: resize index = (i·dim)//out, luma =
    (299R+587G+114B)//1000, bit i = luma(ox+1) > luma(ox), bit 63 as
    the two's-complement sign). Where multimodal_bmp_resize_real pins
    the codec's geometry contract, this entry pins its pixel
    semantics cross-engine — the strongest oracle a codec kernel can
    carry. Map-side mapInPandas; one 8-byte signature per payload, no
    shuffle (the pairing stage is the banded phash tier)."""
    from .multimodal import perceptual_hash, synthesize_bmp_media

    media = synthesize_bmp_media(load_table(spark, sf_dir, "documents"))
    return perceptual_hash(media, codec="stdlib")
