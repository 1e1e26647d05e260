"""Multimodal column handling: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark-side plumbing is real and tested — schemas, Arrow-batched
``mapInPandas`` operators, partition-aware batch shapes. The actual
codec calls (image decode, audio resample, video frame-sample) are
STUBBED: the container has no image/audio libraries, so each stub
either raises ``NotImplementedError`` (documented) or computes a
deterministic fake feature so the distributed pipeline around it can
be exercised end-to-end.

Design for 100 TB of media:
- binary payloads stay opaque until the last possible operator —
  filters/joins run on the typed *metadata* columns, so Catalyst
  prunes and pushes down without touching bytes;
- decode/feature-extract are ``mapInPandas`` (one Arrow batch in →
  one out, no per-row pickling) and scale by partition count;
- partition sizing: media rows are MBs — `maxPartitionBytes` and
  explicit repartition on ingest keep one batch within executor
  memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Typed metadata envelope for an opaque media payload.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("mime", T.StringType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("byte_sum", T.LongType(), True),
        T.StructField("first_byte", T.IntegerType(), True),
        T.StructField("last_byte", T.IntegerType(), True),
    ]
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Fixture adapter: treat document text payloads as opaque binary
    media (utf-8 bytes) so the binary pipeline is exercisable on the
    driver-provided tables without synthesizing data."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text").alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
        F.octet_length(F.encode("text", "utf-8")).cast("long").alias("n_bytes"),
        F.lit("text/plain").alias("mime"),
    )


def extract_binary_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over opaque payloads.

    This is the *real* plumbing an image featurizer would use: one
    pandas batch of binary payloads in, one batch of fixed-width
    features out, vectorized inside the batch. The feature here
    (byte stats) is a deterministic stand-in for an embedding model.
    """

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payloads = pdf["payload"]
            n = payloads.map(lambda b: len(b) if b is not None else 0)
            byte_sum = payloads.map(
                lambda b: int(np.frombuffer(b, dtype=np.uint8).sum()) if b else 0
            )
            first = payloads.map(lambda b: int(b[0]) if b else None)
            last = payloads.map(lambda b: int(b[-1]) if b else None)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": n.astype("int64"),
                    "byte_sum": byte_sum.astype("int64"),
                    "first_byte": first,
                    "last_byte": last,
                }
            )

    return media.mapInPandas(featurize, schema=FEATURE_SCHEMA)


# ---------------------------------------------------------------------
# Codec boundaries. Resolution order on the EXECUTOR (where decode
# runs): Pillow if importable (full format coverage), else the
# pure-stdlib 24-bit BMP codec (bmpcodec.StdlibBmpModule — REAL pixel
# decode/resize/re-encode for BMP payloads, md5-pinned in tests), else
# a NotImplementedError naming both escape hatches. Only formats the
# stdlib cannot honestly decode (JPEG/PNG entropy coding) remain
# Pillow-gated.
# ---------------------------------------------------------------------


def _resolve_image_module():
    """Executor-side codec resolution: PIL.Image when installed, the
    stdlib BMP module otherwise (never None — a decode of a format the
    active codec can't parse raises ValueError at the payload)."""
    pil = _try_import_pil()
    if pil is not None:
        return pil
    from .bmpcodec import StdlibBmpModule

    return StdlibBmpModule


_NO_CODEC_HINT = (
    "payload is not an uncompressed 24-bit BMP and Pillow is not "
    "installed on the executors: the stdlib codec owns BMP only — "
    "pip install pillow for JPEG/PNG, or use the fake_* twin for "
    "codec-less pipeline tests"
)


def _is_stdlib_codec(image_module) -> bool:
    from .bmpcodec import StdlibBmpModule

    return image_module is StdlibBmpModule


DECODED_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
    ]
)


def _decode_image_batch(pdf: pd.DataFrame, image_module) -> pd.DataFrame:
    """One Arrow batch of payloads → (media_id, width, height,
    channels), decoding with ``image_module`` (PIL.Image or an
    API-compatible substitute). Factored out of the mapInPandas
    closure so the decode logic is unit-testable without a real codec
    in the environment."""
    import io

    widths, heights, channels = [], [], []
    for b in pdf["payload"]:
        if b is None:
            widths.append(None), heights.append(None), channels.append(None)
            continue
        img = image_module.open(io.BytesIO(b))
        w, h = img.size
        widths.append(w), heights.append(h)
        channels.append(len(img.getbands()))
    return pd.DataFrame(
        {
            "media_id": pdf["media_id"],
            "width": pd.array(widths, dtype="Int32"),
            "height": pd.array(heights, dtype="Int32"),
            "channels": pd.array(channels, dtype="Int32"),
        }
    )


def decode_images(media: DataFrame) -> DataFrame:
    """Real image decode, Arrow-batched: ``PIL.Image.open`` per
    payload where Pillow is installed, the pure-stdlib BMP codec
    otherwise (real pixels either way for BMP payloads; other formats
    without Pillow raise ``NotImplementedError`` pointing at
    ``fake_decode_images``). The ``mapInPandas`` shape, schema, and
    batch flow are identical in both regimes — only the codec import
    differs, and it is resolved on the *executor* (where the decode
    runs), not the driver."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        image_module = _resolve_image_module()
        for pdf in batches:
            try:
                yield _decode_image_batch(pdf, image_module)
            except ValueError as e:
                # only the STDLIB codec's can't-parse error means "the
                # environment lacks a codec for this format"; a
                # ValueError out of an installed Pillow is a real
                # decode failure and must surface as itself
                if _is_stdlib_codec(image_module):
                    raise NotImplementedError(_NO_CODEC_HINT) from e
                raise

    return media.mapInPandas(_decode, schema=DECODED_IMAGE_SCHEMA)


def fake_decode_images(media: DataFrame) -> DataFrame:
    """Deterministic fake decode for pipeline tests: derives plausible
    (width, height, channels) from byte stats so downstream operators
    (resize planning, aspect filters) can run end-to-end."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf["payload"].map(lambda b: len(b) if b is not None else 0)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": (n % 640 + 16).astype("int32"),
                    "height": (n % 480 + 16).astype("int32"),
                    "channels": pd.Series([3] * len(pdf), dtype="int32"),
                }
            )

    return media.mapInPandas(_decode, schema=DECODED_IMAGE_SCHEMA)


def sample_video_frames(media: DataFrame, every_n_bytes: int = 1024) -> DataFrame:
    """STUB — video frame sampling (ffmpeg in production). Emits one
    row per sampled offset: the explode-shaped output a real frame
    sampler produces, with payload slices standing in for frames."""
    return (
        media.withColumn(
            "frame_offsets",
            F.expr(
                f"transform(sequence(0, greatest(int(n_bytes / {every_n_bytes}) - 1, 0)),"
                f" i -> i * {every_n_bytes})"
            ),
        )
        .select(
            "media_id",
            F.posexplode("frame_offsets").alias("frame_idx", "byte_offset"),
        )
    )


def synthesize_bmp_media(docs: DataFrame) -> DataFrame:
    """Deterministic real-image fixture: one small 24-bit BMP per
    document, dimensions and gradient pixels pure functions of
    ``doc_id`` (w = id%37+4, h = id%29+4; pixel (x,y) =
    ((7x+id)%256, (11y+3id)%256, (xy+5id)%256)). Arrow-batched
    ``mapInPandas`` over the stdlib encoder — REAL encoded pixel
    bytes flowing through the same binary envelope as
    ``documents_as_media``, so the codec kernels are exercisable as
    registry entries, not only in pytest. Map-side, no shuffle;
    payload ≤ ~5 KB per row."""

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from .bmpcodec import encode_bmp

        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = did % 37 + 4, did % 29 + 4
                x = np.arange(w, dtype=np.int64)
                y = np.arange(h, dtype=np.int64)
                px = np.empty((h, w, 3), dtype=np.uint8)
                px[:, :, 0] = ((x * 7 + did) % 256)[None, :]
                px[:, :, 1] = ((y * 11 + 3 * did) % 256)[:, None]
                px[:, :, 2] = (y[:, None] * x[None, :] + 5 * did) % 256
                payloads.append(encode_bmp(w, h, px.tobytes()))
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    return docs.select("doc_id").mapInPandas(
        synth, schema="media_id BIGINT, payload BINARY"
    )


def plan_resize(decoded: DataFrame, max_w: int = 224, max_h: int = 224) -> DataFrame:
    """Resize planning: target dimensions fitting each image into a
    ``max_w`` × ``max_h`` box, aspect preserved, never upscaled — in
    PURE INTEGER arithmetic (the binding dimension is chosen by
    comparing w·max_h vs h·max_w, the scaled edge by exact integer
    division), so the plan is bit-identical across engines and the
    whole operator is map-side column math on the metadata: the
    payload bytes are untouched until the executor-side resize kernel
    below consumes the plan.
    """
    w = F.col("width").cast("long")
    h = F.col("height").cast("long")
    width_bound = (w * max_h) >= (h * max_w)
    w_capped = F.least(w, F.lit(max_w).cast("long"))
    h_capped = F.least(h, F.lit(max_h).cast("long"))
    out_w = F.when(width_bound, w_capped).otherwise(
        F.expr(f"width * least(height, {max_h}) div height")
    )
    out_h = F.when(width_bound, F.expr(f"height * least(width, {max_w}) div width")).otherwise(
        h_capped
    )
    return decoded.select(
        "media_id",
        "width",
        "height",
        out_w.cast("int").alias("out_width"),
        out_h.cast("int").alias("out_height"),
        ((out_w < w) | (out_h < h)).alias("downscaled"),
    )


def resize_images(media: DataFrame, max_w: int = 224, max_h: int = 224) -> DataFrame:
    """Executor-side image resize behind the same codec resolution as
    :func:`decode_images`: ``Image.resize`` under Pillow, the stdlib
    BMP codec's integer nearest-neighbor kernel otherwise — REAL
    decode → resize → re-encode on real pixel bytes in both regimes
    for BMP payloads (md5-pinned in tests); non-BMP payloads without
    Pillow raise ``NotImplementedError`` pointing at the fake twin.
    Output carries the resized payload re-encoded plus its byte count
    — the shape a thumbnailing / model-input stage needs.
    """
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("out_width", T.IntegerType(), True),
            T.StructField("out_height", T.IntegerType(), True),
            T.StructField("resized", T.BinaryType(), True),
            T.StructField("n_bytes_out", T.LongType(), True),
        ]
    )

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        image_module = _resolve_image_module()
        import io

        for pdf in batches:
            ids, ows, ohs, blobs, sizes = [], [], [], [], []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                ids.append(mid)
                if b is None:
                    ows.append(None), ohs.append(None)
                    blobs.append(None), sizes.append(None)
                    continue
                try:
                    img = image_module.open(io.BytesIO(b))
                except ValueError as e:
                    # see decode_images: remap ONLY the stdlib codec's
                    # can't-parse error; Pillow's own ValueErrors are
                    # real decode failures
                    if _is_stdlib_codec(image_module):
                        raise NotImplementedError(_NO_CODEC_HINT) from e
                    raise
                w, h = img.size
                if w * max_h >= h * max_w:
                    ow = min(w, max_w)
                    oh = h * min(w, max_w) // w
                else:
                    oh = min(h, max_h)
                    ow = w * min(h, max_h) // h
                out = img.resize((max(ow, 1), max(oh, 1)))
                buf = io.BytesIO()
                out.save(buf, format=img.format or "PNG")
                blob = buf.getvalue()
                ows.append(ow), ohs.append(oh)
                blobs.append(blob), sizes.append(len(blob))
            yield pd.DataFrame(
                {
                    "media_id": pd.array(ids, dtype="int64"),
                    "out_width": pd.array(ows, dtype="Int32"),
                    "out_height": pd.array(ohs, dtype="Int32"),
                    "resized": blobs,
                    "n_bytes_out": pd.array(sizes, dtype="Int64"),
                }
            )

    return media.mapInPandas(_resize, schema=schema)


def synthesize_wav_media(docs: DataFrame) -> DataFrame:
    """Deterministic real-audio fixture: one PCM WAV per document
    (frames = id%97+20, channels = id%2+1, 16-bit @ 8 kHz; sample
    (t, c) = ((t·(id%31+3) + 7c + id) mod 65536) − 32768 — integer
    waveform, no float hazard), encoded with the stdlib ``wave``
    module. The audio twin of :func:`synthesize_bmp_media`: real
    container bytes flowing through the binary envelope so the audio
    kernel is exercisable as a registry entry. Map-side, no shuffle."""

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave

        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                frames, channels = did % 97 + 20, did % 2 + 1
                step = did % 31 + 3
                pcm = bytearray()
                for t in range(frames):
                    for c in range(channels):
                        v = ((t * step + c * 7 + did) % 65536) - 32768
                        pcm += int(v).to_bytes(2, "little", signed=True)
                buf = io.BytesIO()
                w = wave.open(buf, "wb")
                w.setnchannels(channels)
                w.setsampwidth(2)
                w.setframerate(8000)
                w.writeframes(bytes(pcm))
                w.close()
                payloads.append(buf.getvalue())
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    return docs.select("doc_id").mapInPandas(
        synth, schema="media_id BIGINT, payload BINARY"
    )


def resample_audio(media: DataFrame, decimation: int = 4) -> DataFrame:
    """Audio resampling with a REAL stdlib container codec for WAV:
    payloads that parse as RIFF/PCM WAV (``wave`` module — strict
    header/format validation, same refuse-don't-guess contract as the
    BMP codec) are decoded, decimated by keeping every
    ``decimation``-th FRAME (all channels of it), and re-encoded as a
    valid WAV at ``framerate // decimation`` — in/out counts are frame
    counts and the md5 covers the re-encoded container bytes
    (md5-pinned in tests). Non-WAV payloads keep the deterministic
    8-bit-PCM byte-decimation stand-in (the pre-r8 behavior the
    ``multimodal_audio_resample`` oracle pins on text payloads); a
    production deployment swaps that branch for libsndfile/ffmpeg.
    Arrow-batched ``mapInPandas`` either way.
    """
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("n_samples_in", T.LongType(), True),
            T.StructField("n_samples_out", T.LongType(), True),
            T.StructField("n_bytes_out", T.LongType(), True),
            T.StructField("resampled_md5", T.StringType(), True),
        ]
    )

    def _resample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        import io
        import wave

        def wav_decimate(b: bytes) -> tuple[int, int, bytes] | None:
            if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
                return None
            try:
                r = wave.open(io.BytesIO(b), "rb")
                n, c, sw, fr = (
                    r.getnframes(),
                    r.getnchannels(),
                    r.getsampwidth(),
                    r.getframerate(),
                )
                raw = r.readframes(n)
                r.close()
            except (wave.Error, EOFError):
                return None  # RIFF magic but not a readable PCM WAV
            fsz = c * sw
            kept = b"".join(
                raw[i * fsz : (i + 1) * fsz] for i in range(0, n, decimation)
            )
            buf = io.BytesIO()
            w = wave.open(buf, "wb")
            w.setnchannels(c)
            w.setsampwidth(sw)
            w.setframerate(max(fr // decimation, 1))
            w.writeframes(kept)
            w.close()
            return n, (n + decimation - 1) // decimation, buf.getvalue()

        for pdf in batches:
            ids, n_in, n_out, n_bytes, digests = [], [], [], [], []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                ids.append(mid)
                if b is None:
                    n_in.append(None), n_out.append(None)
                    n_bytes.append(None), digests.append(None)
                    continue
                b = bytes(b)
                wav = wav_decimate(b)
                if wav is not None:
                    f_in, f_out, out = wav
                    n_in.append(f_in), n_out.append(f_out)
                else:
                    out = bytes(b[::decimation])
                    n_in.append(len(b)), n_out.append(len(out))
                n_bytes.append(len(out))
                digests.append(hashlib.md5(out).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": pd.array(ids, dtype="int64"),
                    "n_samples_in": pd.array(n_in, dtype="Int64"),
                    "n_samples_out": pd.array(n_out, dtype="Int64"),
                    "n_bytes_out": pd.array(n_bytes, dtype="Int64"),
                    "resampled_md5": digests,
                }
            )

    return media.mapInPandas(_resample, schema=schema)


# ---------------------------------------------------------------------
# perceptual-hash near-duplicate detection
# ---------------------------------------------------------------------

PHASH_SCHEMA = "media_id BIGINT, phash BIGINT"


def perceptual_hash(media: DataFrame, codec: str = "auto") -> DataFrame:
    """64-bit perceptual signature per media payload, Arrow-batched.

    Payloads the active codec can decode (any format under Pillow;
    uncompressed 24-bit BMP under the always-available stdlib codec)
    get the standard dHash: decode → 9×8 grayscale →
    horizontal-gradient bits — small visual edits flip few bits, so
    near-duplicate frames land within a small Hamming radius.
    Undecodable payloads (e.g. the text fixture's utf-8 bytes — a
    pytest pins that NONE of them parse as BMP, which keeps the
    byte-bigram DuckDB oracle sound) fall back to a byte-bigram
    SimHash: hash each byte pair into 64 buckets, vote, take bits
    above the mean — the same locality property over raw payloads (a
    small payload edit perturbs few bucket counts), so the downstream
    banding stage is exercised with REAL near-dup semantics rather
    than a placebo. Deterministic either way; which kernel family ran
    is recorded by the caller via `phash_kernel()`.

    Scale: embarrassingly parallel, one 8-byte signature out per
    payload — the shuffle-bearing stage is the banding join in
    :func:`phash_near_pairs`, which inherits the SimHash inverted-
    index cost model (Σ bucket², never |media|²).

    ``codec="stdlib"`` pins the BMP shim even where Pillow is
    installed — required by oracle-checked entries whose DuckDB twin
    models the stdlib integer kernel exactly (PIL's resize uses a
    different index rounding, so its dHash is a different — equally
    valid — fingerprint)."""

    def hash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        if codec == "stdlib":
            from .bmpcodec import StdlibBmpModule

            image_module = StdlibBmpModule
        else:
            image_module = _resolve_image_module()

        def one(payload: bytes | None) -> int | None:
            if payload is None:
                return None
            if image_module is not None:
                import io

                try:
                    img = image_module.open(io.BytesIO(payload)).convert("L")
                    small = np.asarray(img.resize((9, 8)), dtype=np.int16)
                    bits = (small[:, 1:] > small[:, :-1]).flatten()
                except Exception:
                    bits = None
                if bits is not None:
                    v = 0
                    for i, b in enumerate(bits):
                        if b:
                            v |= 1 << i
                    return v - (1 << 64) if v >= 1 << 63 else v
            a = np.frombuffer(payload, dtype=np.uint8)
            if len(a) < 2:
                return 0
            bg = a[:-1].astype(np.uint64) * np.uint64(31) + a[1:]
            buckets = ((bg * np.uint64(2654435761)) >> np.uint64(20)) & np.uint64(63)
            votes = np.bincount(buckets.astype(np.int64), minlength=64)
            mean = len(bg) / 64.0
            v = 0
            for i in range(64):
                if votes[i] > mean:
                    v |= 1 << i
            return v - (1 << 64) if v >= 1 << 63 else v

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "phash": pdf["payload"].map(one).astype("int64"),
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        hash_batch, schema=PHASH_SCHEMA
    )


def _try_import_pil():
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def phash_kernel() -> str:
    """Which perceptual-hash kernel family this environment runs:
    full dHash under Pillow, else dHash for BMP payloads (stdlib
    codec) with byte-bigram SimHash for everything undecodable."""
    return (
        "dhash"
        if _try_import_pil() is not None
        else "dhash-bmp+byte-bigram-simhash"
    )


def phash_near_pairs(
    media: DataFrame, max_hamming: int = 3, max_bucket: int = 256
) -> DataFrame:
    """Perceptual near-duplicate media pairs: 64-bit signature →
    pigeonhole Hamming banding (the generic
    :func:`..dedup.hamming_band_pairs` — identical cost model to the
    text SimHash tier: equal-chunk bucket join, exact bit_count
    verify, cost ∝ Σ bucket², never |media|²). The hot-bucket valve
    is ON here (byte-bigram signatures over a homogeneous corpus can
    leave whole chunk regions undiscriminating — measured as an OOM
    at the 10× scale point before the cap); oversize buckets carry no
    pairwise signal and are skipped, to be recovered by the exact
    digest tier (multimodal_content_dedup) or a second hash family."""
    from .dedup import hamming_band_pairs

    sig = perceptual_hash(media)
    return hamming_band_pairs(
        sig,
        max_hamming=max_hamming,
        id_col="media_id",
        sig_col="phash",
        out_prefix="media",
        max_bucket=max_bucket,
    )
