"""Multimodal plumbing tests: binary envelope, Arrow-batched feature
extraction, stub boundaries."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigquery_postgres_events_etl_spark.io import load_table
from bigquery_postgres_events_etl_spark.operators.multimodal import (
    decode_images,
    documents_as_media,
    extract_binary_features,
    fake_decode_images,
    sample_video_frames,
)


def test_binary_envelope_schema(spark, sf_dir):
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    assert dict(media.dtypes)["payload"] == "binary"
    row = media.orderBy("media_id").first()
    assert row.n_bytes == len(row.payload)


def test_feature_extract_values(spark, sf_dir):
    """The pandas-batch featurizer must agree with a driver-side
    python computation on a sample."""
    docs = load_table(spark, sf_dir, "documents")
    feats = {
        r.media_id: r
        for r in extract_binary_features(documents_as_media(docs)).collect()
    }
    for d in docs.orderBy("doc_id").limit(5).collect():
        b = d.text.encode()
        f = feats[d.doc_id]
        assert (f.n_bytes, f.byte_sum, f.first_byte, f.last_byte) == (
            len(b), sum(b), b[0], b[-1],
        )


def test_decode_non_bmp_without_pillow_raises_not_implemented(spark, sf_dir):
    """Honest-codec contract for payloads the stdlib BMP codec cannot
    own (the fixture's text bytes): without Pillow, execution raises a
    clearly-marked NotImplementedError naming both escape hatches —
    never wrong output. Plan construction succeeds — the schema
    contract is real either way. (BMP payloads decode for REAL in this
    environment: test_bmp_decode_resize_e2e_md5_pinned.)"""
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    df = decode_images(media)  # plan builds fine
    assert [f.name for f in df.schema.fields] == ["media_id", "width", "height", "channels"]
    try:
        import PIL  # noqa: F401

        pytest.skip("Pillow present — decode branch covered by the unit test")
    except ImportError:
        pass
    with pytest.raises(Exception, match="not an uncompressed 24-bit BMP"):
        df.collect()


def test_decode_batch_with_real_codec_api(spark, sf_dir):
    """The decode branch itself, unit-tested against an API-compatible
    fake codec (same .open → .size/.getbands surface as PIL.Image):
    proves the per-batch logic that would run where Pillow IS
    installed, without needing the library here."""

    class _FakeImg:
        def __init__(self, data: bytes):
            self._n = len(data)

        @property
        def size(self):
            return (self._n % 640 + 1, self._n % 480 + 1)

        def getbands(self):
            return ("R", "G", "B")

    class _FakeImageModule:
        @staticmethod
        def open(fp):
            return _FakeImg(fp.read())

    import pandas as pd

    from bigquery_postgres_events_etl_spark.operators.multimodal import (
        _decode_image_batch,
    )

    pdf = pd.DataFrame(
        {"media_id": [1, 2, 3], "payload": [b"abcd", None, b"x" * 700]}
    )
    out = _decode_image_batch(pdf, _FakeImageModule)
    assert list(out["media_id"]) == [1, 2, 3]
    assert out["width"][0] == 4 % 640 + 1 and out["height"][0] == 4 % 480 + 1
    assert pd.isna(out["width"][1])  # null payload → null dims
    assert out["width"][2] == 700 % 640 + 1
    assert list(out["channels"].dropna()) == [3, 3]


def test_fake_decode_pipeline(spark, sf_dir):
    """Downstream ops (aspect filter) run over the deterministic fake
    decoder — the end-to-end pipeline shape a real codec would use."""
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    decoded = fake_decode_images(media)
    wide = decoded.where(F.col("width") > F.col("height"))
    assert 0 < wide.count() <= media.count()


def test_frame_sampling_offsets(spark, sf_dir):
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    frames = sample_video_frames(media, every_n_bytes=64)
    bad = frames.where(F.col("byte_offset") != F.col("frame_idx") * 64)
    assert bad.count() == 0


def test_plan_resize_invariants(spark, sf_dir):
    """Fit-within box, aspect preserved to integer rounding, never
    upscaled — over every fixture-derived (width, height)."""
    from bigquery_postgres_events_etl_spark.operators.multimodal import plan_resize

    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    planned = plan_resize(fake_decode_images(media), max_w=224, max_h=224).collect()
    assert planned
    for r in planned:
        assert 1 <= r.out_width <= min(r.width, 224)
        assert 1 <= r.out_height <= min(r.height, 224)
        # aspect ratio preserved up to integer floor on the scaled edge
        if r.width * 224 >= r.height * 224:  # width-bound
            assert r.out_width == min(r.width, 224)
            assert r.out_height == r.height * r.out_width // r.width
        else:
            assert r.out_height == min(r.height, 224)
            assert r.out_width == r.width * r.out_height // r.height
        assert r.downscaled == (r.out_width < r.width or r.out_height < r.height)


def test_resize_non_bmp_without_pillow_raises_not_implemented(spark, sf_dir):
    """The honest-codec contract: resizing a payload no available
    codec can decode (text bytes, no Pillow) surfaces a clearly-marked
    NotImplementedError, not wrong output."""
    import pytest

    try:
        import PIL  # noqa: F401

        pytest.skip("Pillow present — stub branch not reachable")
    except ImportError:
        pass
    from bigquery_postgres_events_etl_spark.operators.multimodal import resize_images

    media = documents_as_media(load_table(spark, sf_dir, "documents")).limit(2)
    with pytest.raises(Exception) as ei:
        resize_images(media).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )
    assert "not an uncompressed 24-bit BMP" in str(ei.value)


def test_audio_resample_decimation(spark, sf_dir):
    import hashlib

    from bigquery_postgres_events_etl_spark.operators.multimodal import resample_audio

    media = documents_as_media(load_table(spark, sf_dir, "documents")).limit(5)
    rows = {r.media_id: r for r in resample_audio(media, decimation=4).collect()}
    src = {r.media_id: bytes(r.payload) for r in media.collect()}
    for mid, b in src.items():
        expect = bytes(b[::4])
        assert rows[mid].n_samples_in == len(b)
        assert rows[mid].n_samples_out == len(expect)
        assert rows[mid].resampled_md5 == hashlib.md5(expect).hexdigest()


def test_perceptual_hash_is_locality_sensitive(spark):
    """The pHash kernel must behave like a perceptual hash regardless
    of which kernel the environment provides: byte-identical payloads
    collide exactly (Hamming 0), a small edit to a long payload moves
    the signature only a little, and unrelated payloads sit far
    apart. The banding stage must then surface the identical and
    lightly-edited pairs inside its radius."""
    from bigquery_postgres_events_etl_spark.operators.multimodal import (
        perceptual_hash,
        phash_near_pairs,
    )

    base = ("the quick brown fox jumps over the lazy dog " * 40).encode()
    edited = bytearray(base)
    edited[100:104] = b"XXXX"  # tiny local edit
    unrelated = bytes(
        (i * 131 + 17) % 251 for i in range(len(base))
    )
    rows = [
        (1, bytes(base)),
        (2, bytes(base)),
        (3, bytes(edited)),
        (4, unrelated),
    ]
    media = spark.createDataFrame(rows, "media_id LONG, payload BINARY")
    sig = {r.media_id: r.phash for r in perceptual_hash(media).collect()}

    def ham(a, b):
        return bin((sig[a] ^ sig[b]) & ((1 << 64) - 1)).count("1")

    assert ham(1, 2) == 0
    assert ham(1, 3) <= 6, f"small edit moved signature too far: {ham(1, 3)}"
    assert ham(1, 4) > 6, f"unrelated payloads too close: {ham(1, 4)}"

    pairs = {
        (r.media_a, r.media_b): r.hamming
        for r in phash_near_pairs(media, max_hamming=6).collect()
    }
    assert pairs[(1, 2)] == 0
    assert (1, 3) in pairs and (2, 3) in pairs
    assert not any(4 in p for p in pairs)


# ---------------------------------------------------------------------
# pure-stdlib BMP codec: real pixels without Pillow (r7 verdict #4)
# ---------------------------------------------------------------------


def _gradient(w, h, seed):
    px = bytearray()
    for y in range(h):
        for x in range(w):
            px += bytes(
                ((x * 7 + seed) % 256, (y * 11 + seed * 3) % 256, (x * y + seed * 5) % 256)
            )
    return bytes(px)


def test_bmp_roundtrip_and_strictness():
    """encode→decode identity across widths 1..6 (all four row-padding
    branches) and top-down decode; non-BMP / wrong-variant inputs are
    rejected loudly — the strictness that keeps the phash oracle sound."""
    import struct

    from bigquery_postgres_events_etl_spark.operators.bmpcodec import (
        decode_bmp,
        encode_bmp,
    )

    for w in range(1, 7):
        for h in (1, 2, 5):
            px = _gradient(w, h, w + h)
            data = encode_bmp(w, h, px)
            assert decode_bmp(data) == (w, h, px), (w, h)

    # top-down variant (negative height) decodes to the same pixels
    w, h = 3, 2
    px = _gradient(w, h, 9)
    data = bytearray(encode_bmp(w, h, px))
    struct.pack_into("<i", data, 14 + 8, -h)  # height field
    stride = (w * 3 + 3) & ~3
    off = 54
    rows = [bytes(data[off + i * stride : off + (i + 1) * stride]) for i in range(h)]
    data[off:] = b"".join(reversed(rows))  # reorder rows to top-down
    assert decode_bmp(bytes(data)) == (w, h, px)

    for bad in (b"", b"BM", b"not a bmp at all", "text payload".encode()):
        with pytest.raises(ValueError):
            decode_bmp(bad)
    # 8-bpp variant rejected, not mis-decoded
    bad8 = bytearray(encode_bmp(2, 2, _gradient(2, 2, 1)))
    struct.pack_into("<H", bad8, 14 + 14, 8)
    with pytest.raises(ValueError, match="24-bit"):
        decode_bmp(bytes(bad8))


def test_bmp_decode_resize_e2e_md5_pinned(spark):
    """The r7 verdict's 'done' bar: REAL encoded pixel bytes through
    the Arrow-batched decode and resize kernels in the default
    (Pillow-less) environment, output payloads pinned by md5. The
    constants were computed once from the integer nearest-neighbor
    spec (src = (i*in)//out) and must never drift."""
    import hashlib

    from bigquery_postgres_events_etl_spark.operators.bmpcodec import encode_bmp
    from bigquery_postgres_events_etl_spark.operators.multimodal import (
        resize_images,
    )

    #       mid  w    h    out_w out_h  md5(resized bmp)                    md5(input bmp)
    spec = [
        (1, 320, 200, 224, 140, "52cabeeb2d32a625a617637290347600", "fc0890b46daf3e06bab89d7a73babaed"),
        (2, 17, 333, 11, 224, "dee08e6ee201c83914dd15aaf660a77f", "f202d2de32b6ecb7e55e2f420f4e8fd0"),
        (3, 100, 100, 100, 100, "1d1fe9c05d1119717660a7a705d7b615", "1d1fe9c05d1119717660a7a705d7b615"),
        (4, 5, 3, 5, 3, "a373b611e8324aafec8a91443f307ca6", "a373b611e8324aafec8a91443f307ca6"),
    ]
    rows = []
    for mid, w, h, _ow, _oh, _omd5, imd5 in spec:
        bmp = encode_bmp(w, h, _gradient(w, h, mid))
        assert hashlib.md5(bmp).hexdigest() == imd5, "input encoding drifted"
        rows.append((mid, bmp))
    media = spark.createDataFrame(rows, "media_id LONG, payload BINARY")

    decoded = {r.media_id: r for r in decode_images(media).collect()}
    for mid, w, h, *_ in spec:
        assert (decoded[mid].width, decoded[mid].height) == (w, h)
        assert decoded[mid].channels == 3

    resized = {r.media_id: r for r in resize_images(media).collect()}
    for mid, _w, _h, ow, oh, omd5, _imd5 in spec:
        r = resized[mid]
        assert (r.out_width, r.out_height) == (ow, oh), mid
        assert hashlib.md5(bytes(r.resized)).hexdigest() == omd5, mid
        assert r.n_bytes_out == len(r.resized)
    # the no-downscale case re-encodes to the identical file — the
    # decode→resize→encode chain is lossless where it should be
    assert (
        hashlib.md5(bytes(resized[3].resized)).hexdigest()
        == hashlib.md5(bytes(rows[2][1])).hexdigest()
    )


def test_phash_runs_real_dhash_on_bmp_payloads(spark):
    """With real BMP bytes the perceptual hash is the actual dHash
    (9×8 grayscale gradient), not the byte-bigram fallback: identical
    images collide exactly, a local pixel edit stays within a small
    Hamming radius, an unrelated image lands far away — on PIXELS, so
    a byte-level re-encoding artifact (row padding) cannot move it."""
    from bigquery_postgres_events_etl_spark.operators.bmpcodec import encode_bmp
    from bigquery_postgres_events_etl_spark.operators.multimodal import (
        perceptual_hash,
    )

    w, h = 64, 48
    base = bytearray(_gradient(w, h, 2))
    edited = bytearray(base)
    for i in range(0, 90, 3):  # small local patch edit
        edited[i] = 255 - edited[i]
    unrelated = bytes((i * 197 + 31) % 256 for i in range(w * h * 3))
    rows = [
        (1, encode_bmp(w, h, bytes(base))),
        (2, encode_bmp(w, h, bytes(base))),
        (3, encode_bmp(w, h, bytes(edited))),
        (4, encode_bmp(w, h, unrelated)),
    ]
    media = spark.createDataFrame(rows, "media_id LONG, payload BINARY")
    sig = {r.media_id: r.phash for r in perceptual_hash(media).collect()}

    def ham(a, b):
        return bin((sig[a] ^ sig[b]) & ((1 << 64) - 1)).count("1")

    assert ham(1, 2) == 0
    assert ham(1, 3) <= 8, f"local pixel edit moved dHash too far: {ham(1, 3)}"
    assert ham(1, 4) > 8, f"unrelated images too close: {ham(1, 4)}"


def test_fixture_payloads_never_decode_as_bmp(spark, sf_dir):
    """Soundness pin for the multimodal_phash_clusters DuckDB oracle:
    it models the BYTE-BIGRAM kernel for every fixture payload, which
    is only right if no payload parses as BMP (a decodable payload
    would take the dHash branch and diverge). Strict header validation
    makes text bytes structurally unable to pass; verify anyway."""
    from bigquery_postgres_events_etl_spark.operators.bmpcodec import decode_bmp

    for r in load_table(spark, sf_dir, "documents").select("text").collect():
        with pytest.raises(ValueError):
            decode_bmp(r.text.encode("utf-8"))


def test_bmp_synthesis_entry_pins_real_payloads(spark, sf_dir):
    """multimodal_bmp_resize_real's synthesized inputs are REAL BMPs
    with pinned content (doc 42: 9×17, md5 pinned below), and the
    registered output matches the oracle's closed-form geometry on a
    spot row — the pytest half of the entry's contract (the oracle
    pins geometry cross-engine; this pins pixel content, which SQL
    cannot)."""
    import hashlib

    from bigquery_postgres_events_etl_spark.operators.bmpcodec import decode_bmp
    from bigquery_postgres_events_etl_spark.operators.multimodal import (
        synthesize_bmp_media,
    )

    docs = load_table(spark, sf_dir, "documents")
    media = synthesize_bmp_media(docs)
    row = media.where(F.col("media_id") == 42).first()
    if row is None:
        pytest.skip("fixture lacks doc_id 42")
    assert hashlib.md5(bytes(row.payload)).hexdigest() == (
        "73e1d62ea93dc05e8cbc8cc25a6e996c"
    )
    w, h, _px = decode_bmp(bytes(row.payload))
    assert (w, h) == (42 % 37 + 4, 42 % 29 + 4) == (9, 17)

    from bigquery_postgres_events_etl_spark.registry import all_queries

    out = {
        r.media_id: r
        for r in all_queries()["multimodal_bmp_resize_real"](spark, sf_dir)
        .where(F.col("media_id") == 42)
        .collect()
    }
    r = out[42]
    # 9x17 into 16x16: height-bound -> oh=16, ow=9*16//17=8
    assert (r.out_width, r.out_height) == (8, 16)
    assert r.n_bytes_out == 54 + 16 * ((8 * 3 + 3) // 4 * 4)


def test_bmp_decoder_never_crashes_unstructured(tmp_path):
    """decode_bmp parses UNTRUSTED bytes (payload columns): any
    malformed input must raise ValueError — never IndexError,
    struct.error, MemoryError (giant-dimension allocation), or silent
    garbage. Hypothesis drives random bytes and random mutations of a
    valid file."""
    import struct

    from hypothesis import given, settings, strategies as st

    from bigquery_postgres_events_etl_spark.operators.bmpcodec import (
        decode_bmp,
        encode_bmp,
    )

    valid = encode_bmp(5, 4, _gradient(5, 4, 7))

    @settings(max_examples=300, deadline=None)
    @given(st.binary(max_size=200))
    def random_bytes_raise_cleanly(data):
        try:
            decode_bmp(data)
        except ValueError:
            pass  # the contract

    @settings(max_examples=300, deadline=None)
    @given(
        st.integers(0, len(valid) - 1),
        st.binary(min_size=1, max_size=8),
    )
    def mutated_valid_file_is_clean(pos, junk):
        data = valid[:pos] + junk + valid[pos + len(junk):]
        try:
            w, h, px = decode_bmp(data)
        except ValueError:
            return
        # if it still parses, the contract holds: bounded, consistent
        assert w > 0 and h > 0 and len(px) == w * h * 3

    random_bytes_raise_cleanly()
    mutated_valid_file_is_clean()


def test_wav_synthesis_resample_e2e_md5_pinned(spark, sf_dir):
    """The audio twin of the BMP md5 pin: real PCM WAV bytes through
    the Arrow-batched resample kernel in the default environment —
    input container and re-encoded output both md5-pinned for doc 42
    (62 frames mono → 16 frames, 76-byte container), and the
    registered geometry entry matched on the same row."""
    import hashlib
    import io
    import wave

    from bigquery_postgres_events_etl_spark.operators.multimodal import (
        resample_audio,
        synthesize_wav_media,
    )

    docs = load_table(spark, sf_dir, "documents")
    media = synthesize_wav_media(docs)
    row = media.where(F.col("media_id") == 42).first()
    if row is None:
        pytest.skip("fixture lacks doc_id 42")
    payload = bytes(row.payload)
    assert hashlib.md5(payload).hexdigest() == (
        "428af74f344e4bc806a4a20923914160"
    )
    r = wave.open(io.BytesIO(payload), "rb")
    assert (r.getnframes(), r.getnchannels(), r.getsampwidth()) == (62, 1, 2)
    r.close()

    res = {
        x.media_id: x
        for x in resample_audio(media.where(F.col("media_id") == 42)).collect()
    }[42]
    assert (res.n_samples_in, res.n_samples_out) == (62, 16)
    assert res.n_bytes_out == 76 == 44 + 16 * 1 * 2
    assert res.resampled_md5 == "547eaba740ce9de3a7f02ee0dde3d6ea"

    from bigquery_postgres_events_etl_spark.registry import all_queries

    g = (
        all_queries()["multimodal_wav_resample_real"](spark, sf_dir)
        .where(F.col("media_id") == 42)
        .first()
    )
    assert (g.n_frames_in, g.n_frames_out, g.n_bytes_out) == (62, 16, 76)
