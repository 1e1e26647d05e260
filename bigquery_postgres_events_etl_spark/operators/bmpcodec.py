"""Pure-stdlib 24-bit BMP codec + deterministic nearest-neighbor
resize — the container's real-pixel floor for the multimodal tier.

The reference pipeline treats media as opaque bytes and delegates
codecs to client libraries; this engine's executor kernels
(``multimodal.decode_images`` / ``resize_images`` /
``perceptual_hash``) use Pillow when importable. This module closes
the no-Pillow gap for the one format the Python stdlib can honestly
own: uncompressed 24-bit BI_RGB BMP (a fixed header + raw pixel rows,
``struct`` is the whole parser). With it, the Arrow-batched kernels
run REAL decode → resize → re-encode on real pixel bytes in the
default container, md5-pinned in tests/test_multimodal.py — not a
shape-only fake.

Scope is deliberately narrow and loudly checked: 24 bpp, BI_RGB
(uncompressed), BITMAPINFOHEADER or the V4/V5 extensions, bottom-up
or top-down row order. Anything else raises ``ValueError`` so a
caller never silently gets garbage pixels. JPEG/PNG still need
Pillow — entropy coding has no stdlib implementation.

Pixel convention at the API boundary: RGB, row-major, TOP-DOWN
(``bytes`` of length ``width * height * 3``) — the natural numpy
``(h, w, 3)`` layout. The BMP disk format's bottom-up BGR rows and
4-byte row padding are internal details of encode/decode.

The ``Image``/``open`` shim at the bottom mirrors the small PIL
surface the multimodal kernels touch (``open, size, getbands,
convert('L'), resize, save, format, __array__``), so the SAME kernel
code path runs under either codec — only the import resolution
differs (multimodal._resolve_image_module).
"""

from __future__ import annotations

import struct
from typing import BinaryIO

_FILE_HEADER = struct.Struct("<2sIHHI")  # magic, file size, res, res, px offset
_INFO_HEADER = struct.Struct("<IiiHHIIiiII")  # BITMAPINFOHEADER (40 bytes)
_ACCEPTED_INFO_SIZES = (40, 52, 56, 108, 124)  # INFO, V2, V3, V4, V5


def _row_stride(width: int) -> int:
    return (width * 3 + 3) & ~3  # each row padded to a 4-byte boundary


def encode_bmp(width: int, height: int, pixels: bytes) -> bytes:
    """RGB top-down pixel bytes → uncompressed 24-bit BMP file bytes.

    Rows are written bottom-up in BGR with 4-byte padding (the
    canonical positive-height BMP every decoder accepts)."""
    if width <= 0 or height <= 0:
        raise ValueError(f"invalid dimensions {width}x{height}")
    if len(pixels) != width * height * 3:
        raise ValueError(
            f"pixel buffer is {len(pixels)} bytes, want {width * height * 3}"
        )
    stride = _row_stride(width)
    img_size = stride * height
    offset = _FILE_HEADER.size + _INFO_HEADER.size
    out = bytearray(offset + img_size)
    _FILE_HEADER.pack_into(out, 0, b"BM", offset + img_size, 0, 0, offset)
    _INFO_HEADER.pack_into(
        out, _FILE_HEADER.size,
        40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0,
    )
    row_raw = width * 3
    for y in range(height):
        src = (height - 1 - y) * row_raw  # bottom-up on disk
        dst = offset + y * stride
        row = pixels[src:src + row_raw]
        # RGB -> BGR swap without numpy: slice-assign the interleaved
        # channels (C-speed, no per-pixel Python loop)
        out[dst:dst + row_raw:3] = row[2::3]
        out[dst + 1:dst + row_raw:3] = row[1::3]
        out[dst + 2:dst + row_raw:3] = row[0::3]
    return bytes(out)


def decode_bmp(data: bytes) -> tuple[int, int, bytes]:
    """BMP file bytes → (width, height, RGB top-down pixel bytes).

    Strict: magic, header size, 24 bpp, BI_RGB, and the pixel-array
    bounds are all validated — a non-BMP payload (e.g. the fixture's
    text bytes) cannot pass, which is what keeps the byte-bigram
    perceptual-hash oracle sound (tests/test_multimodal.py pins that
    no fixture payload decodes)."""
    if len(data) < _FILE_HEADER.size + 4 or data[:2] != b"BM":
        raise ValueError("not a BMP: bad magic/size")
    _, file_size, _, _, offset = _FILE_HEADER.unpack_from(data, 0)
    (info_size,) = struct.unpack_from("<I", data, _FILE_HEADER.size)
    if info_size not in _ACCEPTED_INFO_SIZES:
        raise ValueError(f"unsupported DIB header size {info_size}")
    if len(data) < _FILE_HEADER.size + _INFO_HEADER.size:
        raise ValueError("truncated DIB header")
    (_, width, raw_height, planes, bpp, compression, *_rest) = (
        _INFO_HEADER.unpack_from(data, _FILE_HEADER.size)
    )
    if planes != 1 or bpp != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP variant (planes={planes}, bpp={bpp}, "
            f"compression={compression}); this codec owns 24-bit BI_RGB only"
        )
    top_down = raw_height < 0
    height = -raw_height if top_down else raw_height
    if width <= 0 or height <= 0:
        raise ValueError(f"invalid dimensions {width}x{raw_height}")
    stride = _row_stride(width)
    if offset + stride * height > len(data):
        raise ValueError("pixel array out of bounds")
    row_raw = width * 3
    px = bytearray(row_raw * height)
    for y in range(height):
        src = offset + (y if top_down else height - 1 - y) * stride
        dst = y * row_raw
        row = data[src:src + row_raw]
        px[dst:dst + row_raw:3] = row[2::3]  # BGR -> RGB
        px[dst + 1:dst + row_raw:3] = row[1::3]
        px[dst + 2:dst + row_raw:3] = row[0::3]
    return width, height, bytes(px)


def resize_nearest(
    width: int, height: int, pixels: bytes, out_w: int, out_h: int
) -> bytes:
    """Deterministic nearest-neighbor resample: source index =
    ``(i * src) // dst`` (pure integer floor mapping — bit-identical
    everywhere, no rounding mode to disagree on)."""
    if out_w <= 0 or out_h <= 0:
        raise ValueError(f"invalid target {out_w}x{out_h}")
    try:
        import numpy as np  # vectorized path (numpy ships in-container)

        a = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, 3)
        ys = (np.arange(out_h, dtype=np.int64) * height) // out_h
        xs = (np.arange(out_w, dtype=np.int64) * width) // out_w
        return a[ys][:, xs].tobytes()
    except ImportError:  # pragma: no cover — numpy is baked in
        row_raw = width * 3
        out = bytearray(out_w * out_h * 3)
        for oy in range(out_h):
            sy = (oy * height) // out_h
            for ox in range(out_w):
                sx = (ox * width) // out_w
                s = sy * row_raw + sx * 3
                d = (oy * out_w + ox) * 3
                out[d:d + 3] = pixels[s:s + 3]
        return bytes(out)


def to_grayscale(pixels: bytes) -> bytes:
    """Integer ITU-R 601 luma: (299·R + 587·G + 114·B) // 1000 —
    deterministic (no float rounding), one byte out per pixel."""
    try:
        import numpy as np

        a = np.frombuffer(pixels, dtype=np.uint8).reshape(-1, 3).astype(np.int64)
        return (
            ((a[:, 0] * 299 + a[:, 1] * 587 + a[:, 2] * 114) // 1000)
            .astype(np.uint8)
            .tobytes()
        )
    except ImportError:  # pragma: no cover
        return bytes(
            (pixels[i] * 299 + pixels[i + 1] * 587 + pixels[i + 2] * 114) // 1000
            for i in range(0, len(pixels), 3)
        )


def _expand_gray_rgb(luma: bytes) -> bytes:
    """One luma byte → three identical RGB bytes, vectorized."""
    try:
        import numpy as np

        return np.repeat(
            np.frombuffer(luma, dtype=np.uint8), 3
        ).tobytes()
    except ImportError:  # pragma: no cover
        return bytes(b for v in luma for b in (v, v, v))


class BmpImage:
    """PIL-shaped handle over decoded BMP pixels — exactly the member
    surface the multimodal kernels use, nothing more."""

    format = "BMP"

    def __init__(self, width: int, height: int, pixels: bytes, mode: str = "RGB"):
        self._w = width
        self._h = height
        self._px = pixels
        self.mode = mode

    @property
    def size(self) -> tuple[int, int]:
        return (self._w, self._h)

    def getbands(self) -> tuple[str, ...]:
        return ("L",) if self.mode == "L" else ("R", "G", "B")

    def convert(self, mode: str) -> "BmpImage":
        if mode == self.mode:
            return self
        if mode == "L" and self.mode == "RGB":
            return BmpImage(self._w, self._h, to_grayscale(self._px), "L")
        raise ValueError(f"convert {self.mode}->{mode} not supported")

    def resize(self, wh: tuple[int, int]) -> "BmpImage":
        ow, oh = wh
        if self.mode == "L":
            # resample the single channel directly with the same
            # integer index maps (no per-byte Python expansion — this
            # sits in the per-payload dHash hot path)
            try:
                import numpy as np

                a = np.frombuffer(self._px, dtype=np.uint8).reshape(
                    self._h, self._w
                )
                ys = (np.arange(oh, dtype=np.int64) * self._h) // oh
                xs = (np.arange(ow, dtype=np.int64) * self._w) // ow
                return BmpImage(ow, oh, a[ys][:, xs].tobytes(), "L")
            except ImportError:  # pragma: no cover — numpy is baked in
                out = bytearray(ow * oh)
                for oy in range(oh):
                    sy = (oy * self._h) // oh
                    for ox in range(ow):
                        out[oy * ow + ox] = self._px[
                            sy * self._w + (ox * self._w) // ow
                        ]
                return BmpImage(ow, oh, bytes(out), "L")
        return BmpImage(
            ow, oh, resize_nearest(self._w, self._h, self._px, ow, oh), "RGB"
        )

    def save(self, fp: BinaryIO, format: str | None = None) -> None:
        if format not in (None, "BMP"):
            raise ValueError(f"stdlib codec writes BMP only, not {format}")
        if self.mode == "L":  # expand luma to gray RGB for the 24-bit container
            px = _expand_gray_rgb(self._px)
        else:
            px = self._px
        fp.write(encode_bmp(self._w, self._h, px))

    def tobytes(self) -> bytes:
        return self._px

    def __array__(self, dtype=None, copy=None):
        import numpy as np

        a = np.frombuffer(self._px, dtype=np.uint8)
        a = a.reshape(
            (self._h, self._w) if self.mode == "L" else (self._h, self._w, 3)
        )
        return a.astype(dtype) if dtype is not None else a


class StdlibBmpModule:
    """``PIL.Image``-compatible module object (the subset the kernels
    import-resolve): ``open(fp) -> image``. Raises ``ValueError`` on
    anything that is not an uncompressed 24-bit BMP."""

    @staticmethod
    def open(fp: BinaryIO) -> BmpImage:
        w, h, px = decode_bmp(fp.read())
        return BmpImage(w, h, px)
