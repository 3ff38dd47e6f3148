"""Image codec layer — a REAL standard format in pure numpy.

The container has no PIL/opencv, but 24-bit uncompressed BMP (Windows
BITMAPINFOHEADER) is a trivial public format — like the RIFF/WAV path in
``audio.py``, it gets a complete reader/writer here so the image decode
pipeline (``multimodal.q_image_decode``) runs REAL bytes-to-pixels work
end to end in this environment.  JPEG/PNG decode still needs PIL: the
dispatch table keeps a gated hook (`decode_any`) that uses PIL when it is
importable, and ``tests/test_media_codecs.py`` carries skip-marked
cross-checks that activate the day the environment grows the libs.

This is the image analog of the reference's format-specific loaders
(``load_assess`` CSV/PostGIS parsing, /root/reference/R/loaders.R) — a
typed wire format decoded inside the engine rather than upstream.
"""

from __future__ import annotations

import struct

import numpy as np

_BMP_HEADER_SIZE = 14
_DIB_SIZE = 40
_PIXEL_OFFSET = _BMP_HEADER_SIZE + _DIB_SIZE


def encode_bmp(rgb: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> 24-bit uncompressed bottom-up BMP bytes."""
    if rgb.ndim != 3 or rgb.shape[2] != 3 or rgb.dtype != np.uint8:
        raise ValueError("encode_bmp expects (H, W, 3) uint8")
    h, w, _ = rgb.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4                      # rows pad to 4-byte multiple
    stride = row_bytes + pad
    img_size = stride * h
    # BGR channel order, bottom-up row order, per the format
    bgr = rgb[::-1, :, ::-1]
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :row_bytes] = bgr.reshape(h, row_bytes)
    header = (b"BM"
              + struct.pack("<IHHI", _PIXEL_OFFSET + img_size, 0, 0,
                            _PIXEL_OFFSET))
    dib = struct.pack("<IiiHHIIiiII", _DIB_SIZE, w, h, 1, 24, 0,
                      img_size, 2835, 2835, 0, 0)
    return header + dib + rows.tobytes()


def decode_bmp(buf) -> np.ndarray:
    """24-bit uncompressed BMP bytes -> (H, W, 3) uint8 RGB.

    Accepts any buffer object (bytes / memoryview — the zero-copy views
    from ``audio.binary_views``).  Handles both bottom-up (positive
    height) and top-down (negative height) row order.
    """
    if bytes(buf[:2]) != b"BM":
        raise ValueError("not a BMP buffer")
    (pixel_off,) = struct.unpack_from("<I", buf, 10)
    dib_size, w, h_signed = struct.unpack_from("<Iii", buf, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", buf, 26)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP bpp={bpp} compression={compression}")
    h = abs(h_signed)
    stride = (w * 3 + 3) & ~3
    data = np.frombuffer(buf, dtype=np.uint8, count=stride * h,
                         offset=pixel_off).reshape(h, stride)
    bgr = data[:, : w * 3].reshape(h, w, 3)
    if h_signed > 0:                            # bottom-up: flip rows
        bgr = bgr[::-1]
    return np.ascontiguousarray(bgr[:, :, ::-1])


def decode_any(buf, codec: str) -> np.ndarray:
    """Dispatch: 'bmp' decodes natively; other codecs (jpeg/png/...) route
    through PIL when importable and fail loudly otherwise."""
    if codec == "bmp":
        return decode_bmp(buf)
    try:
        import io

        from PIL import Image  # noqa: F401  (optional dependency)
    except ImportError as exc:
        raise NotImplementedError(
            f"codec {codec!r} needs PIL, which is not installed in this "
            "environment; 'bmp' is the natively-supported image format"
        ) from exc
    return np.asarray(Image.open(io.BytesIO(bytes(buf))).convert("RGB"))


def synth_image(doc_id: int, seed: int = 1234) -> np.ndarray:
    """Deterministic (H, W, 3) uint8 test pattern for ``doc_id`` — a seeded
    gradient + interference pattern, the image analog of synth._waveform.
    Pure function of (doc_id, seed): safe on any worker in any order."""
    r = (doc_id * 0x9E3779B97F4A7C15 + seed) % (2 ** 32)
    h = 16 + (r % 4) * 8                        # 16..40
    w = 16 + ((r >> 8) % 4) * 8
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    phase = (r >> 16) % 251
    base = (np.sin(xx * (1 + r % 7) / 5.0 + phase)
            + np.cos(yy * (1 + (r >> 4) % 5) / 7.0))
    img = np.empty((h, w, 3), dtype=np.uint8)
    img[:, :, 0] = ((base + 2.0) * 63.75).astype(np.uint8)
    img[:, :, 1] = ((xx / max(w - 1, 1)) * 255).astype(np.uint8)
    img[:, :, 2] = ((yy / max(h - 1, 1)) * 255).astype(np.uint8)
    return img
