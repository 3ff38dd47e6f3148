"""Video codec layer — a REAL standard format in pure numpy.

YUV4MPEG2 (.y4m, the mjpegtools/ffmpeg raw interchange format) is a
plain-text header + raw YUV planes per frame: simple enough for a complete
pure-numpy reader/writer, and a REAL public container with fps, geometry
and interlacing metadata — so the video frame-sampling pipeline
(``multimodal.q_video_frame_sample``) parses an actual codec header and
decodes actual frames in this environment, the way the WAV path does for
audio and the BMP path does for images.  Compressed codecs (h264/vp9)
still need ffmpeg/pyav; ``tests/test_media_codecs.py`` carries skip-marked
hooks for them.

Colorspace: C444 (full-resolution planes) to keep the reader exact;
BT.601 full-range integer RGB<->YUV converters are provided for feature
stages that want luma.
"""

from __future__ import annotations

import numpy as np

_MAGIC = b"YUV4MPEG2"


def encode_y4m(frames: np.ndarray, fps_num: int, fps_den: int = 1) -> bytes:
    """(N, H, W, 3) uint8 YUV444 frames -> .y4m bytes."""
    if frames.ndim != 4 or frames.shape[3] != 3 or frames.dtype != np.uint8:
        raise ValueError("encode_y4m expects (N, H, W, 3) uint8")
    n, h, w, _ = frames.shape
    head = f"YUV4MPEG2 W{w} H{h} F{fps_num}:{fps_den} Ip A1:1 C444\n" \
        .encode("ascii")
    parts = [head]
    # planar: all Y, then all U, then all V per frame
    planar = np.ascontiguousarray(frames.transpose(0, 3, 1, 2))
    for i in range(n):
        parts.append(b"FRAME\n")
        parts.append(planar[i].tobytes())
    return b"".join(parts)


def parse_y4m_header(buf) -> dict:
    """Parse the stream header only: {'w', 'h', 'fps_num', 'fps_den',
    'data_off'} — the cheap container probe a frame sampler runs before
    deciding which frames to decode."""
    if bytes(buf[:9]) != _MAGIC:
        raise ValueError("not a YUV4MPEG2 buffer")
    end = bytes(buf[:256]).index(b"\n")
    fields = bytes(buf[10:end]).decode("ascii").split(" ")
    w = h = None
    fps_num, fps_den = 25, 1
    for f in fields:
        if not f:
            continue
        tag, val = f[0], f[1:]
        if tag == "W":
            w = int(val)
        elif tag == "H":
            h = int(val)
        elif tag == "F":
            a, b = val.split(":")
            fps_num, fps_den = int(a), int(b)
        elif tag == "C" and val not in ("444",):
            raise ValueError(f"unsupported y4m colorspace C{val}")
    if w is None or h is None:
        raise ValueError("y4m header missing W/H")
    return {"w": w, "h": h, "fps_num": fps_num, "fps_den": fps_den,
            "data_off": end + 1}


def decode_y4m(buf, frame_indices=None) -> tuple[np.ndarray, dict]:
    """.y4m bytes -> ((N, H, W, 3) uint8 YUV444, header dict).

    ``frame_indices`` decodes only the requested frames (sorted unique),
    seeking over the others — the frame-SAMPLING access pattern: a stride
    sampler touches k frames of a clip without materializing the rest.
    """
    hdr = parse_y4m_header(buf)
    w, h = hdr["w"], hdr["h"]
    fsize = 3 * w * h
    step = 6 + fsize                            # b"FRAME\n" + planes
    total = (len(buf) - hdr["data_off"]) // step
    if frame_indices is None:
        want = range(total)
    else:
        want = [i for i in sorted(set(int(i) for i in frame_indices))
                if 0 <= i < total]
    out = np.empty((len(want), h, w, 3), dtype=np.uint8)
    for j, i in enumerate(want):
        off = hdr["data_off"] + i * step
        if bytes(buf[off:off + 6]) != b"FRAME\n":
            raise ValueError(f"corrupt y4m FRAME marker at frame {i}")
        planes = np.frombuffer(buf, dtype=np.uint8, count=fsize,
                               offset=off + 6).reshape(3, h, w)
        out[j] = planes.transpose(1, 2, 0)
    hdr["n_frames"] = total
    return out, hdr


def rgb_to_yuv444(rgb: np.ndarray) -> np.ndarray:
    """BT.601 full-range RGB -> YUV, uint8 in / uint8 out."""
    f = rgb.astype(np.float64)
    y = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
    u = -0.169 * f[..., 0] - 0.331 * f[..., 1] + 0.5 * f[..., 2] + 128.0
    v = 0.5 * f[..., 0] - 0.419 * f[..., 1] - 0.081 * f[..., 2] + 128.0
    return np.clip(np.stack([y, u, v], axis=-1).round(), 0, 255) \
        .astype(np.uint8)


def synth_video(doc_id: int, seed: int = 1234) -> tuple[np.ndarray, int]:
    """Deterministic tiny clip for ``doc_id``: (frames (N,H,W,3) uint8 YUV,
    fps).  A moving gradient so per-frame luma differs frame to frame —
    pure function of (doc_id, seed), safe on any worker."""
    r = (doc_id * 0x9E3779B97F4A7C15 + seed * 7 + 3) % (2 ** 32)
    fps = (24, 25, 30)[r % 3]
    n = 4 + (r >> 4) % 5                        # 4..8 frames
    h = w = 16
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    frames = np.empty((n, h, w, 3), dtype=np.uint8)
    for i in range(n):
        lum = 127.5 + 120.0 * np.sin(
            (xx + yy) / 6.0 + i * 0.9 + (r % 89))
        frames[i, :, :, 0] = np.clip(lum.round(), 0, 255).astype(np.uint8)
        frames[i, :, :, 1] = (r >> 8) % 256
        frames[i, :, :, 2] = (r >> 16) % 256
    return frames, fps
