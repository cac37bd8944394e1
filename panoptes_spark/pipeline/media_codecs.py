"""Pure-numpy/stdlib codecs for simple public media container formats.

These are REAL decoders/encoders (bit-exact round-trips, tested), not
stubs: they cover the uncompressed members of each modality so the
multimodal pipeline (``pipeline/multimodal.py``) can exercise genuine
decode → feature-extract → resize → re-encode paths in a container with
no imaging/audio libraries installed. Compressed formats (JPEG/PNG/MP3/
H.264) remain import-gated behind PIL/ffmpeg in ``multimodal.py``.

Formats:

- **BMP** (Windows bitmap, BITMAPINFOHEADER, 24-bit BI_RGB, bottom-up,
  4-byte row padding) — the classic uncompressed image interchange file.
- **PPM** (Netpbm ``P6``, maxval 255) — whitespace/comment-tolerant
  header per the netpbm spec.
- **WAV** (RIFF/WAVE, PCM 16-bit or 8-bit, any channel count) — chunk
  walker tolerates extra chunks (LIST/fact/cue) before/after ``data``.
- **Y4M** (YUV4MPEG2, C444 or C420 8-bit) — uncompressed video; per
  frame ``FRAME\\n`` + planar YUV.

Everything operates on ``bytes`` in / ``numpy`` arrays out, so the
functions are directly usable inside Arrow-batched ``mapInPandas``
workers with zero per-row Python object overhead beyond the payload.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# sniffing


def sniff_format(payload: bytes | None) -> str | None:
    """Identify a payload by magic bytes: 'bmp' | 'ppm' | 'wav' | 'y4m'
    or None for anything this module cannot decode."""
    if not payload or len(payload) < 12:
        return None
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:9] == b"YUV4MPEG2":
        return "y4m"
    return None


# --------------------------------------------------------------------------
# BMP — 24-bit uncompressed, BITMAPINFOHEADER


def encode_bmp(arr: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a 24-bit BI_RGB BMP
    (bottom-up rows, rows padded to 4 bytes)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("encode_bmp expects (h, w, 3) uint8")
    h, w, _ = a.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    # BMP stores BGR, bottom-up
    bgr = a[::-1, :, ::-1]
    body = bytearray()
    zeros = b"\x00" * pad
    for r in range(h):
        body += bgr[r].tobytes() + zeros
    data_size = len(body)
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + data_size, 0, 0, off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size, 2835, 2835, 0, 0
    )
    return header + info + bytes(body)


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BMP to an (h, w, 3) uint8 RGB array.
    Supports bottom-up (positive height) and top-down (negative height)
    row order; raises ValueError on compressed or non-24-bit inputs."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    w, h_raw = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, comp={compression})")
    top_down = h_raw < 0
    h = abs(h_raw)
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    need = off + stride * h
    if len(payload) < need:
        raise ValueError("truncated BMP payload")
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=off)
    rows = rows.reshape(h, stride)[:, :row_bytes].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


# --------------------------------------------------------------------------
# PPM — Netpbm P6, maxval 255


def encode_ppm(arr: np.ndarray) -> bytes:
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("encode_ppm expects (h, w, 3) uint8")
    h, w, _ = a.shape
    return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()


def _ppm_tokens(payload: bytes, n: int, start: int) -> tuple[list[int], int]:
    """Read `n` whitespace-separated integer tokens from a netpbm
    header, skipping '#' comments; returns (values, next_offset)."""
    vals: list[int] = []
    i = start
    L = len(payload)
    while len(vals) < n:
        while i < L and payload[i : i + 1].isspace():
            i += 1
        if i < L and payload[i : i + 1] == b"#":
            while i < L and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < L and not payload[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated PPM header")
        vals.append(int(payload[i:j]))
        i = j
    return vals, i + 1  # single whitespace after maxval precedes raster


def decode_ppm(payload: bytes) -> np.ndarray:
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    (w, h, maxval), off = _ppm_tokens(payload, 3, 2)
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    need = w * h * 3
    if len(payload) - off < need:
        raise ValueError("truncated PPM raster")
    return (
        np.frombuffer(payload, dtype=np.uint8, count=need, offset=off)
        .reshape(h, w, 3)
        .copy()
    )


# --------------------------------------------------------------------------
# WAV — RIFF/WAVE PCM


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Encode float samples in [-1, 1] (1-D mono or (n, ch)) as PCM
    16-bit WAV."""
    s = np.asarray(samples, dtype=np.float64)
    if s.ndim == 1:
        s = s[:, None]
    ch = s.shape[1]
    pcm = np.clip(np.round(s * 32767.0), -32768, 32767).astype("<i2")
    data = pcm.tobytes()
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, ch, sample_rate, byte_rate, ch * 2, 16
    )
    body = fmt + struct.pack("<4sI", b"data", len(data)) + data
    return struct.pack("<4sI4s", b"RIFF", 4 + len(body), b"WAVE") + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM WAV (16-bit signed or 8-bit unsigned, any channel
    count) to (mono float64 samples in [-1, 1], sample_rate). Walks RIFF
    chunks, so extra chunks (LIST, fact, cue) are tolerated."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i, L = 12, len(payload)
    fmt = None
    data = None
    while i + 8 <= L:
        cid, size = struct.unpack_from("<4sI", payload, i)
        body_off = i + 8
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", payload, body_off)
        elif cid == b"data":
            data = payload[body_off : body_off + size]
        i = body_off + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, ch, rate, _br, _ba, bits = fmt
    if audio_fmt != 1:
        raise ValueError(f"unsupported WAV format code {audio_fmt}")
    if bits == 16:
        raw = np.frombuffer(data, dtype="<i2")
        x = raw.astype(np.float64) / 32768.0
    elif bits == 8:
        raw = np.frombuffer(data, dtype=np.uint8)
        x = (raw.astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV bit depth {bits}")
    if ch > 1:
        x = x[: len(x) - len(x) % ch].reshape(-1, ch).mean(axis=1)
    return x, rate


# --------------------------------------------------------------------------
# Y4M — YUV4MPEG2 uncompressed video


def _y4m_header(payload: bytes) -> tuple[dict, int]:
    nl = payload.index(b"\n")
    parts = payload[:nl].split(b" ")
    if parts[0] != b"YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 payload")
    params: dict = {"C": "420jpeg"}  # y4m default colourspace
    for p in parts[1:]:
        if not p:
            continue
        tag, val = chr(p[0]), p[1:].decode("ascii")
        if tag == "W":
            params["W"] = int(val)
        elif tag == "H":
            params["H"] = int(val)
        elif tag == "F":
            num, den = val.split(":")
            params["F"] = (int(num), int(den))
        elif tag == "C":
            params["C"] = val
    if "W" not in params or "H" not in params or "F" not in params:
        raise ValueError("Y4M header missing W/H/F")
    return params, nl + 1


def _y4m_frame_size(params: dict) -> int:
    w, h = params["W"], params["H"]
    cs = params["C"]
    if cs.startswith("444"):
        return w * h * 3
    if cs.startswith("420"):
        return w * h + 2 * ((w // 2) * (h // 2))
    raise ValueError(f"unsupported Y4M colourspace C{cs}")


def y4m_info(payload: bytes) -> dict:
    """Parse the stream header and count frames: returns
    {width, height, fps, n_frames, colourspace, duration_ms}."""
    params, off = _y4m_header(payload)
    fsize = _y4m_frame_size(params)
    n = 0
    i = off
    L = len(payload)
    while i < L and payload[i : i + 5] == b"FRAME":
        i = payload.index(b"\n", i) + 1  # FRAME line may carry params
        i += fsize
        n += 1
    num, den = params["F"]
    fps = num / den if den else 0.0
    return {
        "width": params["W"],
        "height": params["H"],
        "fps": fps,
        "n_frames": n,
        "colourspace": params["C"],
        "duration_ms": int(round(n / fps * 1000)) if fps else 0,
    }


def decode_y4m_frame(payload: bytes, frame_index: int) -> np.ndarray:
    """Decode frame ``frame_index`` to an (h, w, 3) uint8 YUV array
    (chroma upsampled by repetition for C420). Raises IndexError if the
    stream has fewer frames."""
    params, off = _y4m_header(payload)
    fsize = _y4m_frame_size(params)
    w, h = params["W"], params["H"]
    i = off
    L = len(payload)
    k = 0
    while i < L and payload[i : i + 5] == b"FRAME":
        body = payload.index(b"\n", i) + 1
        if k == frame_index:
            raw = np.frombuffer(payload, dtype=np.uint8, count=fsize, offset=body)
            if params["C"].startswith("444"):
                y = raw[: w * h].reshape(h, w)
                u = raw[w * h : 2 * w * h].reshape(h, w)
                v = raw[2 * w * h :].reshape(h, w)
            else:  # 420: upsample chroma 2x2
                cw, chh = w // 2, h // 2
                y = raw[: w * h].reshape(h, w)
                u = raw[w * h : w * h + cw * chh].reshape(chh, cw)
                v = raw[w * h + cw * chh :].reshape(chh, cw)
                u = u.repeat(2, axis=0).repeat(2, axis=1)[:h, :w]
                v = v.repeat(2, axis=0).repeat(2, axis=1)[:h, :w]
            return np.stack([y, u, v], axis=2).copy()
        i = body + fsize
        k += 1
    raise IndexError(f"frame {frame_index} out of range ({k} frames)")


def encode_y4m(frames: np.ndarray, fps: int = 25) -> bytes:
    """Encode (n, h, w, 3) uint8 YUV frames as YUV4MPEG2 C444."""
    f = np.asarray(frames, dtype=np.uint8)
    if f.ndim != 4 or f.shape[3] != 3:
        raise ValueError("encode_y4m expects (n, h, w, 3) uint8")
    n, h, w, _ = f.shape
    out = bytearray(b"YUV4MPEG2 W%d H%d F%d:1 Ip A1:1 C444\n" % (w, h, fps))
    for k in range(n):
        out += b"FRAME\n"
        # planar: Y plane, U plane, V plane
        out += f[k, :, :, 0].tobytes()
        out += f[k, :, :, 1].tobytes()
        out += f[k, :, :, 2].tobytes()
    return bytes(out)


# --------------------------------------------------------------------------
# resampling


def resize_area(arr: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    """Resample an (h, w[, c]) uint8 array to (target_h, target_w[, c]).
    Uses exact block-mean (area average) when both dims shrink by an
    integer factor, else nearest-neighbour — both pure numpy, vectorised."""
    a = np.asarray(arr)
    h, w = a.shape[:2]
    if (
        h % target_h == 0
        and w % target_w == 0
        and h >= target_h
        and w >= target_w
    ):
        fh, fw = h // target_h, w // target_w
        shaped = a.reshape(target_h, fh, target_w, fw, -1).astype(np.float64)
        out = shaped.mean(axis=(1, 3))
        out = np.round(out).astype(np.uint8)
        return out.reshape(target_h, target_w, *a.shape[2:])
    ri = (np.arange(target_h) * h // target_h).clip(0, h - 1)
    ci = (np.arange(target_w) * w // target_w).clip(0, w - 1)
    return a[ri][:, ci].copy()


def rgb_to_gray(arr: np.ndarray) -> np.ndarray:
    """ITU-R BT.601 luma from an (h, w, 3) uint8 RGB array -> float64
    (h, w) in [0, 255]."""
    a = np.asarray(arr, dtype=np.float64)
    return a[:, :, 0] * 0.299 + a[:, :, 1] * 0.587 + a[:, :, 2] * 0.114
