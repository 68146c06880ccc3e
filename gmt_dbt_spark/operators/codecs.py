"""REAL pure-Python media codecs: WAV (RIFF/PCM16) and BMP (24-bit).

The multimodal family's decode step was fully stubbed in r1 because
the container has no PIL/librosa/ffmpeg. These two formats need no
library — their byte layouts are public and parse with `struct` +
numpy — so the decode seam now has a REAL codec path: a RIFF chunk
walker (alignment-padded, unknown chunks skipped, as the spec
requires) and a BMP reader (bottom-up row order, 4-byte row stride,
BGR channel order). JPEG/MP4 remain honestly NotImplementedError.

Everything here imports WITHOUT a SparkSession (executors re-import
for mapInPandas) and is deterministic: the payload GENERATORS derive
samples/pixels from integer arithmetic on (doc_id, index), so the
decoded statistics are independently recomputable by the DuckDB
oracle from `range()` — the decode is checked end-to-end against SQL,
not against its own encoder.
"""

from __future__ import annotations

import struct

import numpy as np

WAV_RATE = 16_000


# ---------------------------------------------------------------- WAV

def make_wav(samples: np.ndarray, rate: int = WAV_RATE) -> bytes:
    """Serialize int16 mono PCM to a spec-compliant RIFF/WAVE file."""
    data = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_wav(payload: bytes) -> dict:
    """Parse a RIFF/WAVE payload: walk chunks (word-aligned, unknown
    chunks skipped per spec), require PCM16, return samples + format.

    This is a real parser, not a mirror of make_wav: it accepts any
    chunk ordering and extra chunks (LIST/INFO etc.)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, 8 + struct.unpack("<I", payload[4:8])[0]
    fmt = None
    data = None
    while pos + 8 <= min(end, len(payload)):
        cid = payload[pos : pos + 4]
        size = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        chunk = payload[pos + 8 : pos + 8 + size]
        if cid in (b"fmt ", b"data") and len(chunk) != size:
            # truncated mid-chunk (cut download): fail loudly instead
            # of silently returning fewer samples
            raise ValueError(f"truncated {cid!r} chunk: {len(chunk)} < {size}")
        if cid == b"fmt ":
            audio_fmt, n_ch, rate, _, _, bits = struct.unpack("<HHIIHH", chunk[:16])
            if audio_fmt != 1 or bits != 16:
                raise NotImplementedError("only PCM16 wav supported")
            fmt = {"n_channels": n_ch, "sample_rate": rate, "bits": bits}
        elif cid == b"data":
            data = chunk
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    samples = np.frombuffer(data, dtype="<i2")
    return {**fmt, "samples": samples}


def wav_samples_for(doc_id: int) -> np.ndarray:
    """Deterministic int16 waveform for a doc: n = 800 + (id%5)*160
    samples, s_i = ((id*31 + i*17) mod 2003) - 1001 — pure integer
    arithmetic the oracle recomputes over range(n)."""
    n = 800 + (doc_id % 5) * 160
    i = np.arange(n, dtype=np.int64)
    return (((doc_id * 31 + i * 17) % 2003) - 1001).astype(np.int16)


def wav_payload_for(doc_id: int) -> bytes:
    return make_wav(wav_samples_for(doc_id))


# ---------------------------------------------------------------- BMP

def make_bmp(px: np.ndarray) -> bytes:
    """Serialize an (h, w, 3) uint8 RGB array as a 24-bit BMP
    (bottom-up rows, BGR order, 4-byte row stride)."""
    h, w, _ = px.shape
    stride = (w * 3 + 3) & ~3
    rows = []
    for y in range(h - 1, -1, -1):
        row = px[y][:, ::-1].tobytes()  # RGB → BGR
        rows.append(row + b"\x00" * (stride - len(row)))
    data = b"".join(rows)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(data), 0, 0, 14 + 40)
    return header + info + data


def parse_bmp(payload: bytes) -> np.ndarray:
    """Parse a 24-bit uncompressed BMP into an (h, w, 3) uint8 RGB
    array — honors the pixel-data offset, signed height (top-down
    vs bottom-up), row stride, and BGR order."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack("<I", payload[10:14])[0]
    hdr_size, w, h_signed = struct.unpack("<Iii", payload[14:26])
    planes, bpp, compression = struct.unpack("<HHI", payload[26:34])
    if bpp != 24 or compression != 0:
        raise NotImplementedError("only 24-bit uncompressed BMP supported")
    h = abs(h_signed)
    stride = (w * 3 + 3) & ~3
    out = np.empty((h, w, 3), dtype=np.uint8)
    for row_idx in range(h):
        src = offset + row_idx * stride
        bgr = np.frombuffer(payload[src : src + w * 3], dtype=np.uint8).reshape(w, 3)
        # bottom-up unless height is negative (top-down)
        y = h - 1 - row_idx if h_signed > 0 else row_idx
        out[y] = bgr[:, ::-1]
    return out


def bmp_pixels_for(doc_id: int) -> np.ndarray:
    """Deterministic RGB image: w = 8 + id%8, h = 6 + id%6, channel c
    at (x, y) = (id + 7x + 13y + 29c) mod 256 — oracle-recomputable
    over range(w)·range(h)."""
    w = 8 + doc_id % 8
    h = 6 + doc_id % 6
    x = np.arange(w).reshape(1, w, 1)
    y = np.arange(h).reshape(h, 1, 1)
    c = np.arange(3).reshape(1, 1, 3)
    return ((doc_id + 7 * x + 13 * y + 29 * c) % 256).astype(np.uint8)


def bmp_payload_for(doc_id: int) -> bytes:
    return make_bmp(bmp_pixels_for(doc_id))


# ------------------------------------------------------- magic sniff

def decode_media(payload: bytes) -> dict:
    """Dispatch on magic bytes: RIFF/WAVE and BMP decode for REAL;
    anything else (JPEG, PNG, MP4...) raises — no fake decodes."""
    if payload[:4] == b"RIFF" and payload[8:12] != b"WAVE":
        # RIFF container but not audio (WebP, AVI, ...): genuinely
        # needs an external codec — keep the stub seam's contract
        raise NotImplementedError(
            "non-WAVE RIFF container needs PIL/ffmpeg — not in this container"
        )
    if payload[:4] == b"RIFF":
        w = parse_wav(payload)
        s = w["samples"].astype(np.int64)
        return {
            "kind": "audio/wav",
            "sample_rate": w["sample_rate"],
            "n_channels": w["n_channels"],
            "n_samples": int(s.size),
            "sumsq": int((s * s).sum()),
        }
    if payload[:2] == b"BM":
        px = parse_bmp(payload).astype(np.int64)
        return {
            "kind": "image/bmp",
            "width": int(px.shape[1]),
            "height": int(px.shape[0]),
            "sum_r": int(px[:, :, 0].sum()),
            "sum_g": int(px[:, :, 1].sum()),
            "sum_b": int(px[:, :, 2].sum()),
        }
    raise NotImplementedError(
        "real decode for this format needs PIL/ffmpeg — not in this container"
    )
