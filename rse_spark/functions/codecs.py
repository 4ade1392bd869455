"""Pure-numpy media codecs for container-free formats.

The sandbox ships no PIL/ffmpeg, but WAV (PCM), BMP (24-bit
uncompressed) and PPM (P6) are fully specified byte layouts decodable
with numpy alone — so the multimodal pipeline's decode step is REAL for
these formats and honestly NotImplementedError for entropy-coded ones
(JPEG/PNG/MP4), which need native codec libraries.

All functions operate on bytes <-> numpy arrays; they run inside
Arrow-batched mapInPandas workers (functions/multimodal.py).
"""

from __future__ import annotations

import struct

import numpy as np


# --- WAV (RIFF, PCM16) ------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """int16 samples [n] or [n, channels] -> RIFF/WAVE PCM16 bytes."""
    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    data = s.astype("<i2").tobytes()
    block_align = ch * 2
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, ch, sample_rate,
        sample_rate * block_align, block_align, 16,
    )
    data_hdr = struct.pack("<4sI", b"data", len(data))
    riff = struct.pack(
        "<4sI4s", b"RIFF", 4 + len(fmt) + len(data_hdr) + len(data), b"WAVE"
    )
    return riff + fmt + data_hdr + data


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 bytes -> (int16 samples [n, channels], rate)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, ch, rate, bits = 12, None, None, None
    samples = None
    while pos + 8 <= len(data):
        cid, size = struct.unpack_from("<4sI", data, pos)
        pos += 8
        if cid == b"fmt ":
            fmt_code, ch, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", data, pos
            )
            if fmt_code != 1 or bits != 16:
                raise NotImplementedError(
                    f"only PCM16 supported (fmt={fmt_code}, bits={bits})"
                )
        elif cid == b"data":
            raw = data[pos: pos + size]
            samples = np.frombuffer(raw, dtype="<i2")
        pos += size + (size & 1)  # chunks are word-aligned
    if samples is None or ch is None:
        raise ValueError("missing fmt/data chunk")
    return samples.reshape(-1, ch), int(rate)


# --- BMP (24-bit, uncompressed, bottom-up) -----------------------------------


def encode_bmp(pixels: np.ndarray) -> bytes:
    """uint8 RGB pixels [h, w, 3] -> 24-bit BMP bytes."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    row_len = (w * 3 + 3) & ~3
    pad = row_len - w * 3
    bgr = px[::-1, :, ::-1]  # bottom-up rows, BGR channel order
    body = bytearray()
    for row in bgr:
        body += row.tobytes() + b"\x00" * pad
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 54)
    return header + info + bytes(body)


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes -> uint8 RGB pixels [h, w, 3]."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", data, 10)[0]
    _, w, h, _, bits, comp = struct.unpack_from("<IiiHHI", data, 14)
    if bits != 24 or comp != 0:
        raise NotImplementedError(
            f"only 24-bit uncompressed BMP supported (bits={bits}, comp={comp})"
        )
    bottom_up = h > 0
    h = abs(h)
    row_len = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        data, dtype=np.uint8, count=row_len * h, offset=offset
    ).reshape(h, row_len)[:, : w * 3].reshape(h, w, 3)
    rgb = rows[:, :, ::-1]
    return rgb[::-1] if bottom_up else rgb


# --- PPM (P6 binary) ---------------------------------------------------------


def encode_ppm(pixels: np.ndarray) -> bytes:
    """uint8 RGB pixels [h, w, 3] -> PPM P6 bytes."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    return f"P6\n{w} {h}\n255\n".encode() + px.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    """PPM P6 bytes -> uint8 RGB pixels [h, w, 3]."""
    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header: three whitespace-separated ints, then a single whitespace
    fields, pos = [], 2
    while len(fields) < 3:
        while data[pos] in b" \t\r\n":
            pos += 1
        if data[pos: pos + 1] == b"#":  # comment line
            while data[pos] not in b"\r\n":
                pos += 1
            continue
        start = pos
        while data[pos] not in b" \t\r\n":
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise NotImplementedError("only 8-bit PPM supported")
    return np.frombuffer(
        data, dtype=np.uint8, count=w * h * 3, offset=pos
    ).reshape(h, w, 3)


def decode_image(data: bytes, codec: str) -> np.ndarray:
    """Dispatch by codec tag -> uint8 RGB [h, w, 3]. Entropy-coded
    formats raise NotImplementedError honestly (no codec libs here)."""
    if codec == "bmp":
        return decode_bmp(data)
    if codec == "ppm":
        return decode_ppm(data)
    raise NotImplementedError(
        f"codec {codec!r} needs a native image library (PIL/libjpeg);"
        " container-free formats supported here: bmp, ppm"
    )
