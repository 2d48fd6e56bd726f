"""Pure-numpy media codecs: BMP (24-bit BI_RGB), PPM/PGM (binary), WAV
(PCM16), Y4M raw video (YUV4MPEG2 mono/420 luma). No image/audio libraries exist in this environment, but these
three formats are simple enough to parse from their public byte-layout
specs with numpy alone — which turns the multimodal decode stage from a
stub into a real codec path for real formats, while exotic formats
(JPEG/MP4/...) still raise cleanly.

Encoders exist so tests and registry queries can synthesize valid
payloads deterministically; parsers return plain dicts of metadata +
ndarray samples/pixels so the Spark layer stays free of codec detail.

Format references (public): BMP file header + BITMAPINFOHEADER layout,
netpbm P5/P6 headers, RIFF/WAVE fmt+data chunk layout.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "sniff_format",
    "parse_bmp",
    "encode_bmp",
    "parse_ppm",
    "encode_ppm",
    "parse_wav",
    "encode_wav",
    "parse_y4m",
    "encode_y4m",
    "decode",
]


def sniff_format(payload: bytes) -> str | None:
    """Identify a payload by magic bytes: 'bmp' | 'ppm' | 'pgm' | 'wav'
    or None for anything unrecognized."""
    if payload is None or len(payload) < 12:
        return None
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:2] == b"P5":
        return "pgm"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:9] == b"YUV4MPEG2":
        return "y4m"
    return None


# --- BMP: 14-byte file header + 40-byte BITMAPINFOHEADER, bottom-up rows
# padded to 4 bytes, BGR order, uncompressed (BI_RGB) 24bpp ---------------


def parse_bmp(payload: bytes) -> dict:
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, width, height = struct.unpack_from("<IiI", payload, 14)
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if compression != 0 or bpp != 24:
        raise ValueError(f"only uncompressed 24bpp BMP supported, got bpp={bpp}")
    height = int(height)
    row_stride = (width * 3 + 3) & ~3
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row_stride * height, offset=data_off
    ).reshape(height, row_stride)
    # bottom-up row order, BGR → top-down RGB
    px = rows[::-1, : width * 3].reshape(height, width, 3)[:, :, ::-1]
    return {
        "format": "bmp",
        "width": int(width),
        "height": height,
        "n_channels": 3,
        "pixels": px,
    }


def encode_bmp(pixels: np.ndarray) -> bytes:
    """pixels: (H, W, 3) uint8 RGB, top-down → 24bpp BI_RGB BMP bytes."""
    h, w, c = pixels.shape
    assert c == 3
    row_stride = (w * 3 + 3) & ~3
    body = np.zeros((h, row_stride), dtype=np.uint8)
    body[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)
    data = body.tobytes()
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return header + info + data


# --- netpbm: "P6\n<w> <h>\n<maxval>\n" + raw RGB (P5: grayscale) ---------


def parse_ppm(payload: bytes) -> dict:
    magic = payload[:2]
    if magic not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM payload")
    # header tokens: magic, width, height, maxval; '#' comments legal
    tokens: list[int] = []
    i = 2
    while len(tokens) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        tokens.append(int(payload[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    ch = 3 if magic == b"P6" else 1
    px = np.frombuffer(payload, dtype=np.uint8, count=w * h * ch, offset=i)
    return {
        "format": "ppm" if ch == 3 else "pgm",
        "width": w,
        "height": h,
        "n_channels": ch,
        "pixels": px.reshape(h, w, ch),
    }


def encode_ppm(pixels: np.ndarray) -> bytes:
    """pixels: (H, W, 3) RGB or (H, W, 1)/(H, W) grayscale uint8."""
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, ch = pixels.shape
    magic = b"P6" if ch == 3 else b"P5"
    return magic + f"\n{w} {h}\n255\n".encode() + pixels.tobytes()


# --- WAV: RIFF container, fmt chunk (PCM=1, 16-bit), data chunk ----------


def parse_wav(payload: bytes) -> dict:
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    i, n = 12, len(payload)
    fmt = None
    samples = None
    while i + 8 <= n:
        cid, csize = struct.unpack_from("<4sI", payload, i)
        i += 8
        if cid == b"fmt ":
            audio_fmt, n_ch, rate, _byte_rate, _align, bits = struct.unpack_from(
                "<HHIIHH", payload, i
            )
            if audio_fmt != 1 or bits != 16:
                raise ValueError("only 16-bit PCM WAV supported")
            fmt = (n_ch, rate)
        elif cid == b"data":
            samples = np.frombuffer(payload, dtype="<i2", count=csize // 2, offset=i)
        i += csize + (csize & 1)  # chunks are word-aligned
    if fmt is None or samples is None:
        raise ValueError("WAV missing fmt or data chunk")
    n_ch, rate = fmt
    n_frames = len(samples) // n_ch
    return {
        "format": "wav",
        "n_channels": n_ch,
        "sample_rate": rate,
        "n_samples": n_frames,
        "duration_ms": int(n_frames * 1000 // rate),
        "samples": samples.reshape(-1, n_ch),
    }


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """samples: (N,) or (N, CH) int16 → PCM16 WAV bytes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    samples = samples.astype("<i2")
    n_ch = samples.shape[1]
    data = samples.tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, n_ch, sample_rate, sample_rate * 2 * n_ch, 2 * n_ch, 16
    )
    chunks = b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def decode(payload: bytes) -> dict:
    """Sniff + parse. Raises ValueError on unknown/unsupported formats —
    the caller decides whether that's a dead-letter row or an error."""
    kind = sniff_format(payload)
    if kind is None:
        raise ValueError("unrecognized media format")
    if kind == "bmp":
        return parse_bmp(payload)
    if kind in ("ppm", "pgm"):
        return parse_ppm(payload)
    if kind == "y4m":
        return parse_y4m(payload)
    return parse_wav(payload)


# --- Y4M (YUV4MPEG2): the textual-header raw-video interchange format
# used by ffmpeg/mplayer/x264. "YUV4MPEG2 W<w> H<h> F<n>:<d> [C<cs>]\n"
# then per frame "FRAME\n" + raw planes. Cmono = Y plane only (w*h
# bytes/frame); C420* = Y + quarter-res U,V (w*h*3/2). ------------------


def parse_y4m(payload: bytes, frame_stride: int = 1) -> dict:
    """Parse a YUV4MPEG2 stream; returns metadata + the luma (Y) plane
    of every ``frame_stride``-th frame as uint8 (n, h, w).

    ``frame_stride`` exists because frame sampling should happen DURING
    the parse — decoding every frame of a video only to throw most away
    is the thing a sampling operator exists to avoid."""
    if not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a Y4M payload")
    nl = payload.index(b"\n")
    width = height = None
    colorspace = "420jpeg"
    fps_num, fps_den = 25, 1
    for tag in payload[10:nl].split(b" "):
        if not tag:
            continue
        k, v = tag[:1], tag[1:]
        if k == b"W":
            width = int(v)
        elif k == b"H":
            height = int(v)
        elif k == b"F":
            num, den = v.split(b":")
            fps_num, fps_den = int(num), int(den)
        elif k == b"C":
            colorspace = v.decode()
    if not width or not height:
        raise ValueError("Y4M header missing W/H")
    if colorspace == "mono":
        frame_size = width * height
    elif colorspace.startswith("420"):
        frame_size = width * height * 3 // 2
    else:
        raise ValueError(f"unsupported Y4M colorspace {colorspace}")

    frames, idx, pos, n_frames = [], [], nl + 1, 0
    while pos < len(payload):
        fnl = payload.index(b"\n", pos)
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError("corrupt Y4M frame marker")
        body = payload[fnl + 1 : fnl + 1 + frame_size]
        if len(body) < frame_size:
            raise ValueError("truncated Y4M frame")
        if n_frames % frame_stride == 0:
            y = np.frombuffer(body[: width * height], dtype=np.uint8)
            frames.append(y.reshape(height, width))
            idx.append(n_frames)
        n_frames += 1
        pos = fnl + 1 + frame_size
    return {
        "format": "y4m",
        "width": width,
        "height": height,
        "fps_num": fps_num,
        "fps_den": fps_den,
        "colorspace": colorspace,
        "n_frames": n_frames,
        "frame_indices": idx,
        "y_frames": (
            np.stack(frames) if frames else np.zeros((0, height, width), np.uint8)
        ),
    }


def encode_y4m(
    y_frames: np.ndarray, fps: tuple[int, int] = (25, 1)
) -> bytes:
    """Encode luma-only frames (n, h, w) uint8 as Y4M Cmono."""
    n, h, w = y_frames.shape
    out = [f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 Cmono\n".encode()]
    for i in range(n):
        out.append(b"FRAME\n")
        out.append(y_frames[i].astype(np.uint8).tobytes())
    return b"".join(out)
