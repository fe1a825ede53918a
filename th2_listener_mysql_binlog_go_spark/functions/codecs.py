"""Real media codecs for the multimodal decode path — dependency-free.

``decode_media(fake=False)`` (multimodal.py) was a declared stub for three
rounds because this container has no PIL/soundfile. These decoders close
that gap with REAL formats parsed from their actual byte layout using only
the stdlib + numpy:

- **PNG** (``\\x89PNG``): chunk walk -> IHDR dims -> zlib-inflate IDAT ->
  per-scanline unfilter (all five filter types: None/Sub/Up/Average/Paeth,
  RFC 2083 §6) -> HxWxC uint8 pixels. 8-bit gray/RGB/RGBA, non-interlaced
  (the overwhelmingly common case; interlaced raises).
- **PPM/PGM** (``P6``/``P5`` binary netpbm): header parse -> raw pixels.
- **WAV** (``RIFF..WAVE``): stdlib ``wave`` -> PCM int16 samples.

PIL / soundfile, when present, take precedence via import-try (they cover
JPEG/FLAC/etc.); these built-ins keep the REAL path exercised in
codec-less containers instead of skip-marking it away. Video container
parsing stays honestly unsupported (raises) — there is no stdlib demuxer.
"""

from __future__ import annotations

import io
import struct
import zlib

import numpy as np

try:  # optional upgrade path: full-format image decoding
    from PIL import Image as _PIL_Image  # type: ignore
except ImportError:  # pragma: no cover - absent in this container
    _PIL_Image = None

try:  # optional upgrade path: full-format audio decoding
    import soundfile as _soundfile  # type: ignore
except ImportError:  # pragma: no cover - absent in this container
    _soundfile = None


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def sniff_kind(payload: bytes) -> str | None:
    """Magic-byte format sniff -> 'png' | 'ppm' | 'pgm' | 'wav' | None.
    Sniffing beats trusting metadata mime strings: the payload is the
    ground truth on a lake where metadata drifts."""
    if payload[:8] == _PNG_SIG:
        return "png"
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:2] == b"P5":
        return "pgm"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    return None


# ------------------------------------------------------------------ png

def _unfilter_scanlines(raw: bytes, width: int, height: int, channels: int) -> np.ndarray:
    """PNG reconstruction (RFC 2083 §6.6): each scanline carries a filter
    byte; Sub/Up/Average/Paeth reconstruct against the prior byte/row.
    Row loop is O(height) Python over numpy row ops — fine for the
    per-blob granularity of a mapInPandas decode."""
    stride = width * channels
    expected = height * (stride + 1)
    if len(raw) != expected:
        raise ValueError(f"PNG data length {len(raw)} != expected {expected}")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        pos += 1
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos).astype(np.int32)
        pos += stride
        if ftype == 0:  # None
            rec = line
        elif ftype == 2:  # Up
            rec = (line + prev) & 0xFF
        else:
            # Sub/Average/Paeth need the in-progress row: per-pixel loop,
            # vectorized over channels via the bpp offset
            rec = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = rec[x - channels] if x >= channels else 0
                b = prev[x]
                if ftype == 1:  # Sub
                    rec[x] = (line[x] + a) & 0xFF
                elif ftype == 3:  # Average
                    rec[x] = (line[x] + (a + b) // 2) & 0xFF
                elif ftype == 4:  # Paeth
                    c = prev[x - channels] if x >= channels else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    rec[x] = (line[x] + pred) & 0xFF
                else:
                    raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    return out.reshape(height, width, channels)


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> (H, W, C) uint8. 8-bit depth, gray(0)/RGB(2)/RGBA(6),
    non-interlaced."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    width = height = None
    channels = 0
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data)
            if depth != 8:
                raise NotImplementedError(f"PNG bit depth {depth} unsupported")
            if interlace != 0:
                raise NotImplementedError("interlaced PNG unsupported")
            channels = {0: 1, 2: 3, 6: 4}.get(color, 0)
            if channels == 0:
                raise NotImplementedError(f"PNG color type {color} unsupported")
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG without IHDR")
    raw = zlib.decompress(bytes(idat))
    return _unfilter_scanlines(raw, width, height, channels)


# ------------------------------------------------------------------ netpbm

def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary netpbm (P6 RGB / P5 gray) -> (H, W, C) uint8."""
    magic = payload[:2]
    if magic not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM")
    channels = 3 if magic == b"P6" else 1
    # header: magic, whitespace/comments, width, height, maxval, single ws
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":  # comment to EOL
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    width, height, maxval = fields
    if maxval > 255:
        raise NotImplementedError("16-bit netpbm unsupported")
    n = width * height * channels
    pix = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
    return pix.reshape(height, width, channels)


# ------------------------------------------------------------------ wav

def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (samples int16 [n_frames, channels], sample_rate).
    stdlib ``wave`` — a real RIFF parser, PCM 16-bit."""
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        nch, sw, rate, nframes = w.getnchannels(), w.getsampwidth(), w.getframerate(), w.getnframes()
        if sw != 2:
            raise NotImplementedError(f"WAV sample width {sw} unsupported (PCM16 only)")
        frames = w.readframes(nframes)
    samples = np.frombuffer(frames, dtype=np.int16).reshape(-1, nch)
    return samples, rate


# ------------------------------------------------------------------ encoders
# Deterministic encoders so tests and the media synthesizer can produce
# REAL format bytes without any codec library: encode->decode round-trips
# prove the decoders against independently-constructed payloads.

def encode_png(pixels: np.ndarray) -> bytes:
    """(H, W, C) uint8 -> PNG bytes (8-bit, filter type None per scanline)."""
    pixels = np.ascontiguousarray(pixels, dtype=np.uint8)
    h, w, c = pixels.shape
    color = {1: 0, 3: 2, 4: 6}[c]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = b"".join(b"\x00" + pixels[y].tobytes() for y in range(h))
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


def encode_ppm(pixels: np.ndarray) -> bytes:
    """(H, W, 3|1) uint8 -> binary P6/P5 netpbm bytes."""
    pixels = np.ascontiguousarray(pixels, dtype=np.uint8)
    h, w, c = pixels.shape
    magic = b"P6" if c == 3 else b"P5"
    return magic + f"\n{w} {h}\n255\n".encode() + pixels.tobytes()


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """int16 [n_frames, channels] -> WAV bytes via stdlib ``wave``."""
    import wave

    samples = np.ascontiguousarray(samples, dtype=np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(samples.shape[1])
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


# ------------------------------------------------------------------ features

def image_features(pixels: np.ndarray, feature_dim: int) -> np.ndarray:
    """Deterministic content features from decoded pixels: per-channel
    means, then horizontal-stripe luminance means filling the remaining
    slots — shaped like a tiny embedding, derived from REAL pixel values."""
    h, w, c = pixels.shape
    flat = pixels.astype(np.float32)
    feats = np.zeros(feature_dim, dtype=np.float32)
    ch_means = flat.mean(axis=(0, 1))
    k = min(c, feature_dim)
    feats[:k] = ch_means[:k]
    rest = feature_dim - k
    if rest > 0:
        lum = flat.mean(axis=2).mean(axis=1)  # per-row luminance
        stripes = np.array_split(lum, rest)
        feats[k:] = [s.mean() if len(s) else 0.0 for s in stripes]
    return feats


def audio_features(samples: np.ndarray, rate: int, feature_dim: int) -> np.ndarray:
    """Deterministic content features from decoded PCM: RMS level, then
    stripe means over the (mono-mixed) waveform."""
    mono = samples.astype(np.float32).mean(axis=1) / 32768.0
    feats = np.zeros(feature_dim, dtype=np.float32)
    feats[0] = float(np.sqrt(np.mean(mono ** 2))) if len(mono) else 0.0
    if feature_dim > 1:
        stripes = np.array_split(mono, feature_dim - 1)
        feats[1:] = [s.mean() if len(s) else 0.0 for s in stripes]
    return feats


def decode_one(payload: bytes, feature_dim: int) -> tuple[int, int, np.ndarray] | None:
    """One blob -> (width, height, feature) via the best available real
    decoder, or None when the format is unsupported (caller decides
    raise-vs-null). Audio reports (n_frames, channels) as its dims."""
    kind = sniff_kind(payload)
    if kind in ("png", "ppm", "pgm"):
        if _PIL_Image is not None:
            img = _PIL_Image.open(io.BytesIO(payload))  # pragma: no cover
            pixels = np.asarray(img)
            if pixels.ndim == 2:
                pixels = pixels[:, :, None]
        elif kind == "png":
            pixels = decode_png(payload)
        else:
            pixels = decode_ppm(payload)
        h, w, _c = pixels.shape
        return w, h, image_features(pixels, feature_dim)
    if kind == "wav":
        if _soundfile is not None:  # pragma: no cover - absent here
            data, rate = _soundfile.read(io.BytesIO(payload), dtype="int16")
            samples = data.reshape(len(data), -1)
        else:
            samples, rate = decode_wav(payload)
        return samples.shape[0], samples.shape[1], audio_features(
            samples, rate, feature_dim)
    if _PIL_Image is not None:  # pragma: no cover - unknown-but-PIL-readable
        try:
            img = _PIL_Image.open(io.BytesIO(payload))
            pixels = np.asarray(img)
            if pixels.ndim == 2:
                pixels = pixels[:, :, None]
            h, w, _c = pixels.shape
            return w, h, image_features(pixels, feature_dim)
        except Exception:
            return None
    return None
