"""Pure-numpy media decode for headerless/raw formats (VERDICT r11
item 4): PPM "P6" (header + raw RGB bytes) and RIFF/WAVE PCM16
(chunked header + raw little-endian samples) are parseable with no
media library — which lets the media pipeline's *decode* step be real
for image AND audio instead of a declared stub. The
NotImplementedError hook in ``operators/multimodal.py`` is
correspondingly narrowed to genuinely-compressed formats (JPEG/PNG/
MP3/...), whose entropy coders do need PIL/ffmpeg.

Exactness contract (what makes the decoded path oracle-checkable):

* luma: ITU-R BT.601 integer form ``(299·R + 587·G + 114·B + 500) //
  1000``. The weights sum to 1000, so a grayscale pixel (R=G=B=v)
  decodes to EXACTLY v — no rounding drift for the synthetic corpus.
* resize: integer box-mean over equal blocks, defined only when both
  dimensions are multiples of 32 (floor division). An image constant
  on its blocks resizes to exactly the block values. Arbitrary-size
  area resampling needs fractional-weight accumulation that no SQL
  oracle could reproduce bit-for-bit — declared out of scope, raises.

Together: ``phash63_from_pixels(resize(decode_ppm(encode_ppm(
upsample(cells)))))`` equals ``phash63_from_cells(cells)`` bit-for-bit
(the phash module's cells/pixels identity), so the REAL-decode query
shares the synthetic path's DuckDB oracle verbatim.
"""

from __future__ import annotations

import numpy as np

N_PIX = 32  # pHash raster resolution (functions/phash.py)


class PpmError(ValueError):
    """Malformed PPM payload (bad magic, truncated raster, maxval)."""


def _read_header_token(buf: bytes, pos: int) -> tuple[bytes, int]:
    """Next whitespace-delimited header token, skipping '#' comments
    (the PPM spec allows comments anywhere in the header)."""
    n = len(buf)
    while pos < n:
        c = buf[pos : pos + 1]
        if c == b"#":
            while pos < n and buf[pos : pos + 1] not in (b"\n", b"\r"):
                pos += 1
        elif c.isspace():
            pos += 1
        else:
            break
    start = pos
    while pos < n and not buf[pos : pos + 1].isspace():
        pos += 1
    if start == pos:
        raise PpmError("truncated PPM header")
    return buf[start:pos], pos


def decode_ppm(payload: bytes) -> np.ndarray:
    """P6 PPM bytes → (height, width) uint8 luma plane (BT.601 integer
    weights — exact for grayscale rasters, see module docstring)."""
    tok, pos = _read_header_token(payload, 0)
    if tok != b"P6":
        raise PpmError(f"not a P6 PPM (magic {tok!r})")
    dims = []
    for _ in range(3):
        tok, pos = _read_header_token(payload, pos)
        if not tok.isdigit():
            raise PpmError(f"non-numeric PPM header field {tok!r}")
        dims.append(int(tok))
    width, height, maxval = dims
    if not (0 < maxval < 256):
        raise PpmError(f"unsupported maxval {maxval} (1-byte samples only)")
    if width <= 0 or height <= 0:
        raise PpmError(f"bad dimensions {width}x{height}")
    pos += 1  # exactly one whitespace byte separates header and raster
    need = width * height * 3
    raster = payload[pos : pos + need]
    if len(raster) != need:
        raise PpmError(
            f"truncated raster: need {need} bytes, have {len(raster)}"
        )
    rgb = np.frombuffer(raster, dtype=np.uint8).reshape(height, width, 3)
    r = rgb[:, :, 0].astype(np.int64)
    g = rgb[:, :, 1].astype(np.int64)
    b = rgb[:, :, 2].astype(np.int64)
    return ((299 * r + 587 * g + 114 * b + 500) // 1000).astype(np.uint8)


def encode_ppm(luma: np.ndarray) -> bytes:
    """(h, w) uint8 luma → grayscale P6 payload (R=G=B). The synthesis
    side of the roundtrip test and the synthetic media builder."""
    h, w = luma.shape
    header = f"P6\n{w} {h}\n255\n".encode()
    rgb = np.repeat(
        luma.astype(np.uint8)[:, :, None], 3, axis=2
    )
    return header + rgb.tobytes()


class WavError(ValueError):
    """Malformed WAV payload (bad chunks, unsupported encoding)."""


WAV_RATE = 16_000  # synthesis sample rate (any rate decodes)


def encode_wav(samples: np.ndarray, rate: int = WAV_RATE) -> bytes:
    """(n,) int16 PCM samples → canonical 44-byte-header RIFF/WAVE
    payload (mono, 16-bit little-endian — the raw-PCM layout that,
    like PPM, needs no entropy decoder)."""
    pcm = samples.astype("<i2").tobytes()
    n = len(pcm)
    import struct

    header = (
        b"RIFF"
        + struct.pack("<I", 36 + n)
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", n)
    )
    return header + pcm


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE bytes → (rate, int16 sample array). Walks the chunk
    list (fmt can be followed by LIST/fact chunks in the wild), accepts
    only PCM (format tag 1) mono/stereo 16-bit; stereo downmixes by
    exact integer mean (floor) so the oracle can reproduce it."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise WavError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if size < 16:
                raise WavError("short fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            if len(body) != size:
                raise WavError("truncated data chunk")
            data = body
            break  # fmt precedes data per spec
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise WavError("missing fmt or data chunk")
    tag, channels, rate, _, _, bits = fmt
    if tag != 1 or bits != 16:
        raise WavError(
            f"unsupported encoding (tag={tag}, bits={bits}); only raw "
            "PCM16 decodes without an entropy decoder"
        )
    if channels not in (1, 2):
        raise WavError(f"unsupported channel count {channels}")
    samples = np.frombuffer(
        data[: len(data) - (len(data) % (2 * channels))], dtype="<i2"
    ).astype(np.int64)
    if channels == 2:
        samples = (samples[0::2] + samples[1::2]) // 2
    return rate, samples.astype(np.int16)


def luma_resize_32(img: np.ndarray) -> np.ndarray:
    """(h, w) luma → (32, 32) by integer box-mean (floor). Defined only
    for h, w multiples of 32 — see module docstring for why arbitrary
    area resampling is declared out of the exactness contract."""
    h, w = img.shape
    if h % N_PIX or w % N_PIX:
        raise NotImplementedError(
            f"exact box-mean resize needs dimensions divisible by "
            f"{N_PIX}, got {h}x{w}; fractional area resampling is not "
            f"bit-reproducible in a SQL oracle"
        )
    bh, bw = h // N_PIX, w // N_PIX
    blocks = img.astype(np.int64).reshape(N_PIX, bh, N_PIX, bw)
    return (blocks.sum(axis=(1, 3)) // (bh * bw)).astype(np.uint8)
