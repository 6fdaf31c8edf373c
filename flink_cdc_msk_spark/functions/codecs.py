"""Pure-numpy image decode for headerless/raw formats (VERDICT r11
item 4): PPM "P6" is a header plus raw RGB bytes — parseable in ~30
lines with no imaging library — which lets the media pipeline's
*decode* step be real for at least one format instead of a declared
stub. The NotImplementedError hook in ``operators/multimodal.py`` is
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
