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


class PngError(ValueError):
    """Malformed PNG payload (bad signature/CRC/chunk layout/filter)."""


PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _filter_scanline(
    ftype: int, raw: np.ndarray, prev: np.ndarray, bpp: int
) -> np.ndarray:
    """FORWARD filter (encode side), the spec's defining direction —
    implemented independently of the decoder's unfilter so a roundtrip
    test genuinely checks both against RFC 2083 §6. `raw`/`prev` are
    int64 scanlines (prev all-zero for row 0); returns filtered bytes."""
    n = len(raw)
    left = np.zeros(n, dtype=np.int64)
    left[bpp:] = raw[:-bpp]
    upleft = np.zeros(n, dtype=np.int64)
    upleft[bpp:] = prev[:-bpp]
    if ftype == 0:
        out = raw
    elif ftype == 1:
        out = raw - left
    elif ftype == 2:
        out = raw - prev
    elif ftype == 3:
        out = raw - (left + prev) // 2
    elif ftype == 4:
        p = left + prev - upleft
        pa, pb, pc = (
            np.abs(p - left),
            np.abs(p - prev),
            np.abs(p - upleft),
        )
        pred = np.where(
            (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
        )
        out = raw - pred
    else:
        raise PngError(f"unknown filter type {ftype}")
    return (out % 256).astype(np.uint8)


def _unfilter_scanline(
    ftype: int, fl: np.ndarray, prev: np.ndarray, bpp: int
) -> np.ndarray:
    """INVERSE filter (decode side). Sub/Average/Paeth recur on the
    reconstructed left neighbor, so they walk pixel groups left to
    right (vectorized across channels within each step); None/Up are
    whole-line array ops. Inputs int64, returns int64 in [0, 255]."""
    if ftype == 0:
        return fl.copy()
    if ftype == 2:
        return (fl + prev) % 256
    n = len(fl)
    out = np.zeros(n, dtype=np.int64)
    if ftype == 1:
        out[:bpp] = fl[:bpp]
        for i in range(bpp, n, bpp):
            out[i : i + bpp] = fl[i : i + bpp] + out[i - bpp : i]
        return out % 256
    if ftype == 3:
        out[:bpp] = (fl[:bpp] + prev[:bpp] // 2) % 256
        for i in range(bpp, n, bpp):
            out[i : i + bpp] = (
                fl[i : i + bpp]
                + (out[i - bpp : i] + prev[i : i + bpp]) // 2
            ) % 256
        return out
    if ftype == 4:
        out[:bpp] = (fl[:bpp] + prev[:bpp]) % 256  # left/upleft are 0
        for i in range(bpp, n, bpp):
            a = out[i - bpp : i]
            b = prev[i : i + bpp]
            c = prev[i - bpp : i]
            p = a + b - c
            pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
            pred = np.where(
                (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
            )
            out[i : i + bpp] = (fl[i : i + bpp] + pred) % 256
        return out
    raise PngError(f"unknown filter type {ftype}")


def encode_png(
    luma: np.ndarray,
    rgb: bool = False,
    row_filters=None,
    level: int = 6,
) -> bytes:
    """(h, w) uint8 luma → real PNG payload: IHDR + zlib-deflated,
    per-scanline-filtered IDAT + IEND, CRCs included. ``rgb`` writes
    color type 2 with R=G=B (lossless luma roundtrip, same as the PPM
    builder); default is grayscale color type 0. ``row_filters`` picks
    the forward filter per scanline (int, or a sequence of h ints) —
    ``row % 5`` in the media builder exercises every unfilter branch
    of the decoder inside the registered query itself."""
    import struct
    import zlib

    h, w = luma.shape
    plane = (
        np.repeat(luma.astype(np.uint8)[:, :, None], 3, axis=2)
        if rgb
        else luma.astype(np.uint8)[:, :, None]
    )
    bpp = plane.shape[2]
    if row_filters is None:
        row_filters = [0] * h
    elif isinstance(row_filters, int):
        row_filters = [row_filters] * h
    if len(row_filters) != h:
        raise PngError(f"need {h} row filters, got {len(row_filters)}")
    rows = plane.reshape(h, w * bpp).astype(np.int64)
    prev = np.zeros(w * bpp, dtype=np.int64)
    out = bytearray()
    for y in range(h):
        ft = int(row_filters[y])
        out.append(ft)
        out += _filter_scanline(ft, rows[y], prev, bpp).tobytes()
        prev = rows[y]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2 if rgb else 0, 0, 0, 0)
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(out), level))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes → (h, w) uint8 luma plane. A real compressed-format
    decoder in stdlib zlib + numpy: signature check, chunk walk with
    CRC32 verification, multi-IDAT concatenation, zlib inflate, full
    five-filter scanline reconstruction (RFC 2083 §6), then the same
    BT.601 integer luma as :func:`decode_ppm` for color type 2 (color
    type 0 is already luma). Supported: bit depth 8, color types 0/2,
    no interlace — palette/alpha/16-bit/Adam7 raise with the reason."""
    import struct
    import zlib

    if payload[: len(PNG_SIG)] != PNG_SIG:
        raise PngError("bad PNG signature")
    pos = len(PNG_SIG)
    ihdr = None
    idat = bytearray()
    ended = False
    while pos + 8 <= len(payload):
        (clen,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + clen]
        if len(data) != clen:
            raise PngError(f"truncated {ctype!r} chunk")
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + clen : pos + 12 + clen]
        )
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise PngError(f"CRC mismatch in {ctype!r} chunk")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            ended = True
            break
        pos += 12 + clen
    if ihdr is None or not idat or not ended:
        raise PngError("missing IHDR/IDAT/IEND")
    w, h, depth, ctype_n, comp, filt, interlace = ihdr
    if depth != 8 or ctype_n not in (0, 2):
        raise NotImplementedError(
            f"PNG bit depth {depth} / color type {ctype_n}: only 8-bit "
            "grayscale(0)/truecolor(2) decode here (palette/alpha/16-bit "
            "need expansion passes out of this decoder's scope)"
        )
    if comp != 0 or filt != 0:
        raise PngError(f"unknown compression/filter method {comp}/{filt}")
    if interlace != 0:
        raise NotImplementedError("Adam7 interlace not supported")
    if w <= 0 or h <= 0:
        raise PngError(f"bad dimensions {w}x{h}")
    bpp = 3 if ctype_n == 2 else 1
    stride = w * bpp
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise PngError(f"IDAT inflate failed: {e}") from e
    if len(raw) != h * (stride + 1):
        raise PngError(
            f"decompressed size {len(raw)} != {h}x(1+{stride}) expected"
        )
    flat = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    prev = np.zeros(stride, dtype=np.int64)
    plane = np.zeros((h, stride), dtype=np.int64)
    for y in range(h):
        prev = _unfilter_scanline(
            int(flat[y, 0]), flat[y, 1:].astype(np.int64), prev, bpp
        )
        plane[y] = prev
    if ctype_n == 0:
        return plane.astype(np.uint8)
    rgbv = plane.reshape(h, w, 3)
    return (
        (299 * rgbv[:, :, 0] + 587 * rgbv[:, :, 1] + 114 * rgbv[:, :, 2] + 500)
        // 1000
    ).astype(np.uint8)


def decode_image(payload: bytes) -> np.ndarray:
    """Format-sniffing image decode — the media-lake read shape, where
    one binary column carries mixed formats: PNG by signature, P6 PPM
    by magic. Returns the (h, w) uint8 luma plane either way."""
    if payload[: len(PNG_SIG)] == PNG_SIG:
        return decode_png(payload)
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    raise NotImplementedError(
        "unrecognized image payload (no PNG signature / P6 magic); "
        "compressed formats beyond PNG (JPEG/...) need PIL"
    )
