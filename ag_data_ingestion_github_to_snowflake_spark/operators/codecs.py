"""Pure-numpy codecs for dependency-free media formats: BMP, PPM, PNG, WAV.

These are real decoders for the public, dependency-free subset of the
multimodal surface (reference north-star "multimodal columns"):

- BMP: 24-bit uncompressed ``BI_RGB`` with a BITMAPINFOHEADER —
  bottom-up rows, BGR byte order, 4-byte row padding.
- PPM: binary ``P6`` with maxval 255.
- WAV: RIFF/WAVE, PCM (format 1), 16-bit little-endian samples.

PNG is decoded with stdlib ``zlib`` + the public spec (8-bit depths,
all five scanline filters, gray/RGB/palette/alpha color types, CRC
verification; 16-bit and Adam7 raise explicitly). GIF (87a/89a) is
decoded with a from-scratch LZW implementation straight from the
public spec — variable code widths grown in decoder lockstep, the
cScSc self-referential code case, sub-block reassembly, global color
table; animation/local-palette/interlace variants raise explicitly.
Baseline JPEG (SOF0, Huffman, 4:4:4 / 4:2:0) is decoded by
``operators/jpeg.py`` — a from-scratch matrix-DCT implementation of
the public spec; progressive/arithmetic/restart variants raise
explicitly there. FLAC is decoded by ``operators/flac.py`` — a
from-scratch implementation of the public spec (RFC 9639): Rice-coded
fixed/LPC predictors, stereo decorrelation, CRC-8/16 + MD5 verified.
The remaining compressed audio formats (MP3/OGG) need codec libraries
not in this container; ``audio_features`` detects their magic bytes
and raises ``NotImplementedError`` explicitly rather than guessing.

Feature conventions (shared with ``operators/multimodal.py`` kernels):

- ``mean_luma`` uses integer Rec.601 coefficients (299, 587, 114)/1000
  over uint8 RGB, normalised to [0, 1]:
  ``sum(299*R + 587*G + 114*B) / (n_pixels * 255000)``. The sum is
  exact int64 arithmetic, so the value is reproducible bit-for-bit by
  any independent integer implementation (the oracle relies on this).
- ``rms_energy`` is ``sqrt(mean(sample^2)) / 32768`` over int16 PCM
  (all channels pooled), again an exact integer sum under the sqrt.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# BMP (24-bit uncompressed, BITMAPINFOHEADER)
# ---------------------------------------------------------------------------


def encode_bmp(img: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a 24-bit BI_RGB BMP."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("encode_bmp expects (h, w, 3) uint8 RGB")
    h, w, _ = img.shape
    stride = (w * 3 + 3) & ~3
    pad = stride - w * 3
    # BGR byte order, bottom-up row order, rows padded to 4 bytes.
    bgr = img[::-1, :, ::-1]
    rows = bgr.reshape(h, w * 3)
    if pad:
        rows = np.hstack([rows, np.zeros((h, pad), dtype=np.uint8)])
    pixel_data = rows.tobytes()
    offset = 14 + 40
    file_size = offset + len(pixel_data)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, offset)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_data), 2835, 2835, 0, 0)
    return header + dib + pixel_data


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BMP into an (h, w, 3) uint8 RGB array."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", data, 10)[0]
    dib_size = struct.unpack_from("<I", data, 14)[0]
    if dib_size < 40:
        raise NotImplementedError(f"BMP DIB header size {dib_size} unsupported")
    w, h_signed = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    compression = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"only 24-bit BI_RGB BMP supported (bpp={bpp}, comp={compression})")
    top_down = h_signed < 0
    h = abs(h_signed)
    check_decode_dims(w, h)
    stride = (w * 3 + 3) & ~3
    if len(data) < offset + stride * h:
        raise ValueError("truncated BMP pixel array")
    rows = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=offset)
    rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    bgr = rows if top_down else rows[::-1]
    return np.ascontiguousarray(bgr[:, :, ::-1])


# ---------------------------------------------------------------------------
# PPM (binary P6, maxval 255)
# ---------------------------------------------------------------------------


def encode_ppm(img: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a binary P6 PPM."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("encode_ppm expects (h, w, 3) uint8 RGB")
    h, w, _ = img.shape
    return f"P6\n{w} {h}\n255\n".encode("ascii") + img.tobytes()


def _ppm_tokens(data: bytes, n: int) -> tuple[list[int], int]:
    """Read ``n`` whitespace/comment-delimited integer header tokens.

    Returns the tokens and the offset of the first raster byte (one
    whitespace char after the last token, per the Netpbm spec).
    """
    tokens: list[int] = []
    i = 2  # past "P6"
    while len(tokens) < n:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if i < len(data) and data[i : i + 1] == b"#":
            while i < len(data) and data[i] != 0x0A:
                i += 1
            continue
        start = i
        while i < len(data) and not data[i : i + 1].isspace():
            i += 1
        if start == i:
            raise ValueError("truncated PPM header")
        tokens.append(int(data[start:i]))
    return tokens, i + 1


def decode_ppm(data: bytes) -> np.ndarray:
    """Decode a binary P6 PPM into an (h, w, 3) uint8 RGB array."""
    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    (w, h, maxval), raster = _ppm_tokens(data, 3)
    check_decode_dims(w, h)
    if maxval != 255:
        raise NotImplementedError(f"PPM maxval {maxval} unsupported (need 255)")
    if len(data) < raster + w * h * 3:
        raise ValueError("truncated PPM raster")
    px = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=raster)
    return px.reshape(h, w, 3).copy()


# ---------------------------------------------------------------------------
# PNG (stdlib zlib + public spec, no codec library)
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as an 8-bit truecolor PNG.

    ``filter_type`` applies one scanline filter (0-4) to every row —
    type 0 is the natural writer; the others exist so round-trip tests
    exercise every defilter path in ``decode_png``.
    """
    import zlib

    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("encode_png expects (h, w, 3) uint8 RGB")
    if filter_type not in (0, 1, 2, 3, 4):
        raise ValueError(f"bad filter type {filter_type}")
    h, w, _ = img.shape
    raw = img.astype(np.int64)
    prev = np.zeros((w, 3), dtype=np.int64)
    lines = []
    for y in range(h):
        cur = raw[y]
        left = np.vstack([np.zeros((1, 3), dtype=np.int64), cur[:-1]])
        ul = np.vstack([np.zeros((1, 3), dtype=np.int64), prev[:-1]])
        if filter_type == 0:
            enc = cur
        elif filter_type == 1:
            enc = cur - left
        elif filter_type == 2:
            enc = cur - prev
        elif filter_type == 3:
            enc = cur - (left + prev) // 2
        else:
            enc = cur - _paeth(left, prev, ul)
        lines.append(bytes([filter_type]) + (enc % 256).astype(np.uint8).tobytes())
        prev = cur
    idat = zlib.compress(b"".join(lines))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized (a=left, b=up, c=upper-left)."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def decode_png(data: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG into (h, w, 3) uint8 RGB.

    Pure stdlib-zlib + numpy: chunk walk (CRC-verified), one inflate,
    then scanline defiltering (all five filter types). Color types
    grayscale (0), truecolor (2), palette (3), gray+alpha (4) and
    RGBA (6) are supported — alpha is dropped, palette is expanded via
    PLTE. Bit depths other than 8 and Adam7 interlacing raise
    ``NotImplementedError`` explicitly.
    """
    import zlib

    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    i = 8
    ihdr = None
    plte = None
    idat = []
    while i + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, i)
        ctype = data[i + 4 : i + 8]
        body = data[i + 8 : i + 8 + length]
        (crc,) = struct.unpack_from(">I", data, i + 8 + length)
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        i += 12 + length
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    check_decode_dims(w, h)
    if depth != 8:
        raise NotImplementedError(f"PNG bit depth {depth} unsupported (need 8)")
    if interlace != 0:
        raise NotImplementedError("Adam7-interlaced PNG unsupported")
    if comp != 0 or filt != 0:
        raise ValueError("invalid PNG compression/filter method")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if channels is None:
        raise NotImplementedError(f"PNG color type {color} unsupported")
    raw = zlib.decompress(b"".join(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline data has wrong length")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int64)
        if ft == 0:
            cur = line
        elif ft == 2:
            cur = (line + prev) % 256
        elif ft in (1, 3, 4):
            # left-referencing filters are a per-pixel recurrence; walk
            # pixel groups (bytes-per-pixel lanes stay vectorized)
            cur = np.zeros(stride, dtype=np.int64)
            for x in range(w):
                lo = x * channels
                hi = lo + channels
                left = cur[lo - channels : lo] if x else np.zeros(channels, dtype=np.int64)
                up = prev[lo:hi]
                ul = prev[lo - channels : lo] if x else np.zeros(channels, dtype=np.int64)
                if ft == 1:
                    pred = left
                elif ft == 3:
                    pred = (left + up) // 2
                else:
                    pred = _paeth(left, up, ul)
                cur[lo:hi] = (line[lo:hi] + pred) % 256
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    px = out.reshape(h, w, channels)
    if color == 2:
        return px.copy()
    if color == 0:
        return np.repeat(px, 3, axis=2).copy()
    if color == 4:
        return np.repeat(px[:, :, :1], 3, axis=2).copy()
    if color == 6:
        return px[:, :, :3].copy()
    # color == 3: palette expansion
    if plte is None:
        raise ValueError("palette PNG missing PLTE chunk")
    return plte[px[:, :, 0]].copy()


# ---------------------------------------------------------------------------
# WAV (RIFF/WAVE, PCM16)
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int, channels: int = 1) -> bytes:
    """Encode int16 PCM samples (frame-major, interleaved) as a WAV file."""
    pcm = np.asarray(samples, dtype="<i2")
    data = pcm.tobytes()
    block_align = 2 * channels
    byte_rate = sample_rate * block_align
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, block_align, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int, int]:
    """Decode a PCM16 WAV; returns (int16 samples, sample_rate, channels)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    sample_rate = channels = bits = None
    pcm = None
    i = 12
    while i + 8 <= len(data):
        cid = data[i : i + 4]
        (size,) = struct.unpack_from("<I", data, i + 4)
        body = data[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            fmt_tag, channels, sample_rate, _, _, bits = struct.unpack_from("<HHIIHH", body, 0)
            if fmt_tag != 1:
                raise NotImplementedError(f"WAV format tag {fmt_tag} unsupported (need PCM)")
            if bits != 16:
                raise NotImplementedError(f"{bits}-bit WAV unsupported (need 16)")
        elif cid == b"data":
            pcm = np.frombuffer(body, dtype="<i2")
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if sample_rate is None or pcm is None:
        raise ValueError("WAV missing fmt/data chunk")
    if sample_rate == 0:
        raise ValueError("WAV zero sample_rate")
    return pcm, sample_rate, channels


# ---------------------------------------------------------------------------
# GIF (87a/89a, single frame, global color table, from-scratch LZW)
# ---------------------------------------------------------------------------

_GIF_MAX_CODE = 4096  # 12-bit LZW ceiling (public GIF spec)


def _lzw_compress(indices: list[int], mcs: int) -> bytes:
    """GIF LZW: variable-width codes, LSB-first bit packing.

    Code width grows when next_code reaches 2^width + 1 (one later
    than the decoder's 2^width — the decoder's table add lags the
    encoder's by one code, the classic GIF lockstep). When the table
    hits 4096 this encoder simply stops adding entries (spec-legal;
    the decoder mirrors by not adding past 4096).
    """
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    table: dict[tuple[int, ...], int] = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    code_size = mcs + 1
    codes: list[tuple[int, int]] = [(clear, code_size)]
    buf: tuple[int, ...] = ()
    for sym in indices:
        cand = buf + (sym,)
        if cand in table:
            buf = cand
            continue
        codes.append((table[buf], code_size))
        if next_code < _GIF_MAX_CODE:
            table[cand] = next_code
            next_code += 1
            if next_code == (1 << code_size) + 1 and code_size < 12:
                code_size += 1
        buf = (sym,)
    if buf:
        codes.append((table[buf], code_size))
        # The decoder performs one more table add after this final real
        # code; if that add fills the current width, it reads EOI at
        # width+1 — mirror that phantom growth here.
        if (
            next_code < _GIF_MAX_CODE
            and next_code == (1 << code_size)
            and code_size < 12
        ):
            code_size += 1
    codes.append((eoi, code_size))
    acc = nbits = 0
    out = bytearray()
    for code, size in codes:
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decompress(data: bytes, mcs: int, max_out: int | None = None) -> list[int]:
    """Inverse of :func:`_lzw_compress`, including the cScSc case
    (received code == next table slot -> prev + prev[0]).

    ``max_out`` bounds the decoded index count: LZW expansion is
    quadratic in the code stream, so a small crafted stream could
    otherwise emit gigabytes before the pixel-count check downstream
    ever sees it (found by fuzzing). GIF callers pass w*h — any code
    past that is corrupt by definition."""
    if not 2 <= mcs <= 8:
        # spec range for a <=256-color palette; a corrupt byte here
        # (up to 255) would size the initial table at 2^mcs entries
        raise ValueError(f"GIF LZW minimum code size {mcs} out of range")
    clear, eoi = 1 << mcs, (1 << mcs) + 1

    def fresh() -> tuple[dict[int, tuple[int, ...]], int, int]:
        return {i: (i,) for i in range(clear)}, eoi + 1, mcs + 1

    table, next_code, code_size = fresh()
    out: list[int] = []
    prev: tuple[int, ...] | None = None
    acc = nbits = pos = 0
    while True:
        while nbits < code_size:
            if pos >= len(data):
                raise ValueError("truncated GIF LZW stream (no EOI)")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table, next_code, code_size = fresh()
            prev = None
            continue
        if code == eoi:
            return out
        if code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + (prev[0],)
        else:
            raise ValueError(f"corrupt GIF LZW code {code}")
        out.extend(entry)
        if max_out is not None and len(out) > max_out:
            raise ValueError(
                f"GIF LZW stream expands past {max_out} declared pixels"
            )
        if prev is not None and next_code < _GIF_MAX_CODE:
            table[next_code] = prev + (entry[0],)
            next_code += 1
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry


def encode_gif(img: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array (<=256 distinct colors) as a
    single-frame GIF89a with a global color table."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("encode_gif expects (h, w, 3) uint8 RGB")
    h, w, _ = img.shape
    flat = img.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    inverse = inverse.ravel()  # numpy 2.0 returns (n,1) for axis unique
    if len(palette) > 256:
        raise ValueError(f"GIF needs <=256 colors, image has {len(palette)}")
    bits = max(1, int(len(palette) - 1).bit_length())  # GCT size exponent
    n_entries = 1 << bits
    mcs = max(2, bits)
    gct = np.zeros((n_entries, 3), dtype=np.uint8)
    gct[: len(palette)] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out.append(0x80 | (bits - 1))  # GCT present, size field = bits-1
    out += b"\x00\x00"  # background index, aspect ratio
    out += gct.tobytes()
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    out.append(mcs)
    payload = _lzw_compress([int(i) for i in inverse], mcs)
    for i in range(0, len(payload), 255):
        block = payload[i : i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"
    return bytes(out)


def decode_gif(data: bytes) -> np.ndarray:
    """Decode a single-frame GIF into an (h, w, 3) uint8 RGB array.

    Supports 87a/89a with a global color table; extension blocks are
    skipped. Interlaced images, local color tables, and multi-frame
    animations raise ``NotImplementedError`` explicitly.
    """
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w, h = struct.unpack_from("<HH", data, 6)
    check_decode_dims(w, h)
    packed = data[10]
    pos = 13
    if not packed & 0x80:
        raise NotImplementedError("GIF without a global color table")
    n_entries = 2 << (packed & 0x07)
    gct = np.frombuffer(data, np.uint8, n_entries * 3, pos).reshape(-1, 3)
    pos += n_entries * 3
    while True:
        if pos >= len(data):
            raise ValueError("truncated GIF (no image descriptor)")
        block = data[pos]
        pos += 1
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif block == 0x2C:
            break
        elif block == 0x3B:
            raise ValueError("GIF trailer before any image data")
        else:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
    left, top, iw, ih = struct.unpack_from("<HHHH", data, pos)
    flags = data[pos + 8]
    pos += 9
    if flags & 0x80:
        raise NotImplementedError("GIF local color tables unsupported")
    if flags & 0x40:
        raise NotImplementedError("interlaced GIF unsupported")
    if (left, top, iw, ih) != (0, 0, w, h):
        raise NotImplementedError("GIF sub-rectangle frames unsupported")
    mcs = data[pos]
    pos += 1
    payload = bytearray()
    while data[pos] != 0:
        n = data[pos]
        payload += data[pos + 1 : pos + 1 + n]
        pos += 1 + n
    indices = _lzw_decompress(bytes(payload), mcs, max_out=w * h)
    if len(indices) != w * h:
        raise ValueError(f"GIF pixel count {len(indices)} != {w}x{h}")
    idx = np.asarray(indices, dtype=np.int64)
    if idx.max(initial=0) >= len(gct):
        raise ValueError("GIF index outside the color table")
    return gct[idx].reshape(h, w, 3)


# ---------------------------------------------------------------------------
# Dispatch + features
# ---------------------------------------------------------------------------

_COMPRESSED_MAGIC = {
    b"ID3": "MP3",
    b"OggS": "OGG",
}


def _check_compressed(data: bytes) -> None:
    for magic, name in _COMPRESSED_MAGIC.items():
        if data[: len(magic)] == magic:
            raise NotImplementedError(
                f"{name} DSP decode needs a codec library unavailable in "
                "this environment; transcode to PNG/BMP/PPM/WAV upstream "
                "(container metadata IS available — operators/media_meta.py)"
            )


# Corrupt headers can DECLARE absurd sizes (a JPEG SOF0 carries u16
# dims up to 65535^2 = 12 GB RGB; BMP/PNG carry u32) and the decoders
# allocate eagerly — one malicious payload would OOM an executor long
# before any parse error fires. Caps found by fuzzing; generous for
# real fixtures, fatal for header bombs.
MAX_DECODE_PIXELS = 1 << 26  # ~67M px = 192 MB RGB
MAX_DECODE_SAMPLES = 1 << 28  # ~268M samples = 512 MB PCM16


def check_decode_dims(width: int, height: int = 1) -> None:
    """Raise ValueError before any allocation sized by a corrupt header."""
    if width <= 0 or height <= 0 or width * height > MAX_DECODE_PIXELS:
        raise ValueError(
            f"declared image dimensions {width}x{height} outside safety cap"
        )


def check_decode_samples(n: int) -> None:
    if n < 0 or n > MAX_DECODE_SAMPLES:
        raise ValueError(f"declared sample count {n} outside safety cap")


def _decode_errors_as_value_error(fn):
    """Same quarantine contract as operators/media_meta.py: adversarial
    bytes must surface as ValueError (NotImplementedError passes
    through for the declared codec gates), never as struct.error /
    IndexError / KeyError / zlib.error escaping a decoder mid-parse —
    found by fuzzing bit flips + truncations over every format."""
    import functools
    import zlib

    @functools.wraps(fn)
    def wrapped(data: bytes):
        try:
            return fn(data)
        except (
            struct.error,
            IndexError,
            KeyError,
            zlib.error,
            UnicodeDecodeError,
            OverflowError,
            ZeroDivisionError,
        ) as e:
            raise ValueError(f"{fn.__name__}: malformed stream ({e})") from e

    return wrapped


@_decode_errors_as_value_error
def decode_image(data: bytes) -> np.ndarray:
    """Decode BMP, PPM, PNG, or GIF bytes to an (h, w, 3) uint8 RGB array."""
    _check_compressed(data)
    if data[:8] == _PNG_SIG:
        return decode_png(data)
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif(data)
    if data[:3] == b"\xff\xd8\xff":
        from ag_data_ingestion_github_to_snowflake_spark.operators.jpeg import decode_jpeg

        return decode_jpeg(data)
    if data[:2] == b"BM":
        return decode_bmp(data)
    if data[:2] == b"P6":
        return decode_ppm(data)
    raise ValueError(f"unrecognised image magic {data[:4]!r}")


@_decode_errors_as_value_error
def image_features(data: bytes) -> tuple[int, int, float]:
    """(width, height, mean_luma) from BMP/PPM/PNG bytes.

    mean_luma = sum(299R + 587G + 114B) / (n_pixels * 255000), the
    integer-Rec.601 convention documented in the module docstring.
    """
    img = decode_image(data)
    h, w, _ = img.shape
    px = img.astype(np.int64)
    luma_sum = int(px[:, :, 0].sum() * 299 + px[:, :, 1].sum() * 587 + px[:, :, 2].sum() * 114)
    return w, h, round(luma_sum / (h * w * 255000.0), 6)


@_decode_errors_as_value_error
def decode_audio(data: bytes) -> tuple[np.ndarray, int, int]:
    """Decode WAV or FLAC bytes to (interleaved int16 PCM, rate, channels)."""
    _check_compressed(data)
    if data[:4] == b"fLaC":
        from ag_data_ingestion_github_to_snowflake_spark.operators.flac import decode_flac

        return decode_flac(data)
    if data[:4] == b"RIFF":
        return decode_wav(data)
    raise ValueError(f"unrecognised audio magic {data[:4]!r}")


@_decode_errors_as_value_error
def audio_features(data: bytes) -> tuple[float, int, float]:
    """(duration_s, sample_rate, rms_energy) from PCM16 WAV or FLAC bytes."""
    pcm, sample_rate, channels = decode_audio(data)
    n_frames = len(pcm) // channels
    duration = round(n_frames / float(sample_rate), 6)
    sq_sum = int((pcm.astype(np.int64) ** 2).sum())
    rms = round(float(np.sqrt(sq_sum / len(pcm))) / 32768.0, 6) if len(pcm) else 0.0
    return duration, sample_rate, rms


@_decode_errors_as_value_error
def ahash64(data: bytes) -> int:
    """64-bit average hash (aHash) of an image payload: decode, crop to
    a multiple of 8, 8x8 block-mean downsample on integer Rec.601 luma,
    threshold each block against the global mean.

    Exact integer arithmetic throughout: bit(i) = block_sum(i) * 64 >
    total_sum, which equals "block mean > global mean" when all 64
    blocks have identical pixel counts (guaranteed by the crop). The
    result is converted to a SIGNED 64-bit value so it rides in a Spark
    LongType column; Hamming distance is invariant under that cast.
    """
    img = decode_image(data).astype(np.int64)
    h, w, _ = img.shape
    bh, bw = h // 8, w // 8
    if bh == 0 or bw == 0:
        raise ValueError(f"aHash needs an image of at least 8x8, got {w}x{h}")
    crop = img[: bh * 8, : bw * 8]
    luma = crop[:, :, 0] * 299 + crop[:, :, 1] * 587 + crop[:, :, 2] * 114
    blocks = luma.reshape(8, bh, 8, bw).sum(axis=(1, 3))
    total = int(blocks.sum())
    out = 0
    for i, s in enumerate(int(v) for v in blocks.flatten().tolist()):
        if s * 64 > total:
            out |= 1 << i
    return out - (1 << 64) if out >= (1 << 63) else out
