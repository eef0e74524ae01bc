"""From-scratch FLAC codec (public xiph.org spec / RFC 9639), numpy-only.

Decoder covers the format's core: STREAMINFO parse, metadata-block
walk, frame sync + header (UTF-8-coded frame numbers, all block-size /
sample-rate / sample-size codes), CONSTANT / VERBATIM / FIXED(0-4) /
LPC(1-32) subframes, both Rice residual methods (4- and 5-bit
parameters, escape-to-raw partitions), wasted-bits shifts, and all four
channel assignments (independent, left/side, right/side, mid/side).
Integrity is enforced end-to-end: CRC-8 over each frame header, CRC-16
over each frame, and the STREAMINFO MD5 over the decoded PCM (when the
encoder recorded one).

Encoder produces real compressed FLAC for fixtures/tests: per-subframe
choice of CONSTANT / FIXED(0-2)+Rice / VERBATIM by measured cost,
optional mid/side decorrelation for stereo, single-partition Rice with
a parameter sweep, and a correct STREAMINFO (including PCM MD5).

Reference parity: the reference repo has no media pipeline (it ships
JSON over HTTP — ``/root/reference/src/extract_github_data.py``); this
module serves the brief's multimodal-column requirement the same way
``operators/jpeg.py`` does for images: opaque binary columns decoded by
Arrow-batched kernels, with exotic variants raising explicitly.

Unsupported (explicit ``NotImplementedError``): bit depths other than
16, sample counts requiring >36-bit frame numbers. Everything decoded
is verified, never guessed.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

# ---------------------------------------------------------------------------
# CRCs (FLAC spec: CRC-8 poly 0x07 init 0; CRC-16 poly 0x8005 init 0)
# ---------------------------------------------------------------------------


def _make_crc_table(poly: int, width: int) -> list[int]:
    mask = (1 << width) - 1
    top = 1 << (width - 1)
    table = []
    for byte in range(256):
        crc = byte << (width - 8)
        for _ in range(8):
            crc = ((crc << 1) ^ poly) & mask if crc & top else (crc << 1) & mask
        table.append(crc)
    return table


_CRC8_TABLE = _make_crc_table(0x07, 8)
_CRC16_TABLE = _make_crc_table(0x8005, 16)


def crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = _CRC8_TABLE[crc ^ b]
    return crc


def crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = _CRC16_TABLE[((crc >> 8) ^ b) & 0xFF] ^ ((crc << 8) & 0xFFFF)
    return crc


# ---------------------------------------------------------------------------
# Bit-level I/O (FLAC is MSB-first)
# ---------------------------------------------------------------------------


class _BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, byte_pos: int = 0) -> None:
        self.data = data
        self.pos = byte_pos * 8  # absolute bit position

    def read(self, n: int) -> int:
        """Read n bits MSB-first as an unsigned int."""
        end = self.pos + n
        if end > len(self.data) * 8:
            raise ValueError("truncated FLAC bitstream")
        out = 0
        pos = self.pos
        while n:
            byte = self.data[pos >> 3]
            avail = 8 - (pos & 7)
            take = avail if avail < n else n
            shift = avail - take
            out = (out << take) | ((byte >> shift) & ((1 << take) - 1))
            pos += take
            n -= take
        self.pos = end
        return out

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def read_unary(self) -> int:
        """Count 0-bits until the terminating 1-bit (Rice quotient)."""
        count = 0
        data = self.data
        pos = self.pos
        nbits = len(data) * 8
        while True:
            if pos >= nbits:
                raise ValueError("truncated FLAC bitstream (unary)")
            byte = data[pos >> 3]
            rem = 8 - (pos & 7)
            window = byte & ((1 << rem) - 1)
            if window == 0:
                count += rem
                pos += rem
                continue
            lead = rem - window.bit_length()
            count += lead
            pos += lead + 1
            self.pos = pos
            return count

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def byte_pos(self) -> int:
        return self.pos >> 3

    def at_eof(self) -> bool:
        return self.pos >= len(self.data) * 8


class _BitWriter:
    __slots__ = ("buf", "acc", "nacc")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nacc += n
        while self.nacc >= 8:
            self.nacc -= 8
            self.buf.append((self.acc >> self.nacc) & 0xFF)
        self.acc &= (1 << self.nacc) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a one

    def align(self) -> None:
        if self.nacc:
            self.write(0, 8 - self.nacc)

    def getvalue(self) -> bytes:
        assert self.nacc == 0, "unaligned bit writer"
        return bytes(self.buf)


# ---------------------------------------------------------------------------
# UTF-8-style coded numbers (frame/sample index; up to 36 bits)
# ---------------------------------------------------------------------------


def _encode_utf8_number(value: int) -> bytes:
    if value < 0x80:
        return bytes([value])
    # thresholds per the spec table (UTF-8 scheme extended to 36 bits)
    bounds = [(0x800, 1, 0xC0), (0x10000, 2, 0xE0), (0x200000, 3, 0xF0),
              (0x4000000, 4, 0xF8), (0x80000000, 5, 0xFC), (0x1000000000, 6, 0xFE)]
    for bound, n_cont, prefix in bounds:
        if value < bound:
            out = [prefix | (value >> (6 * n_cont))]
            for s in range(6 * (n_cont - 1), -1, -6):
                out.append(0x80 | ((value >> s) & 0x3F))
            return bytes(out)
    raise NotImplementedError("FLAC frame numbers beyond 36 bits unsupported")


def _read_utf8_number(br: _BitReader) -> int:
    first = br.read(8)
    if first < 0x80:
        return first
    n_cont = 0
    mask = 0x40
    while first & mask:
        n_cont += 1
        mask >>= 1
    if n_cont < 1 or n_cont > 6:
        raise ValueError("invalid FLAC coded number")
    value = first & (mask - 1)
    for _ in range(n_cont):
        cont = br.read(8)
        if cont & 0xC0 != 0x80:
            raise ValueError("invalid FLAC coded-number continuation")
        value = (value << 6) | (cont & 0x3F)
    return value


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

_BLOCK_SIZE_CODES = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
    13: 8192, 14: 16384, 15: 32768,
}
_SAMPLE_RATE_CODES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_SAMPLE_SIZE_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _decode_residuals(br: _BitReader, block_size: int, order: int) -> list[int]:
    method = br.read(2)
    if method > 1:
        raise ValueError("reserved FLAC residual coding method")
    param_bits = 4 if method == 0 else 5
    escape = (1 << param_bits) - 1
    part_order = br.read(4)
    n_parts = 1 << part_order
    if block_size % n_parts:
        raise ValueError("FLAC partition order does not divide block size")
    residuals: list[int] = []
    for part in range(n_parts):
        n = (block_size >> part_order) - (order if part == 0 else 0)
        if n < 0:
            raise ValueError("FLAC predictor order exceeds first partition")
        param = br.read(param_bits)
        if param == escape:
            raw_bits = br.read(5)
            if raw_bits == 0:
                residuals.extend([0] * n)
            else:
                residuals.extend(br.read_signed(raw_bits) for _ in range(n))
        else:
            for _ in range(n):
                q = br.read_unary()
                v = (q << param) | br.read(param) if param else q
                residuals.append((v >> 1) ^ -(v & 1))  # unfold zigzag
    return residuals


def _decode_subframe(br: _BitReader, block_size: int, bps: int) -> list[int]:
    if br.read(1):
        raise ValueError("FLAC subframe padding bit set")
    sf_type = br.read(6)
    wasted = 0
    if br.read(1):  # wasted-bits flag: unary count-1 follows
        wasted = br.read_unary() + 1
    eff_bps = bps - wasted
    if sf_type == 0:  # CONSTANT
        samples = [br.read_signed(eff_bps)] * block_size
    elif sf_type == 1:  # VERBATIM
        samples = [br.read_signed(eff_bps) for _ in range(block_size)]
    elif 8 <= sf_type <= 12:  # FIXED, order 0-4
        order = sf_type & 7
        samples = [br.read_signed(eff_bps) for _ in range(order)]
        residuals = _decode_residuals(br, block_size, order)
        coefs = _FIXED_COEFS[order]
        for r in residuals:
            pred = sum(c * samples[-1 - j] for j, c in enumerate(coefs))
            samples.append(r + pred)
    elif sf_type >= 32:  # LPC, order 1-32
        order = (sf_type & 31) + 1
        samples = [br.read_signed(eff_bps) for _ in range(order)]
        precision = br.read(4) + 1
        if precision == 16:
            raise ValueError("invalid FLAC LPC precision code 0b1111")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        coefs = [br.read_signed(precision) for _ in range(order)]
        residuals = _decode_residuals(br, block_size, order)
        for r in residuals:
            acc = sum(c * samples[-1 - j] for j, c in enumerate(coefs))
            samples.append(r + (acc >> shift))
    else:
        raise ValueError(f"reserved FLAC subframe type {sf_type}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def _parse_streaminfo(block: bytes) -> tuple[int, int, int, int, bytes]:
    if len(block) != 34:
        raise ValueError("FLAC STREAMINFO must be 34 bytes")
    br = _BitReader(block)
    br.read(16)  # min block size
    br.read(16)  # max block size
    br.read(24)  # min frame size
    br.read(24)  # max frame size
    sample_rate = br.read(20)
    channels = br.read(3) + 1
    bps = br.read(5) + 1
    total_samples = br.read(36)
    md5 = block[18:34]
    if sample_rate == 0:
        raise ValueError("FLAC sample rate 0")
    return sample_rate, channels, bps, total_samples, md5


def decode_flac(data: bytes) -> tuple[np.ndarray, int, int]:
    """Decode FLAC bytes to (interleaved int16 PCM, sample_rate, channels).

    Verifies frame-header CRC-8, frame CRC-16, and (when present) the
    STREAMINFO MD5 of the decoded stream. Only 16-bit streams are
    supported — others raise ``NotImplementedError`` explicitly.
    """
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(data):
            raise ValueError("truncated FLAC metadata")
        header = data[pos]
        last = bool(header & 0x80)
        btype = header & 0x7F
        length = int.from_bytes(data[pos + 1 : pos + 4], "big")
        pos += 4
        if btype == 0:
            streaminfo = _parse_streaminfo(data[pos : pos + length])
        elif btype == 127:
            raise ValueError("invalid FLAC metadata block type 127")
        pos += length
        if last:
            break
    if streaminfo is None:
        raise ValueError("FLAC stream missing STREAMINFO")
    sample_rate, channels, bps, total_samples, md5 = streaminfo
    from ag_data_ingestion_github_to_snowflake_spark.operators.codecs import (
        check_decode_samples,
    )

    check_decode_samples(total_samples * max(channels, 1))
    if bps != 16:
        raise NotImplementedError(f"only 16-bit FLAC supported, got {bps}")

    br = _BitReader(data, pos)
    chans: list[list[int]] = [[] for _ in range(channels)]
    while not br.at_eof():
        # tolerate trailing byte padding after the last frame
        if (len(data) * 8 - br.pos) < 32:
            break
        frame_start = br.byte_pos()
        sync = br.read(14)
        if sync != 0x3FFE:
            raise ValueError(f"bad FLAC frame sync 0x{sync:04x}")
        if br.read(1):
            raise ValueError("FLAC frame reserved bit set")
        br.read(1)  # blocking strategy (fixed/variable)
        bs_code = br.read(4)
        sr_code = br.read(4)
        chan_assign = br.read(4)
        ss_code = br.read(3)
        if br.read(1):
            raise ValueError("FLAC frame header reserved bit set")
        _read_utf8_number(br)  # frame/sample number
        if bs_code == 0:
            raise ValueError("reserved FLAC block size code 0")
        elif bs_code == 6:
            block_size = br.read(8) + 1
        elif bs_code == 7:
            block_size = br.read(16) + 1
        else:
            block_size = _BLOCK_SIZE_CODES[bs_code]
        if sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        elif sr_code == 15:
            raise ValueError("invalid FLAC sample rate code 15")
        if ss_code == 0:
            frame_bps = bps
        elif ss_code in _SAMPLE_SIZE_CODES:
            frame_bps = _SAMPLE_SIZE_CODES[ss_code]
        else:
            raise ValueError(f"reserved FLAC sample size code {ss_code}")
        if frame_bps != bps:
            raise ValueError("frame/STREAMINFO sample size mismatch")
        header_bytes = data[frame_start : br.byte_pos()]
        if crc8(header_bytes) != br.read(8):
            raise ValueError("FLAC frame header CRC-8 mismatch")

        if chan_assign <= 7:
            n_sub = chan_assign + 1
            if n_sub != channels:
                raise ValueError("frame/STREAMINFO channel count mismatch")
            subs = [_decode_subframe(br, block_size, bps) for _ in range(n_sub)]
        elif chan_assign in (8, 9, 10):
            if channels != 2:
                raise ValueError("stereo decorrelation in non-stereo stream")
            # the difference (side) channel carries one extra bit
            if chan_assign == 8:  # left/side
                left = _decode_subframe(br, block_size, bps)
                side = _decode_subframe(br, block_size, bps + 1)
                subs = [left, [l - s for l, s in zip(left, side)]]
            elif chan_assign == 9:  # right/side
                side = _decode_subframe(br, block_size, bps + 1)
                right = _decode_subframe(br, block_size, bps)
                subs = [[s + r for s, r in zip(side, right)], right]
            else:  # mid/side
                mid = _decode_subframe(br, block_size, bps)
                side = _decode_subframe(br, block_size, bps + 1)
                left, right = [], []
                for m, s in zip(mid, side):
                    m2 = (m << 1) | (s & 1)
                    left.append((m2 + s) >> 1)
                    right.append((m2 - s) >> 1)
                subs = [left, right]
        else:
            raise ValueError(f"reserved FLAC channel assignment {chan_assign}")

        br.align()
        frame_bytes = data[frame_start : br.byte_pos()]
        if crc16(frame_bytes) != br.read(16):
            raise ValueError("FLAC frame CRC-16 mismatch")
        for c in range(channels):
            chans[c].extend(subs[c])
        # A CONSTANT subframe encodes 65535 samples in ~20 bytes, so a
        # small crafted stream (with total_samples=0, "unknown") could
        # otherwise expand to gigabytes — cap the ACCUMULATED output,
        # not just the declared header total.
        check_decode_samples(len(chans[0]) * channels)

    n_frames_total = len(chans[0])
    if total_samples and n_frames_total != total_samples:
        raise ValueError(
            f"decoded {n_frames_total} samples, STREAMINFO says {total_samples}"
        )
    pcm = np.empty(n_frames_total * channels, dtype=np.int64)
    for c in range(channels):
        pcm[c::channels] = chans[c]
    if pcm.size and (pcm.max() > 32767 or pcm.min() < -32768):
        raise ValueError("FLAC sample outside int16 range")
    pcm16 = pcm.astype("<i2")
    if md5 != b"\x00" * 16 and hashlib.md5(pcm16.tobytes()).digest() != md5:
        raise ValueError("FLAC STREAMINFO MD5 mismatch on decoded PCM")
    return pcm16.astype(np.int16), sample_rate, channels


# ---------------------------------------------------------------------------
# Encoder (CONSTANT / FIXED+Rice / VERBATIM, optional mid/side)
# ---------------------------------------------------------------------------


def _rice_cost(residuals: list[int], param: int) -> int:
    cost = 0
    for r in residuals:
        v = (r << 1) ^ (r >> 63) if r < 0 else r << 1
        cost += (v >> param) + 1 + param
    return cost


def _best_rice_param(residuals: list[int], param_bits: int = 4) -> int:
    best, best_cost = 0, None
    for p in range((1 << param_bits) - 1):
        c = _rice_cost(residuals, p)
        if best_cost is None or c < best_cost:
            best, best_cost = p, c
        elif c > best_cost * 2:
            break  # cost is convex in p; stop once clearly past the minimum
    return best


def _write_residuals(bw: _BitWriter, residuals: list[int]) -> None:
    param = _best_rice_param(residuals)
    bw.write(0, 2)  # method 0: 4-bit Rice parameters
    bw.write(0, 4)  # partition order 0 (single partition)
    bw.write(param, 4)
    for r in residuals:
        v = (r << 1) ^ (r >> 63) if r < 0 else r << 1  # zigzag fold
        bw.write_unary(v >> param)
        if param:
            bw.write(v, param)


def _encode_subframe(bw: _BitWriter, samples: list[int], bps: int) -> None:
    n = len(samples)
    if all(s == samples[0] for s in samples):
        bw.write(0, 1)
        bw.write(0, 6)  # CONSTANT
        bw.write(0, 1)
        bw.write(samples[0], bps)
        return
    # try fixed predictors 0-2, pick the cheapest vs verbatim
    best_order, best_res, best_cost = None, None, n * bps
    for order in (0, 1, 2):
        if n <= order:
            continue
        res = []
        coefs = _FIXED_COEFS[order]
        for i in range(order, n):
            pred = sum(c * samples[i - 1 - j] for j, c in enumerate(coefs))
            res.append(samples[i] - pred)
        cost = order * bps + 6 + _rice_cost(res, _best_rice_param(res))
        if cost < best_cost:
            best_order, best_res, best_cost = order, res, cost
    if best_order is None:
        bw.write(0, 1)
        bw.write(1, 6)  # VERBATIM
        bw.write(0, 1)
        for s in samples:
            bw.write(s, bps)
        return
    bw.write(0, 1)
    bw.write(8 | best_order, 6)  # FIXED
    bw.write(0, 1)
    for s in samples[:best_order]:
        bw.write(s, bps)
    _write_residuals(bw, best_res)


def encode_flac(
    samples: np.ndarray,
    sample_rate: int,
    block_size: int = 4096,
    mid_side: bool = False,
) -> bytes:
    """Encode int16 PCM — shape (n,) mono or (n, channels) — as FLAC.

    Real compression: CONSTANT for flat blocks, fixed-predictor
    residuals Rice-coded otherwise, VERBATIM as the incompressible
    fallback; ``mid_side=True`` (stereo only) writes mid/side frames.
    STREAMINFO carries the true PCM MD5 so decode is self-verifying.
    """
    arr = np.asarray(samples, dtype=np.int16)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, channels = arr.shape
    if channels > 8:
        raise ValueError("FLAC supports at most 8 channels")
    if mid_side and channels != 2:
        raise ValueError("mid_side requires exactly 2 channels")
    bps = 16
    md5 = hashlib.md5(arr.astype("<i2").tobytes()).digest()

    body = bytearray()
    frame_no = 0
    for start in range(0, n, block_size):
        block = arr[start : start + block_size]
        bs = len(block)
        bw = _BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)  # reserved
        bw.write(0, 1)  # fixed blocking strategy
        bw.write(7, 4)  # block size: 16-bit value-1 follows
        sr_code = {88200: 1, 176400: 2, 192000: 3, 8000: 4, 16000: 5,
                   22050: 6, 24000: 7, 32000: 8, 44100: 9, 48000: 10,
                   96000: 11}.get(sample_rate)
        if sr_code is None:
            if sample_rate > 0xFFFF:
                raise NotImplementedError("sample rate too large for code 13")
            sr_code = 13  # 16-bit Hz follows
        bw.write(sr_code, 4)
        chan_assign = 10 if mid_side else channels - 1
        bw.write(chan_assign, 4)
        bw.write(4, 3)  # sample size: 16-bit
        bw.write(0, 1)  # reserved
        for b in _encode_utf8_number(frame_no):
            bw.write(b, 8)
        bw.write(bs - 1, 16)
        if sr_code == 13:
            bw.write(sample_rate, 16)
        bw.align()
        header = bw.getvalue()
        bw2 = _BitWriter()
        for b in header:
            bw2.write(b, 8)
        bw2.write(crc8(header), 8)
        if mid_side:
            left = block[:, 0].astype(np.int64)
            right = block[:, 1].astype(np.int64)
            mid = ((left + right) >> 1).tolist()
            side = (left - right).tolist()
            _encode_subframe(bw2, mid, bps)
            _encode_subframe(bw2, side, bps + 1)
        else:
            for c in range(channels):
                _encode_subframe(bw2, block[:, c].astype(int).tolist(), bps)
        bw2.align()
        frame = bw2.getvalue()
        body += frame + struct.pack(">H", crc16(frame))
        frame_no += 1

    si = _BitWriter()
    # RFC 9639: min == max marks a fixed-blocksize stream; a shorter
    # last frame is expected and excluded from these fields, so both
    # carry block_size (min(block_size, n) would mark variable blocking
    # and could fall below the 16-sample legal minimum)
    si.write(block_size, 16)  # min block size
    si.write(block_size, 16)  # max block size
    si.write(0, 24)  # min frame size unknown
    si.write(0, 24)  # max frame size unknown
    si.write(sample_rate, 20)
    si.write(channels - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    streaminfo = si.getvalue() + md5
    assert len(streaminfo) == 34
    header_block = bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo
    return b"fLaC" + header_block + bytes(body)
