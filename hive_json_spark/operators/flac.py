"""FLAC-subset codec, dependency-free — the COMPRESSED-audio family of
the baseline codec suite (multimodal.py: BMP/WAV uncompressed, PNG=zlib,
GIF=LZW, JPEG=DCT+Huffman; FLAC adds linear prediction + Rice coding,
the lossless-audio compression family none of the others cover).

Subset implemented (a strict subset of the real format — files decode
with any conforming FLAC decoder):

- mono, 16 bits/sample, fixed 4096-sample blocks (last block partial);
- FIXED predictors, orders 0-2, chosen per block by minimum residual
  magnitude (the standard encoder heuristic);
- partitioned-Rice residual coding, partition order 0, per-block Rice
  parameter chosen by exact cost search (escape code for k=15 raw);
- CONSTANT and VERBATIM subframes where they win (silence / noise);
- real frame headers: 14-bit sync, UTF-8 frame numbers, CRC-8 header /
  CRC-16 frame trailers (verified on decode), STREAMINFO with MD5 of
  the raw samples (verified on decode).

Not implemented (raise ``NotImplementedError`` loudly): stereo/other
bit depths, LPC subframes, partition order > 0, wasted bits — the
boundary is in ``decode_flac``; everything this encoder emits decodes.

Reference semantics: the format layout follows the public FLAC format
specification (RFC 9639); the code is original.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

BLOCK = 4096


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int) -> None:
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        # FLAC unary: q zero bits then a one bit
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, bits: int) -> int:
        out = 0
        while bits:
            if self.byte >= len(self.data):
                raise ValueError("flac: truncated bitstream")
            avail = 8 - self.bit
            take = min(bits, avail)
            cur = self.data[self.byte]
            out = (out << take) | ((cur >> (avail - take)) & ((1 << take) - 1))
            self.bit += take
            bits -= take
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return out

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


def _utf8_frame_number(n: int) -> bytes:
    # frame numbers use UTF-8-style coding (the real format's scheme)
    if n < 0x80:
        return bytes([n])
    if n < 0x800:
        return bytes([0xC0 | (n >> 6), 0x80 | (n & 0x3F)])
    if n < 0x10000:
        return bytes([0xE0 | (n >> 12), 0x80 | ((n >> 6) & 0x3F), 0x80 | (n & 0x3F)])
    raise NotImplementedError("flac subset: > 65535 frames")


def _read_utf8_number(br: _BitReader) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n_more = 0
    mask = 0x40
    while b0 & mask:
        n_more += 1
        mask >>= 1
    val = b0 & (mask - 1)
    for _ in range(n_more):
        val = (val << 6) | (br.read(8) & 0x3F)
    return val


_FIXED_COEFFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _residual(x: np.ndarray, order: int) -> np.ndarray:
    r = x.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def _rice_cost(u: np.ndarray, k: int) -> int:
    return int((u >> k).sum()) + len(u) * (k + 1)


def _best_rice_k(u: np.ndarray) -> int:
    if not len(u):
        return 0
    best_k, best_c = 0, _rice_cost(u, 0)
    for k in range(1, 15):
        c = _rice_cost(u, k)
        if c < best_c:
            best_k, best_c = k, c
    return best_k


def encode_flac(samples: np.ndarray, sample_rate: int = 1000) -> bytes:
    """Encode int16 mono samples into a real FLAC stream (subset above)."""
    x = np.asarray(samples, dtype=np.int16).astype(np.int64)
    n_total = len(x)
    md5 = hashlib.md5(np.asarray(samples, dtype="<i2").tobytes()).digest()
    # STREAMINFO: min/max blocksize, min/max framesize (0 = unknown),
    # 20-bit sample rate, 3-bit channels-1, 5-bit bps-1, 36-bit total
    info = _BitWriter()
    info.write(BLOCK, 16)
    info.write(BLOCK, 16)
    info.write(0, 24)
    info.write(0, 24)
    info.write(sample_rate, 20)
    info.write(0, 3)          # mono
    info.write(15, 5)         # 16 bps
    info.write(n_total, 36)
    stream = bytearray(b"fLaC")
    stream += struct.pack(">BBH", 0x80, 0, 34)  # last-block | STREAMINFO | len
    stream += info.bytes() + md5

    # n_total == 0 → zero frames: STREAMINFO total=0 with no frames is
    # valid FLAC, while a zero-sample frame would be malformed (its 16-bit
    # end blocksize field can't encode 0 samples).
    for f_ix in range((n_total + BLOCK - 1) // BLOCK):
        blk = x[f_ix * BLOCK:(f_ix + 1) * BLOCK]
        if not len(blk):
            break
        bs = len(blk)
        # --- frame header (byte-aligned) ---
        hdr = _BitWriter()
        hdr.write(0b11111111111110, 14)
        hdr.write(0, 1)           # reserved
        hdr.write(0, 1)           # fixed blocksize strategy
        partial = bs != BLOCK
        hdr.write(0b0111 if partial else 0b1100, 4)  # 16-bit-at-end | 4096
        hdr.write(0, 4)           # sample rate: from STREAMINFO
        hdr.write(0, 4)           # mono
        hdr.write(0b100, 3)       # 16 bps
        hdr.write(0, 1)           # reserved
        hdr.align()
        hdr_bytes = bytearray(hdr.bytes())
        hdr_bytes += _utf8_frame_number(f_ix)
        if partial:
            hdr_bytes += struct.pack(">H", max(bs - 1, 0))
        hdr_bytes.append(_crc8(bytes(hdr_bytes)))

        body = _BitWriter()
        # --- subframe ---
        if bs and np.all(blk == blk[0]):
            body.write(0, 1)
            body.write(0b000000, 6)   # CONSTANT
            body.write(0, 1)
            body.write(int(blk[0]), 16)
        else:
            order = min(2, bs - 1) if bs else 0
            cands = []
            for o in range(order + 1):
                r = _residual(blk, o)
                u = (np.abs(r) * 2 - (r < 0)).astype(np.int64)
                k = _best_rice_k(u)
                cands.append((o * 16 + 6 + _rice_cost(u, k), o, r, u, k))
            cost, o, r, u, k = min(cands, key=lambda c: c[0])
            if cost >= bs * 16:
                body.write(0, 1)
                body.write(0b000001, 6)  # VERBATIM
                body.write(0, 1)
                for v in blk:
                    body.write(int(v), 16)
            else:
                body.write(0, 1)
                body.write(0b001000 | o, 6)  # FIXED, order o
                body.write(0, 1)
                for v in blk[:o]:
                    body.write(int(v), 16)   # warmup
                body.write(0b00, 2)          # rice method (4-bit params)
                body.write(0, 4)             # partition order 0
                body.write(k, 4)
                for uu in u:
                    body.write_unary(int(uu) >> k)
                    if k:
                        body.write(int(uu), k)
        body.align()
        frame = bytes(hdr_bytes) + body.bytes()
        stream += frame + struct.pack(">H", _crc16(frame))
    return bytes(stream)


def decode_flac(data: bytes) -> tuple[int, np.ndarray]:
    """Decode a subset FLAC stream → (sample_rate, int16 samples).

    Verifies frame CRC-16s and the STREAMINFO MD5 — a corrupt stream or
    codec bug raises instead of returning wrong samples."""
    if data[:4] != b"fLaC":
        raise ValueError("flac: bad stream marker")
    pos = 4
    sample_rate, n_total, md5 = None, None, None
    while True:
        hdr, btype, length = data[pos] & 0x80, data[pos] & 0x7F, struct.unpack(
            ">I", b"\x00" + data[pos + 1:pos + 4]
        )[0]
        block = data[pos + 4:pos + 4 + length]
        if btype == 0:
            br = _BitReader(block)
            br.read(16); br.read(16); br.read(24); br.read(24)
            sample_rate = br.read(20)
            if br.read(3) != 0:
                raise NotImplementedError("flac subset: mono only")
            if br.read(5) != 15:
                raise NotImplementedError("flac subset: 16-bit only")
            n_total = br.read(36)
            md5 = block[18:34]
        pos += 4 + length
        if hdr:
            break
    if sample_rate is None:
        raise ValueError("flac: missing STREAMINFO")

    out: list[np.ndarray] = []
    got = 0
    while got < (n_total or 0) and pos < len(data):
        frame_start = pos
        br = _BitReader(data, pos)
        if br.read(14) != 0b11111111111110:
            raise ValueError("flac: lost frame sync")
        br.read(1)
        br.read(1)
        bs_code = br.read(4)
        sr_code = br.read(4)
        if br.read(4) != 0:
            raise NotImplementedError("flac subset: mono only")
        if br.read(3) != 0b100:
            raise NotImplementedError("flac subset: 16-bit only")
        br.read(1)
        _read_utf8_number(br)
        if bs_code == 0b1100:
            bs = 4096
        elif bs_code == 0b0111:
            bs = br.read(16) + 1
        elif bs_code == 0b0110:
            bs = br.read(8) + 1
        elif 0b1000 <= bs_code <= 0b1111:
            bs = 256 << (bs_code - 8)
        else:
            raise NotImplementedError(f"flac subset: blocksize code {bs_code}")
        if sr_code != 0:
            raise NotImplementedError("flac subset: rate from STREAMINFO only")
        hdr_len = br.byte - frame_start
        if _crc8(data[frame_start:frame_start + hdr_len]) != br.read(8):
            raise ValueError("flac: frame header CRC-8 mismatch")
        # --- subframe ---
        if br.read(1) != 0:
            raise ValueError("flac: bad subframe padding bit")
        stype = br.read(6)
        if br.read(1) != 0:
            raise NotImplementedError("flac subset: wasted bits")
        if stype == 0:            # CONSTANT
            v = br.read(16)
            v -= 1 << 16 if v & 0x8000 else 0
            blk = np.full(bs, v, dtype=np.int64)
        elif stype == 1:          # VERBATIM
            blk = np.empty(bs, dtype=np.int64)
            for i in range(bs):
                v = br.read(16)
                blk[i] = v - (1 << 16) if v & 0x8000 else v
        elif 0b001000 <= stype <= 0b001100:   # FIXED
            order = stype & 0x07
            warm = []
            for _ in range(order):
                v = br.read(16)
                warm.append(v - (1 << 16) if v & 0x8000 else v)
            if br.read(2) != 0:
                raise NotImplementedError("flac subset: 4-bit rice params only")
            if br.read(4) != 0:
                raise NotImplementedError("flac subset: partition order 0 only")
            k = br.read(4)
            if k == 15:
                raise NotImplementedError("flac subset: escape codes")
            res = np.empty(bs - order, dtype=np.int64)
            for i in range(bs - order):
                u = (br.read_unary() << k) | (br.read(k) if k else 0)
                res[i] = (u >> 1) ^ -(u & 1)   # unfold zigzag
            blk = np.empty(bs, dtype=np.int64)
            blk[:order] = warm
            coef = _FIXED_COEFFS[order]
            for i in range(order, bs):
                blk[i] = res[i - order] + sum(
                    c * blk[i - 1 - j] for j, c in enumerate(coef)
                )
        else:
            raise NotImplementedError(f"flac subset: subframe type {stype:06b}")
        br.align()
        if _crc16(data[frame_start:br.byte]) != br.read(16):
            raise ValueError("flac: frame CRC-16 mismatch")
        pos = br.byte
        out.append(blk)
        got += bs
    samples = (
        np.concatenate(out)[: n_total or None].astype(np.int16)
        if out
        else np.zeros(0, dtype=np.int16)
    )
    if md5 is not None and n_total:
        if hashlib.md5(samples.astype("<i2").tobytes()).digest() != md5:
            raise ValueError("flac: STREAMINFO MD5 mismatch (decode bug?)")
    return sample_rate, samples
