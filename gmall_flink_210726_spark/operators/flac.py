"""FLAC decode from scratch (RFC 9639 / xiph.org FLAC format) — the
remaining common audio-corpus format after WAV / µ-law / ADPCM / MP3
(operators/audio.py, operators/mp3.py): STREAMINFO, frame headers
with CRC-8, subframes (CONSTANT / VERBATIM / FIXED orders 0-4 / LPC),
Rice-coded residuals with partitioned parameters and the raw-bits
escape, left/side stereo decorrelation, per-frame CRC-16, and the
STREAMINFO MD5 of the decoded PCM as the end-to-end proof.

No FLAC encoder ships in the container, so fixtures are written by a
deliberately separate minimal encoder in this module and the decoder
is validated the L115 way (synthesize-then-verify): the CRC-8
(poly 0x07) and CRC-16 (poly 0x8005, init 0) implementations are
pinned on the published '123456789' check values (0xF4 /
CRC-16-BUYPASS 0xFEE8), bit-exact sample recovery is proven against
the generating formula, and the MD5 rung uses stdlib hashlib over
the interleaved little-endian PCM exactly as the spec defines.

Trust chain: a frame-header CRC-8 or frame CRC-16 that disagrees
refuses; decoded totals must equal STREAMINFO's total-samples books;
the MD5 of the actually-decoded PCM must equal STREAMINFO's claim.
Arrow-batched ``mapInPandas``, zero shuffle.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StringType, StructField, StructType

# CRC-8, polynomial 0x07, init 0 (FLAC frame-header checksum)
_CRC8_TABLE = []
for _n in range(256):
    _c = _n
    for _ in range(8):
        _c = ((_c << 1) ^ 0x07 if _c & 0x80 else _c << 1) & 0xFF
    _CRC8_TABLE.append(_c)

# CRC-16, polynomial 0x8005, init 0, not reflected (FLAC frame crc)
_CRC16_TABLE = []
for _n in range(256):
    _c = _n << 8
    for _ in range(8):
        _c = ((_c << 1) ^ 0x8005 if _c & 0x8000 else _c << 1) & 0xFFFF
    _CRC16_TABLE.append(_c)


def crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC8_TABLE[c ^ b]
    return c


def crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = ((c << 8) & 0xFFFF) ^ _CRC16_TABLE[((c >> 8) ^ b) & 0xFF]
    return c


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int):
        if n == 0:
            return
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, value: int, n: int):
        self.write(value & ((1 << n) - 1), n)

    def write_unary(self, q: int):
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a one

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos  # byte position
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        while n:
            if self.pos >= len(self.data):
                raise ValueError("flac: bitstream truncated")
            avail = 8 - self.bit
            take = min(n, avail)
            byte = self.data[self.pos]
            v = (v << take) | (
                (byte >> (avail - take)) & ((1 << take) - 1)
            )
            self.bit += take
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
            n -= take
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        if v & (1 << (n - 1)):
            v -= 1 << n
        return v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
            if q > 1 << 20:
                raise ValueError("flac: runaway unary")
        return q

    def align(self):
        if self.bit:
            if self.read(8 - self.bit):
                raise ValueError("flac: nonzero padding")


def _zigzag(e: int) -> int:
    return (e << 1) ^ (e >> 63) if e >= 0 else ((-e) << 1) - 1


def _unzigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


_FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _utf8_number_enc(v: int) -> bytes:
    if v < 0x80:
        return bytes([v])
    out = []
    nbytes = 2
    # an n-byte coded number carries (7 - n) lead bits + 6*(n - 1)
    # continuation bits = 5n + 1 value bits
    while v >= (1 << (5 * nbytes + 1)):
        nbytes += 1
    # lead byte: nbytes ones, a zero, then the high value bits
    lead_bits = 7 - nbytes
    shift = 6 * (nbytes - 1)
    lead = ((0xFF << (lead_bits + 1)) & 0xFF) | (v >> shift)
    out.append(lead)
    for k in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((v >> shift) & 0x3F))
    return bytes(out)


def _utf8_number_dec(r: _BitReader) -> int:
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    m = b0
    while m & 0x80:
        n += 1
        m = (m << 1) & 0xFF
    if n < 2 or n > 7:
        raise ValueError("flac: bad coded number")
    v = b0 & (0x7F >> n)
    for _ in range(n - 1):
        b = r.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("flac: bad coded-number continuation")
        v = (v << 6) | (b & 0x3F)
    return v


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------

_SAMPLE_SIZE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24}
_SAMPLE_SIZE_CODE = {v: k for k, v in _SAMPLE_SIZE.items()}


def _pcm_md5(channels_pcm: list[list[int]], bps: int) -> bytes:
    """MD5 of the interleaved little-endian PCM exactly as STREAMINFO
    defines it — shared by decoder verification and the encoder."""
    md5 = hashlib.md5()
    step = (bps + 7) // 8
    mask = (1 << (8 * step)) - 1
    total = len(channels_pcm[0]) if channels_pcm else 0
    for k in range(total):
        for c in range(len(channels_pcm)):
            md5.update((channels_pcm[c][k] & mask).to_bytes(step, "little"))
    return md5.digest()


def _residual_dec(r: _BitReader, blocksize: int, order: int) -> list[int]:
    method = r.read(2)
    if method > 1:
        raise ValueError("flac: reserved residual method")
    pbits = 4 if method == 0 else 5
    esc = (1 << pbits) - 1
    po = r.read(4)
    parts = 1 << po
    if blocksize % parts or blocksize // parts <= order and po:
        raise ValueError("flac: bad partition order")
    out: list[int] = []
    for p in range(parts):
        cnt = blocksize // parts - (order if p == 0 else 0)
        if cnt < 0:
            raise ValueError("flac: partition smaller than order")
        param = r.read(pbits)
        if param == esc:
            nraw = r.read(5)
            for _ in range(cnt):
                out.append(r.read_signed(nraw) if nraw else 0)
        else:
            for _ in range(cnt):
                q = r.read_unary()
                u = (q << param) | r.read(param)
                out.append(_unzigzag(u))
    return out


def _predict_apply(
    warm: list[int], resid: list[int], coeffs: list[int], shift: int
) -> list[int]:
    x = list(warm)
    o = len(coeffs)
    for e in resid:
        pred = sum(c * x[-1 - j] for j, c in enumerate(coeffs))
        x.append(e + (pred >> shift))
    return x


def _subframe_dec(r: _BitReader, n: int, bits: int) -> list[int]:
    if r.read(1):
        raise ValueError("flac: subframe padding bit set")
    t = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.read_unary() + 1
    eff = bits - wasted
    if eff <= 0:
        raise ValueError("flac: wasted bits exhaust the sample")
    if t == 0:  # CONSTANT
        v = r.read_signed(eff)
        x = [v] * n
    elif t == 1:  # VERBATIM
        x = [r.read_signed(eff) for _ in range(n)]
    elif 8 <= t <= 12:  # FIXED
        order = t - 8
        if order > n:
            raise ValueError("flac: order exceeds blocksize")
        warm = [r.read_signed(eff) for _ in range(order)]
        resid = _residual_dec(r, n, order)
        x = _predict_apply(warm, resid, _FIXED_COEFFS[order], 0)
    elif t & 0x20:  # LPC
        order = (t & 0x1F) + 1
        if order > n:
            raise ValueError("flac: order exceeds blocksize")
        warm = [r.read_signed(eff) for _ in range(order)]
        prec = r.read(4)
        if prec == 0xF:
            raise ValueError("flac: invalid qlp precision")
        prec += 1
        shift = r.read_signed(5)
        if shift < 0:
            raise ValueError("flac: negative qlp shift")
        coeffs = [r.read_signed(prec) for _ in range(order)]
        resid = _residual_dec(r, n, order)
        x = _predict_apply(warm, resid, coeffs, shift)
    else:
        raise ValueError("flac: reserved subframe type")
    if wasted:
        x = [v << wasted for v in x]
    return x


def read_flac(data: bytes) -> dict | None:
    """FLAC stream -> decoded-stream stats with the full trust chain
    (module doc); None on any violation."""
    if len(data) < 42 or data[:4] != b"fLaC":
        return None
    pos = 4
    info = None
    try:
        while True:
            if pos + 4 > len(data):
                return None
            h = data[pos]
            (length,) = struct.unpack(
                ">I", b"\x00" + data[pos + 1 : pos + 4]
            )
            body = pos + 4
            if body + length > len(data):
                return None
            if h & 0x7F == 0:  # STREAMINFO
                if length != 34 or info is not None:
                    return None
                b = data[body : body + 34]
                packed = int.from_bytes(b[10:18], "big")
                info = {
                    "sr": packed >> 44,
                    "ch": ((packed >> 41) & 7) + 1,
                    "bps": ((packed >> 36) & 31) + 1,
                    "total": packed & ((1 << 36) - 1),
                    "md5": b[18:34],
                }
            pos = body + length
            if h & 0x80:
                break
        if info is None or info["sr"] == 0:
            return None
        sr, ch, bps = info["sr"], info["ch"], info["bps"]
        total = info["total"]
        channels_pcm: list[list[int]] = [[] for _ in range(ch)]
        n_frames = 0
        frame_idx = 0
        decoded = 0
        while decoded < total:
            start = pos
            r = _BitReader(data, pos)
            if r.read(14) != 0x3FFE or r.read(1):
                return None
            blocking = r.read(1)
            bs_code = r.read(4)
            sr_code = r.read(4)
            asgn = r.read(4)
            ss_code = r.read(3)
            if r.read(1):
                return None
            num = _utf8_number_dec(r)
            if blocking == 0 and num != frame_idx:
                return None  # frame numbers must be consecutive
            if bs_code == 0:
                return None
            elif bs_code == 1:
                blocksize = 192
            elif 2 <= bs_code <= 5:
                blocksize = 576 << (bs_code - 2)
            elif bs_code == 6:
                blocksize = r.read(8) + 1
            elif bs_code == 7:
                blocksize = r.read(16) + 1
            else:
                blocksize = 256 << (bs_code - 8)
            if sr_code != 0:
                return None  # fixture streams bind sr to STREAMINFO
            if ss_code == 0:
                fbps = bps
            elif ss_code in _SAMPLE_SIZE:
                fbps = _SAMPLE_SIZE[ss_code]
            else:
                return None
            if fbps != bps:
                return None
            hdr_crc = r.read(8)
            if r.bit:
                return None
            if crc8(data[start : r.pos - 1]) != hdr_crc:
                return None  # header CRC-8
            if asgn < 8:
                nch = asgn + 1
                side = -1
            elif asgn in (8, 9):
                nch = 2
                side = 1 if asgn == 8 else 0
            else:
                return None  # mid/side not emitted by the encoder
            if nch != ch:
                return None
            subs = []
            for c in range(nch):
                bits = bps + (1 if c == side else 0)
                subs.append(_subframe_dec(r, blocksize, bits))
            r.align()
            fcrc = r.read(16)
            if crc16(data[start : r.pos - 2]) != fcrc:
                return None  # frame CRC-16
            if asgn == 8:  # left/side
                left, s = subs
                subs = [left, [a - b for a, b in zip(left, s)]]
            elif asgn == 9:  # right/side
                s, right = subs
                subs = [[a + b for a, b in zip(right, s)], right]
            if decoded + blocksize > total:
                return None  # more samples than the books allow
            for c in range(ch):
                channels_pcm[c].extend(subs[c])
            decoded += blocksize
            n_frames += 1
            frame_idx += 1
            pos = r.pos
        if pos != len(data):
            return None  # trailing garbage
        if _pcm_md5(channels_pcm, bps) != info["md5"]:
            return None  # the decoded PCM vs STREAMINFO's claim
        return {
            "sample_rate": sr,
            "channels": ch,
            "bps": bps,
            "n_frames": n_frames,
            "n_samples": total,
            "sample_sum": sum(sum(c) for c in channels_pcm),
        }
    except (ValueError, struct.error):
        return None


# --------------------------------------------------------------------------
# Minimal fixture encoder (separate from the reader)
# --------------------------------------------------------------------------


def _residual_enc(
    w: _BitWriter, resid: list[int], order: int, po: int, escape: bool
):
    w.write(0, 2)  # rice method 0 (4-bit params)
    w.write(po, 4)
    parts = 1 << po
    n = len(resid) + order
    idx = 0
    for p in range(parts):
        cnt = n // parts - (order if p == 0 else 0)
        chunk = resid[idx : idx + cnt]
        idx += cnt
        if escape:
            nraw = max(
                (e.bit_length() + 1 for e in chunk), default=1
            )
            nraw = min(nraw, 31)
            w.write(0xF, 4)
            w.write(nraw, 5)
            for e in chunk:
                w.write_signed(e, nraw)
        else:
            mx = max((_zigzag(e) for e in chunk), default=0)
            param = max(0, mx.bit_length() - 4)
            param = min(param, 14)
            w.write(param, 4)
            for e in chunk:
                u = _zigzag(e)
                w.write_unary(u >> param)
                w.write(u & ((1 << param) - 1), param)


def _subframe_enc(
    w: _BitWriter,
    x: list[int],
    bits: int,
    kind: str,
    po: int,
    escape: bool,
):
    w.write(0, 1)
    if kind == "verbatim":
        w.write(1, 6)
        w.write(0, 1)
        for v in x:
            w.write_signed(v, bits)
        return
    if kind == "constant":
        w.write(0, 6)
        w.write(0, 1)
        w.write_signed(x[0], bits)
        return
    if kind.startswith("fixed"):
        order = int(kind[5:])
        w.write(8 + order, 6)
        w.write(0, 1)
        coeffs, shift = _FIXED_COEFFS[order], 0
    else:  # lpc2: coefficients [2, -1], precision 4, shift 0
        order = 2
        w.write(0x20 | (order - 1), 6)
        w.write(0, 1)
        coeffs, shift = [2, -1], 0
    for v in x[:order]:
        w.write_signed(v, bits)
    if kind == "lpc2":
        w.write(4 - 1, 4)
        w.write_signed(0, 5)
        for c in coeffs:
            w.write_signed(c, 4)
    resid = [
        x[k]
        - (
            sum(c * x[k - 1 - j] for j, c in enumerate(coeffs))
            >> shift
        )
        for k in range(order, len(x))
    ]
    _residual_enc(w, resid, order, po, escape)


def make_flac(
    channels_pcm: list[list[int]],
    sample_rate: int,
    bps: int = 16,
    block_size: int = 256,
    kind_of=None,
) -> bytes:
    """Encode PCM as a valid FLAC stream. ``kind_of(frame, ch) ->
    (kind, partition_order, escape)`` picks the subframe strategy;
    stereo frames with odd index use left/side decorrelation."""
    ch = len(channels_pcm)
    total = len(channels_pcm[0])
    if bps not in _SAMPLE_SIZE_CODE:
        raise ValueError(f"flac: unsupported bps {bps}")
    digest = _pcm_md5(channels_pcm, bps)
    packed = (
        (sample_rate << 44)
        | ((ch - 1) << 41)
        | ((bps - 1) << 36)
        | total
    )
    streaminfo = (
        struct.pack(">HH", block_size, block_size)
        + b"\x00\x00\x00" * 2
        + packed.to_bytes(8, "big")
        + digest
    )
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + len(streaminfo).to_bytes(3, "big")
    out += streaminfo
    if kind_of is None:
        kind_of = lambda f, c: ("fixed1", 0, False)  # noqa: E731
    n_frames = -(-total // block_size)
    for f in range(n_frames):
        lo = f * block_size
        hi = min(lo + block_size, total)
        bs = hi - lo
        use_ls = ch == 2 and f % 2 == 1
        asgn = 8 if use_ls else ch - 1
        hdr = _BitWriter()
        hdr.write(0x3FFE, 14)
        hdr.write(0, 1)
        hdr.write(0, 1)  # fixed blocksize: frame number coded
        hdr.write(7, 4)  # 16-bit blocksize-1 at end of header
        hdr.write(0, 4)  # sample rate from STREAMINFO
        hdr.write(asgn, 4)
        hdr.write(_SAMPLE_SIZE_CODE[bps], 3)
        hdr.write(0, 1)
        hdr.align()
        head = hdr.bytes() + _utf8_number_enc(f) + struct.pack(
            ">H", bs - 1
        )
        head += bytes([crc8(head)])
        body = _BitWriter()
        if use_ls:
            left = channels_pcm[0][lo:hi]
            s = [
                a - b
                for a, b in zip(left, channels_pcm[1][lo:hi])
            ]
            planes = [(left, bps), (s, bps + 1)]
        else:
            planes = [
                (channels_pcm[c][lo:hi], bps) for c in range(ch)
            ]
        for c, (x, bits) in enumerate(planes):
            kind, po, escape = kind_of(f, c)
            if bs % (1 << po):
                po = 0
            order = (
                int(kind[5:]) if kind.startswith("fixed")
                else 2 if kind == "lpc2" else 0
            )
            if bs <= order:
                kind = "verbatim"  # a short last frame can't warm up
            _subframe_enc(body, x, bits, kind, po, escape)
        body.align()
        frame = head + body.bytes()
        frame += struct.pack(">H", crc16(frame))
        out += frame
    return bytes(out)


# --------------------------------------------------------------------------
# Spark wrapper + deterministic fixture
# --------------------------------------------------------------------------

FLAC_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("format", StringType()),
        StructField("sample_rate", LongType()),
        StructField("channels", LongType()),
        StructField("bps", LongType()),
        StructField("n_frames", LongType()),
        StructField("n_samples", LongType()),
        StructField("sample_sum", LongType()),
    ]
)


def flac_stats(df: DataFrame) -> DataFrame:
    """FLAC decode over MEDIA_SCHEMA blobs."""
    from gmall_flink_210726_spark.session import ship_package

    ship_package(df.sparkSession)
    cols = [f.name for f in FLAC_SCHEMA.fields]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                row = {c: 0 for c in cols}
                row.update(media_id=int(mid), format="unknown")
                b = bytes(blob) if blob is not None else b""
                try:
                    st = read_flac(b)
                except Exception:
                    st = None
                if st is not None:
                    row.update(format="flac", **st)
                out.append(row)
            yield pd.DataFrame(out, columns=cols)

    return df.select("media_id", "content").mapInPandas(
        gen, FLAC_SCHEMA
    )


_KINDS = ("fixed1", "fixed2", "lpc2", "verbatim")


def _flac_pcm(i: int, c: int, n: int) -> int:
    return ((7 * i + 13 * c + 5 * n) % 2001) - 1000


def _make_flac_media(i: int) -> bytes:
    """Deterministic FLAC blob: sample rate rotates 8000/16000/22050/
    44100, mono/stereo by parity, 600 + i%300 samples in 256-sample
    frames. Subframe strategy rotates fixed-1 / fixed-2 / LPC /
    VERBATIM by (i+f+c)%4, partition order alternates 0/1, every
    (i+f)%7==0 subframe uses the raw-bits ESCAPE, and stereo frames
    with odd index use LEFT/SIDE decorrelation — every decode path
    exercised. Stripes: every 13th id's STREAMINFO MD5 is wrong
    (only decoding ALL samples exposes it); every 17th-miss id's
    last frame CRC-16 is flipped; every 19th-miss id's STREAMINFO
    total-samples is overstated by one — all refuse."""
    sr = (8000, 16000, 22050, 44100)[i % 4]
    ch = 1 + i % 2
    n = 600 + i % 300
    pcm = [
        [_flac_pcm(i, c, k) for k in range(n)] for c in range(ch)
    ]

    def kind_of(f, c):
        return (
            _KINDS[(i + f + c) % 4],
            f % 2,
            (i + f) % 7 == 0,
        )

    blob = bytearray(make_flac(pcm, sr, kind_of=kind_of))
    if i % 13 == 0:
        blob[8 + 18] ^= 0x01  # MD5 lie
    elif i % 17 == 0:
        blob[-1] ^= 0x01  # last frame CRC-16
    elif i % 19 == 0:
        packed = int.from_bytes(blob[8 + 10 : 8 + 18], "big") + 1
        blob[8 + 10 : 8 + 18] = packed.to_bytes(8, "big")
    return bytes(blob)


def synthesize_flac_media(docs: DataFrame) -> DataFrame:
    """MEDIA_SCHEMA table of FLAC blobs."""
    from gmall_flink_210726_spark.operators.multimodal import MEDIA_SCHEMA
    from gmall_flink_210726_spark.session import (
        ensure_parallelism,
        ship_package,
    )

    ship_package(docs.sparkSession)
    docs = ensure_parallelism(docs.select("doc_id"))

    def gen(batches):
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "content": [
                        _make_flac_media(int(x)) for x in ids
                    ],
                    "meta": [
                        {
                            "format": "flac",
                            "width": 0,
                            "height": 0,
                            "sample_rate": 0,
                        }
                        for _ in ids
                    ],
                }
            )

    return docs.select("doc_id").mapInPandas(gen, MEDIA_SCHEMA)
