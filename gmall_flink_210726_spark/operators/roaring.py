r"""RoaringBitmap portable serialization + RFC 1924 base85 — the two
codecs Delta Lake's DELETION VECTORS are built from (delta.io
PROTOCOL.md "Deletion Vectors"; RoaringFormatSpec for the bitmap
wire format).

32-bit roaring ("portable" format): values are split into a 16-bit
key (high half) and a 16-bit low half; each key owns one container:

- ARRAY (cardinality <= 4096): sorted uint16 LE values;
- BITMAP: 1024 uint64 LE words (8 KiB bitset);
- RUN: uint16 run count then (start, length-1) uint16 pairs.

Framing: cookie 12346 (no run containers; followed by a 4-byte
container count and a mandatory offset header) or 12347 (run
containers present; count folded into the cookie's high 16 bits,
then a run-flag bitset, offsets only when count >= 4), then
(key, cardinality-1) pairs, then the containers. The decoder checks
strictly-increasing keys, sorted container payloads, cardinality
agreement, offset-header truth, and exact input consumption.

64-bit values (row indexes can exceed 2^32 at lakehouse scale) use
Delta's RoaringBitmapArray "portable" layout: int64 LE bitmap
count, then each 32-bit bitmap in portable format, index b holding
the values in [b·2^32, (b+1)·2^32).

The encoder here exists for fixtures and round-trip fuzz; container
choice follows the spec's size rule (smallest of run/array/bitmap
serializations wins).
"""

from __future__ import annotations

import struct

SERIAL_COOKIE_NO_RUN = 12346
SERIAL_COOKIE = 12347
_NO_OFFSET_THRESHOLD = 4

# ------------------------------------------------------------- base85

_B85_ALPHABET = (
    "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    "abcdefghijklmnopqrstuvwxyz"
    "!#$%&()*+-;<=>?@^_`{|}~"
)
_B85_INDEX = {c: i for i, c in enumerate(_B85_ALPHABET)}


def b85_encode(data: bytes) -> str:
    """RFC 1924 base85 (the variant Delta uses for DV UUIDs and
    inline DVs). Input is zero-padded to a multiple of 4; callers
    carry the true length out of band (the DV descriptor's
    sizeInBytes)."""
    pad = (-len(data)) % 4
    data = data + b"\x00" * pad
    out = []
    for g in range(0, len(data), 4):
        (v,) = struct.unpack_from(">I", data, g)
        chunk = []
        for _ in range(5):
            chunk.append(_B85_ALPHABET[v % 85])
            v //= 85
        out.extend(reversed(chunk))
    return "".join(out)


def b85_decode(text: str) -> bytes:
    """Strict decode: length must be a multiple of 5, every digit in
    the alphabet, every group <= 0xFFFFFFFF."""
    if len(text) % 5:
        raise ValueError("base85: bad length")
    out = bytearray()
    for g in range(0, len(text), 5):
        v = 0
        for c in text[g : g + 5]:
            d = _B85_INDEX.get(c)
            if d is None:
                raise ValueError("base85: bad digit")
            v = v * 85 + d
        if v > 0xFFFFFFFF:
            raise ValueError("base85: group overflow")
        out += struct.pack(">I", v)
    return bytes(out)


# ----------------------------------------------------- 32-bit roaring


def _runs_of(values: list[int]) -> list[tuple[int, int]]:
    runs = []
    start = prev = values[0]
    for v in values[1:]:
        if v == prev + 1:
            prev = v
            continue
        runs.append((start, prev - start))
        start = prev = v
    runs.append((start, prev - start))
    return runs


def roaring_encode(values: list[int]) -> bytes:
    """Serialize sorted distinct uint32 values per RoaringFormatSpec,
    choosing each container by the spec's smallest-serialization
    rule."""
    if any(not 0 <= v <= 0xFFFFFFFF for v in values):
        raise ValueError("roaring: value out of range")
    if sorted(set(values)) != list(values):
        raise ValueError("roaring: values must be sorted distinct")
    chunks: dict[int, list[int]] = {}
    for v in values:
        chunks.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(chunks)
    containers = []
    any_run = False
    for key in keys:
        lows = chunks[key]
        runs = _runs_of(lows)
        run_size = 2 + 4 * len(runs)
        arr_size = 2 * len(lows)
        if run_size < min(arr_size, 8192):
            body = struct.pack("<H", len(runs)) + b"".join(
                struct.pack("<HH", s, ln) for s, ln in runs
            )
            containers.append((key, len(lows), "run", body))
            any_run = True
        elif len(lows) <= 4096:
            body = struct.pack(f"<{len(lows)}H", *lows)
            containers.append((key, len(lows), "array", body))
        else:
            words = [0] * 1024
            for lo in lows:
                words[lo >> 6] |= 1 << (lo & 63)
            body = struct.pack("<1024Q", *words)
            containers.append((key, len(lows), "bitmap", body))
    n = len(containers)
    out = bytearray()
    if any_run:
        out += struct.pack("<I", SERIAL_COOKIE | ((n - 1) << 16))
        flags = bytearray((n + 7) // 8)
        for idx, (_, _, kind, _b) in enumerate(containers):
            if kind == "run":
                flags[idx // 8] |= 1 << (idx % 8)
        out += flags
    else:
        out += struct.pack("<II", SERIAL_COOKIE_NO_RUN, n)
    for key, card, _kind, _b in containers:
        out += struct.pack("<HH", key, card - 1)
    if not any_run or n >= _NO_OFFSET_THRESHOLD:
        pos = len(out) + 4 * n
        for _key, _card, _kind, body in containers:
            out += struct.pack("<I", pos)
            pos += len(body)
    for _key, _card, _kind, body in containers:
        out += body
    return bytes(out)


def roaring_decode(data: bytes, pos: int = 0) -> tuple[list[int], int]:
    """Decode one portable 32-bit roaring bitmap starting at ``pos``.
    Returns (sorted values, end position). Raises ValueError on any
    structural violation."""
    start = pos  # offset-header entries are relative to this point
    if pos + 4 > len(data):
        raise ValueError("roaring: truncated cookie")
    (cookie_word,) = struct.unpack_from("<I", data, pos)
    cookie = cookie_word & 0xFFFF
    if cookie == SERIAL_COOKIE:
        n = (cookie_word >> 16) + 1
        pos += 4
        nflag = (n + 7) // 8
        if pos + nflag > len(data):
            raise ValueError("roaring: truncated run flags")
        flags = data[pos : pos + nflag]
        pos += nflag
        run_flag = [bool(flags[i // 8] >> (i % 8) & 1) for i in range(n)]
        has_offsets = n >= _NO_OFFSET_THRESHOLD
    elif cookie == SERIAL_COOKIE_NO_RUN:
        if cookie_word != SERIAL_COOKIE_NO_RUN:
            raise ValueError("roaring: junk in cookie high bits")
        if pos + 8 > len(data):
            raise ValueError("roaring: truncated size")
        (n,) = struct.unpack_from("<I", data, pos + 4)
        pos += 8
        if n > 0x10000:  # bound BEFORE allocating anything n-sized
            raise ValueError("roaring: bad container count")
        run_flag = [False] * n
        has_offsets = True
    else:
        raise ValueError("roaring: bad cookie")
    if n == 0 or n > 0x10000:
        raise ValueError("roaring: bad container count")
    if pos + 4 * n > len(data):
        raise ValueError("roaring: truncated key/card header")
    keys = []
    cards = []
    for c in range(n):
        key, cm1 = struct.unpack_from("<HH", data, pos + 4 * c)
        keys.append(key)
        cards.append(cm1 + 1)
    pos += 4 * n
    if any(b <= a for a, b in zip(keys, keys[1:])):
        raise ValueError("roaring: keys not strictly increasing")
    offsets = None
    if has_offsets:
        if pos + 4 * n > len(data):
            raise ValueError("roaring: truncated offsets")
        offsets = list(struct.unpack_from(f"<{n}I", data, pos))
        pos += 4 * n
    values: list[int] = []
    for c in range(n):
        if offsets is not None and offsets[c] != pos - start:
            raise ValueError("roaring: offset header lies")
        hi = keys[c] << 16
        card = cards[c]
        if run_flag[c]:
            if pos + 2 > len(data):
                raise ValueError("roaring: truncated run count")
            (nruns,) = struct.unpack_from("<H", data, pos)
            pos += 2
            if pos + 4 * nruns > len(data):
                raise ValueError("roaring: truncated runs")
            got = 0
            prev_end = -1
            for r in range(nruns):
                s, lm1 = struct.unpack_from("<HH", data, pos + 4 * r)
                if s <= prev_end:
                    raise ValueError("roaring: runs overlap")
                if s + lm1 > 0xFFFF:
                    raise ValueError("roaring: run out of range")
                values.extend(hi | v for v in range(s, s + lm1 + 1))
                got += lm1 + 1
                prev_end = s + lm1
            pos += 4 * nruns
            if got != card:
                raise ValueError("roaring: run cardinality mismatch")
        elif card <= 4096:
            if pos + 2 * card > len(data):
                raise ValueError("roaring: truncated array")
            lows = struct.unpack_from(f"<{card}H", data, pos)
            pos += 2 * card
            if any(b <= a for a, b in zip(lows, lows[1:])):
                raise ValueError("roaring: array not sorted")
            values.extend(hi | v for v in lows)
        else:
            if pos + 8192 > len(data):
                raise ValueError("roaring: truncated bitmap")
            words = struct.unpack_from("<1024Q", data, pos)
            pos += 8192
            got = 0
            for w, word in enumerate(words):
                while word:
                    b = (word & -word).bit_length() - 1
                    values.append(hi | (w << 6) | b)
                    word &= word - 1
                    got += 1
            if got != card:
                raise ValueError("roaring: bitmap cardinality mismatch")
    return values, pos


# ------------------------------------------ 64-bit RoaringBitmapArray

MAGIC_RBM_ARRAY = 1681511377  # Delta's RoaringBitmapArray magic


def rbm_array_encode(values: list[int]) -> bytes:
    """Delta 'portable' RoaringBitmapArray: magic, int64 LE bitmap
    count, then contiguous 32-bit portable bitmaps (index = value
    high 32 bits; empty gap bitmaps are not allowed, so the count
    covers 0..max_hi and every slot must be non-empty in our
    fixtures — matching the reference implementation's invariant
    that trailing/interior empties are never serialized)."""
    if sorted(set(values)) != list(values) or (
        values and values[0] < 0
    ):
        raise ValueError("rbm-array: values must be sorted distinct")
    groups: dict[int, list[int]] = {}
    for v in values:
        groups.setdefault(v >> 32, []).append(v & 0xFFFFFFFF)
    n = (max(groups) + 1) if groups else 0
    if len(groups) != n:
        raise ValueError("rbm-array: empty interior bitmap")
    out = bytearray(struct.pack("<Iq", MAGIC_RBM_ARRAY, n))
    for b in range(n):
        out += roaring_encode(groups[b])
    return bytes(out)


def rbm_array_decode(data: bytes) -> list[int]:
    """Strict decode; the payload must be consumed exactly."""
    if len(data) < 12:
        raise ValueError("rbm-array: truncated header")
    magic, n = struct.unpack_from("<Iq", data, 0)
    if magic != MAGIC_RBM_ARRAY:
        raise ValueError("rbm-array: bad magic")
    if n < 0 or n > 1 << 20:
        raise ValueError("rbm-array: bad bitmap count")
    pos = 12
    values: list[int] = []
    for b in range(n):
        vals32, pos = roaring_decode(data, pos)
        if not vals32:
            raise ValueError("rbm-array: empty bitmap slot")
        values.extend((b << 32) | v for v in vals32)
    if pos != len(data):
        raise ValueError("rbm-array: trailing bytes")
    return values
