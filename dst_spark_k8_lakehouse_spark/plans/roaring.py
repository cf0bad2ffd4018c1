"""Pure-Python Roaring bitmap codec for Delta Lake DELETION VECTORS
(public formats only: the RoaringFormatSpec "portable" 32-bit
serialization, Delta PROTOCOL.md's 64-bit ``RoaringBitmapArray``
extension of it, the 1-byte-version / size+CRC32-framed DV file
layout, and ZeroMQ's Z85 text encoding used for inline DVs and DV
file names).

Why it exists: a deletion vector IS the merge-on-read story on the
Delta side — a delete commit writes a compressed set of dropped row
indexes per data file instead of rewriting the files. No Delta
runtime jar is installable here, so reading (and writing) DV-carrying
tables needs the bitmap codec in plain Python. DV blobs are
metadata-sized (compressed; KBs for millions of rows when clustered),
so driver-side decode is the same cost class as reading the JSON log.

Conformance: the 32-bit serialization is byte-compared against the
REFERENCE implementation (``org.roaringbitmap`` 1.3.0, bundled with
Spark) in ``tests/test_roaring.py`` — serialize here, deserialize
there, and vice versa. The 64-bit array layout (magic 1681511377 +
u64-LE dense bitmap count + concatenated 32-bit bitmaps, key = array
index) and the DV file framing (version byte 1; per-blob i32-BE size,
data, i32-BE CRC32) follow the Delta protocol text; every framing
field is verified loudly on read (magic, size, CRC).

Scope limits (raise, never wrong rows): 32-bit read side handles
array / bitmap / run containers (real writers runOptimize); the write
side emits array / bitmap only (always valid; run encoding is an
optional optimization).
"""

from __future__ import annotations

import struct
import zlib

SERIAL_COOKIE_NO_RUNCONTAINER = 12346
SERIAL_COOKIE = 12347
NO_OFFSET_THRESHOLD = 4
RBM_ARRAY_MAGIC = 1681511377  # Delta PROTOCOL.md "portable" magic
DV_FILE_VERSION = 1

# ---------------------------------------------------------------- Z85

_Z85 = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INV = {c: i for i, c in enumerate(_Z85)}


def z85_encode(data: bytes) -> str:
    if len(data) % 4:
        raise ValueError(f"Z85 input length {len(data)} not /4")
    out = []
    for i in range(0, len(data), 4):
        v = int.from_bytes(data[i: i + 4], "big")
        chunk = []
        for _ in range(5):
            chunk.append(_Z85[v % 85])
            v //= 85
        out += reversed(chunk)
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise ValueError(f"Z85 text length {len(text)} not /5")
    out = bytearray()
    for i in range(0, len(text), 5):
        v = 0
        for c in text[i: i + 5]:
            v = v * 85 + _Z85_INV[c]
        out += v.to_bytes(4, "big")
    return bytes(out)


# ------------------------------------------------- 32-bit roaring

def serialize_roaring32(values) -> bytes:
    """Portable serialization of a 32-bit roaring bitmap from an
    iterable of uint32s — the no-run-container layout (cookie 12346),
    byte-identical to ``org.roaringbitmap.RoaringBitmap.serialize``
    on a bitmap without run optimization."""
    containers: dict[int, set[int]] = {}
    for v in values:
        if not 0 <= v < (1 << 32):
            raise ValueError(f"value {v} out of uint32 range")
        containers.setdefault(v >> 16, set()).add(v & 0xFFFF)
    keys = sorted(containers)
    size = len(keys)
    out = bytearray()
    out += struct.pack("<ii", SERIAL_COOKIE_NO_RUNCONTAINER, size)
    for k in keys:
        out += struct.pack("<HH", k, len(containers[k]) - 1)
    # offset header (always present for the no-run cookie)
    pos = 4 + 4 + 4 * size + 4 * size
    offsets = []
    for k in keys:
        offsets.append(pos)
        card = len(containers[k])
        pos += 2 * card if card <= 4096 else 8192
    for o in offsets:
        out += struct.pack("<I", o)
    for k in keys:
        vals = sorted(containers[k])
        if len(vals) <= 4096:
            out += struct.pack(f"<{len(vals)}H", *vals)
        else:
            words = [0] * 1024
            for v in vals:
                words[v >> 6] |= 1 << (v & 63)
            out += struct.pack("<1024Q", *words)
    return bytes(out)


def deserialize_roaring32(buf: bytes, off: int = 0) -> tuple[list[int], int]:
    """Parse one portable 32-bit roaring bitmap at ``buf[off:]``;
    returns (sorted values, offset past the bitmap). Handles array,
    bitmap AND run containers (both cookies)."""
    (cookie,) = struct.unpack_from("<i", buf, off)
    start = off
    off += 4
    run_flags = b""
    if (cookie & 0xFFFF) == SERIAL_COOKIE:
        size = (cookie >> 16) + 1
        nflag = (size + 7) // 8
        run_flags = buf[off: off + nflag]
        off += nflag
        has_offsets = size >= NO_OFFSET_THRESHOLD
    elif cookie == SERIAL_COOKIE_NO_RUNCONTAINER:
        (size,) = struct.unpack_from("<i", buf, off)
        off += 4
        has_offsets = True
    else:
        raise ValueError(f"roaring cookie {cookie} at byte {start}")
    keys, cards = [], []
    for _ in range(size):
        k, c1 = struct.unpack_from("<HH", buf, off)
        off += 4
        keys.append(k)
        cards.append(c1 + 1)
    if has_offsets:
        off += 4 * size  # we read containers sequentially anyway
    values: list[int] = []
    for i in range(size):
        base = keys[i] << 16
        is_run = bool(run_flags) and (run_flags[i >> 3] >> (i & 7)) & 1
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, off)
            off += 2
            for _ in range(n_runs):
                s, ln = struct.unpack_from("<HH", buf, off)
                off += 4
                values.extend(range(base + s, base + s + ln + 1))
        elif cards[i] <= 4096:
            vals = struct.unpack_from(f"<{cards[i]}H", buf, off)
            off += 2 * cards[i]
            values.extend(base + v for v in vals)
        else:
            words = struct.unpack_from("<1024Q", buf, off)
            off += 8192
            for w_i, w in enumerate(words):
                while w:
                    low = w & -w
                    values.append(base + (w_i << 6) + low.bit_length() - 1)
                    w ^= low
    return values, off


# --------------------------------------- 64-bit RoaringBitmapArray

def serialize_roaring64_portable(values) -> bytes:
    """The OFFICIAL 64-bit Roaring "portable" serialization
    (``Roaring64NavigableMap.serializePortable`` — what Iceberg v3's
    Puffin ``deletion-vector-v1`` blob carries): u64-LE bitmap count,
    then per NON-EMPTY high-32 key ascending: u32-LE key + the 32-bit
    portable bitmap. Differs from Delta's ``RoaringBitmapArray``
    (above) in magic (none) and key encoding (SPARSE explicit keys vs
    dense index-as-key). Byte-conformance against the bundled
    org.roaringbitmap is pinned in ``tests/test_roaring.py``."""
    buckets: dict[int, list[int]] = {}
    for v in values:
        if not 0 <= v < (1 << 64):
            raise ValueError(f"value {v} out of uint64 range")
        buckets.setdefault(v >> 32, []).append(v & 0xFFFFFFFF)
    out = bytearray()
    out += struct.pack("<Q", len(buckets))
    for k in sorted(buckets):
        out += struct.pack("<I", k)
        out += serialize_roaring32(buckets[k])
    return bytes(out)


def deserialize_roaring64_portable(data: bytes) -> list[int]:
    """Inverse of ``serialize_roaring64_portable`` — sorted values.
    Verifies full consumption (a trailing-garbage blob raises)."""
    if len(data) < 8:
        raise ValueError(f"roaring64 blob too short ({len(data)}B)")
    (n,) = struct.unpack_from("<Q", data, 0)
    off = 8
    out: list[int] = []
    for _ in range(n):
        (key,) = struct.unpack_from("<I", data, off)
        off += 4
        lows, off = deserialize_roaring32(data, off)
        base = key << 32
        out += [base | lo for lo in lows]
    if off != len(data):
        raise ValueError(
            f"roaring64 blob has {len(data) - off} trailing bytes"
        )
    return out


def serialize_rbm_array(values) -> bytes:
    """Delta's portable ``RoaringBitmapArray``: magic, u64-LE bitmap
    count, then one 32-bit bitmap per high-32 key from 0..max key —
    DENSE (empty keys serialize an empty bitmap; the index IS the
    key)."""
    buckets: dict[int, list[int]] = {}
    for v in values:
        if not 0 <= v < (1 << 64):
            raise ValueError(f"value {v} out of uint64 range")
        buckets.setdefault(v >> 32, []).append(v & 0xFFFFFFFF)
    n = (max(buckets) + 1) if buckets else 0
    out = bytearray()
    out += struct.pack("<i", RBM_ARRAY_MAGIC)
    out += struct.pack("<Q", n)
    for k in range(n):
        out += serialize_roaring32(buckets.get(k, []))
    return bytes(out)


def deserialize_rbm_array(data: bytes) -> list[int]:
    (magic,) = struct.unpack_from("<i", data, 0)
    if magic != RBM_ARRAY_MAGIC:
        raise ValueError(
            f"deletion-vector magic {magic} != {RBM_ARRAY_MAGIC} "
            "(not a portable RoaringBitmapArray)"
        )
    (n,) = struct.unpack_from("<Q", data, 4)
    off = 12
    values: list[int] = []
    for k in range(n):
        vals, off = deserialize_roaring32(data, off)
        values.extend((k << 32) | v for v in vals)
    return values


# ------------------------------------------------------ DV files

def append_dv_blobs(path: str, blobs: list[bytes]) -> list[tuple[int, int]]:
    """Create a DV file holding ``blobs`` (one serialized
    RoaringBitmapArray each) in the protocol's framing — version byte,
    then per blob [i32-BE size][data][i32-BE CRC32(data)]. Returns
    (offset, sizeInBytes) per blob for the add-action descriptors."""
    spans = []
    with open(path, "wb") as fh:
        fh.write(bytes([DV_FILE_VERSION]))
        pos = 1
        for data in blobs:
            fh.write(struct.pack(">i", len(data)))
            fh.write(data)
            fh.write(struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF))
            spans.append((pos, len(data)))
            pos += 4 + len(data) + 4
    return spans


def read_dv_blob(path: str, offset: int, size_in_bytes: int) -> bytes:
    with open(path, "rb") as fh:
        version = fh.read(1)[0]
        if version != DV_FILE_VERSION:
            raise ValueError(f"DV file version {version} != 1 at {path}")
        fh.seek(offset)
        (n,) = struct.unpack(">i", fh.read(4))
        if n != size_in_bytes:
            raise ValueError(
                f"DV blob size {n} != descriptor sizeInBytes "
                f"{size_in_bytes} at {path}:{offset}"
            )
        data = fh.read(n)
        (crc,) = struct.unpack(">I", fh.read(4))
        actual = zlib.crc32(data) & 0xFFFFFFFF
        if crc != actual:
            raise ValueError(
                f"DV blob CRC {actual:#x} != stored {crc:#x} "
                f"at {path}:{offset}"
            )
    return data
