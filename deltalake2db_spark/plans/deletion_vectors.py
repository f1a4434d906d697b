"""Deletion-vector decode/encode: Delta's row-level delete encoding.

This is a capability the reference engine rejects outright
(``deltalake2db/protocol_check.py`` lists ``deletionVectors`` as
unsupported); implementing it here extends the supported-table matrix
with everything written by modern engines' DELETE/UPDATE/MERGE.

Formats implemented from public specs only:

* Delta PROTOCOL.md "Deletion Vector Descriptor" / "Deletion Vector
  Format": a DV blob is a 4-byte little-endian magic ``1681511377``
  followed by a 64-bit RoaringBitmapArray in the official "portable"
  format; blobs live inline (``storageType 'i'``, Base85) or in a
  ``deletion_vector_<uuid>.bin`` sidecar (``'u'``/``'p'``) laid out as
  ``[version:u8]`` then per-DV ``[size:u32 BE][blob][crc32:u32 BE]``.
* RoaringFormatSpec (github.com/RoaringBitmap/RoaringFormatSpec): the
  32-bit standard serialization (array / bitmap / run containers, both
  cookies) and the 64-bit portable extension (``u64 LE`` bucket count,
  then per bucket ``u32 LE`` high-key + 32-bit serialization).
* Base85 with the Z85 alphabet (ZeroMQ spec 32) — the codec Delta uses
  for inline blobs and path UUIDs.

The encoder (used by the writer/fixtures) emits array or bitmap
containers, never runs; the decoder accepts all three.
"""

from __future__ import annotations

import struct
import uuid as _uuid
import zlib
from typing import Iterable, Iterator, Sequence

DV_MAGIC = 1681511377
_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE_RUN = 12347
_NO_OFFSET_THRESHOLD = 4

_Z85_CHARS = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_CHARS)}


def z85_encode(data: bytes) -> str:
    if len(data) % 4:
        raise ValueError("z85 input must be 4-byte aligned")
    out = []
    for i in range(0, len(data), 4):
        (word,) = struct.unpack(">I", data[i : i + 4])
        chunk = []
        for _ in range(5):
            word, rem = divmod(word, 85)
            chunk.append(_Z85_CHARS[rem])
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise ValueError("z85 input must be 5-char aligned")
    out = bytearray()
    for i in range(0, len(text), 5):
        word = 0
        for c in text[i : i + 5]:
            word = word * 85 + _Z85_INDEX[c]
        out += struct.pack(">I", word)
    return bytes(out)


# ----------------------------------------------------------------- 32-bit


def _parse_roaring32(buf: memoryview, pos: int) -> tuple[list[int], int]:
    """Standard 32-bit roaring serialization -> sorted values (+ new pos)."""
    (cookie_word,) = struct.unpack_from("<I", buf, pos)
    cookie = cookie_word & 0xFFFF
    if cookie == _SERIAL_COOKIE_RUN:
        n = (cookie_word >> 16) + 1
        pos += 4
        nbytes = (n + 7) // 8
        run_flags = bytes(buf[pos : pos + nbytes])
        pos += nbytes
        has_offsets = n >= _NO_OFFSET_THRESHOLD
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        (n,) = struct.unpack_from("<I", buf, pos + 4)
        pos += 8
        run_flags = b"\x00" * ((n + 7) // 8)
        has_offsets = True
    else:
        raise ValueError(f"bad roaring cookie {cookie}")

    keys_cards = []
    for i in range(n):
        key, card_m1 = struct.unpack_from("<HH", buf, pos)
        keys_cards.append((key, card_m1 + 1))
        pos += 4
    if has_offsets:
        pos += 4 * n  # offsets are redundant for sequential parsing

    values: list[int] = []
    for i, (key, card) in enumerate(keys_cards):
        base = key << 16
        if run_flags[i // 8] & (1 << (i % 8)):
            (nruns,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(nruns):
                start, len_m1 = struct.unpack_from("<HH", buf, pos)
                pos += 4
                values.extend(range(base + start, base + start + len_m1 + 1))
        elif card > 4096:
            words = struct.unpack_from("<1024Q", buf, pos)
            pos += 8192
            for wi, w in enumerate(words):
                while w:
                    low = w & -w
                    values.append(base + (wi << 6) + low.bit_length() - 1)
                    w ^= low
        else:
            vals = struct.unpack_from(f"<{card}H", buf, pos)
            pos += 2 * card
            values.extend(base + v for v in vals)
    return values, pos


def _serialize_roaring32(values: Sequence[int]) -> bytes:
    """No-run-cookie serialization; array or bitmap containers."""
    containers: dict[int, list[int]] = {}
    for v in values:
        containers.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(containers)
    n = len(keys)
    out = bytearray()
    out += struct.pack("<II", _SERIAL_COOKIE_NO_RUN, n)
    for k in keys:
        out += struct.pack("<HH", k, len(containers[k]) - 1)
    # container payloads (built first so offsets can be emitted)
    payloads = []
    for k in keys:
        vals = sorted(set(containers[k]))
        if len(vals) != len(containers[k]):
            raise ValueError("duplicate row indexes in deletion vector")
        if len(vals) > 4096:
            words = [0] * 1024
            for v in vals:
                words[v >> 6] |= 1 << (v & 63)
            payloads.append(struct.pack("<1024Q", *words))
        else:
            payloads.append(struct.pack(f"<{len(vals)}H", *vals))
    offset = len(out) + 4 * n
    for p in payloads:
        out += struct.pack("<I", offset)
        offset += len(p)
    for p in payloads:
        out += p
    return bytes(out)


# ----------------------------------------------------------------- 64-bit


def parse_dv_blob(data: bytes) -> list[int]:
    """Magic + portable RoaringBitmapArray -> sorted 64-bit row indexes."""
    buf = memoryview(data)
    (magic,) = struct.unpack_from("<I", buf, 0)
    if magic != DV_MAGIC:
        raise ValueError(f"bad deletion-vector magic {magic}")
    (nbuckets,) = struct.unpack_from("<Q", buf, 4)
    pos = 12
    values: list[int] = []
    for _ in range(nbuckets):
        (high,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        vals32, pos = _parse_roaring32(buf, pos)
        base = high << 32
        values.extend(base + v for v in vals32)
    return values


def serialize_dv_blob(indexes: Iterable[int]) -> bytes:
    buckets: dict[int, list[int]] = {}
    for i in indexes:
        if i < 0:
            raise ValueError("row index must be non-negative")
        buckets.setdefault(i >> 32, []).append(i & 0xFFFFFFFF)
    out = bytearray(struct.pack("<IQ", DV_MAGIC, len(buckets)))
    for high in sorted(buckets):
        out += struct.pack("<I", high)
        out += _serialize_roaring32(sorted(buckets[high]))
    return bytes(out)


# ------------------------------------------------------------ descriptors


def inline_descriptor(indexes: Sequence[int]) -> dict:
    """Build an ``i`` (inline) deletionVector descriptor."""
    blob = serialize_dv_blob(indexes)
    pad = (-len(blob)) % 4
    return {
        "storageType": "i",
        "pathOrInlineDv": z85_encode(blob + b"\x00" * pad),
        "offset": None,
        "sizeInBytes": len(blob),
        "cardinality": len(indexes),
    }


def write_dv_file(
    table_root: str, index_sets: Sequence[Sequence[int]]
) -> list[dict]:
    """Write one ``deletion_vector_<uuid>.bin`` holding every DV and
    return the matching ``u`` descriptors (shared-file layout, like
    engines batch per-commit)."""
    import os

    uid = _uuid.uuid4()
    name = f"deletion_vector_{uid}.bin"
    body = bytearray(b"\x01")  # format version
    descriptors = []
    for indexes in index_sets:
        blob = serialize_dv_blob(indexes)
        offset = len(body)
        body += struct.pack(">I", len(blob))
        body += blob
        body += struct.pack(">I", zlib.crc32(blob) & 0xFFFFFFFF)
        descriptors.append(
            {
                "storageType": "u",
                "pathOrInlineDv": z85_encode(uid.bytes),
                "offset": offset,
                "sizeInBytes": len(blob),
                "cardinality": len(indexes),
            }
        )
    with open(os.path.join(table_root, name), "wb") as fh:
        fh.write(bytes(body))
    return descriptors


def dv_file_path(descriptor: dict, table_root: str) -> str:
    """Resolve a ``u``/``p`` descriptor to its sidecar file path."""
    st = descriptor.get("storageType")
    if st == "p":
        return descriptor["pathOrInlineDv"]
    enc = descriptor["pathOrInlineDv"]
    # the encoded UUID is the LAST 20 chars; anything before it is a
    # directory prefix.  (Never split on "/" — it is a Z85 alphabet
    # character and can appear inside the encoded UUID itself.)
    prefix, uuid_part = enc[:-20], enc[-20:]
    uid = _uuid.UUID(bytes=z85_decode(uuid_part))
    name = f"deletion_vector_{uid}.bin"
    root = table_root.rstrip("/")
    return f"{root}/{prefix}/{name}" if prefix else f"{root}/{name}"


def read_descriptor(descriptor: dict, table_root: str, opener=None) -> list[int]:
    """Deleted row indexes for one add action's descriptor.

    ``opener(path) -> file-like`` defaults to local ``open``; the scan
    passes a pyarrow-fs opener for remote tables.
    """
    st = descriptor.get("storageType")
    if st == "i":
        blob = z85_decode(descriptor["pathOrInlineDv"])[
            : descriptor["sizeInBytes"]
        ]
        return parse_dv_blob(blob)
    path = dv_file_path(descriptor, table_root)
    if opener is None:
        fh = open(path, "rb")
    else:
        fh = opener(path)
    with fh:
        fh.seek(descriptor["offset"])
        (size,) = struct.unpack(">I", fh.read(4))
        if size != descriptor["sizeInBytes"]:
            raise ValueError(
                f"DV length prefix {size} != descriptor sizeInBytes "
                f"{descriptor['sizeInBytes']} in {path}"
            )
        blob = fh.read(size)
        (crc,) = struct.unpack(">I", fh.read(4))
        if crc != zlib.crc32(blob) & 0xFFFFFFFF:
            raise ValueError(f"DV checksum mismatch in {path}")
    values = parse_dv_blob(blob)
    if len(values) != descriptor.get("cardinality", len(values)):
        raise ValueError(
            f"DV cardinality {len(values)} != descriptor "
            f"{descriptor['cardinality']} in {path}"
        )
    return values


def iter_dv_rows(
    actions: Sequence[dict], table_root: str, opener=None
) -> Iterator[tuple[str, int]]:
    """(file basename, deleted row index) pairs for every DV-carrying
    add action — the anti-join side of the scan."""
    for a in actions:
        dv = a.get("deletionVector")
        if not dv:
            continue
        basename = a["path"].rsplit("/", 1)[-1]
        for idx in read_descriptor(dv, table_root, opener=opener):
            yield basename, idx
