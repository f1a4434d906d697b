"""EXIF metadata over JPEG binary columns — extraction and PII scrub.

Image provenance metadata (camera make/model, capture time) is a
curation signal, and embedded GPS coordinates are PII that a
training-data pipeline must strip before images enter a corpus — the
image-side counterpart of ``text.redact_pii``.  Pure ``struct``
parsing of the public formats (JPEG APPn segments, the EXIF/TIFF IFD
layout): no codec touched, so both operators run on the compressed
bytes without decoding a single pixel.

* ``parse_exif(payload)``: ``{make, model, datetime, orientation,
  software, has_gps, gps_lat, gps_lon}`` from the APP1 "Exif"
  segment (TIFF byte order II/MM both handled, IFD0 + GPS IFD
  walked, rational lat/lon resolved to signed degrees).
* ``strip_gps(payload)``: the SAME JPEG with the GPS-IFD pointer
  deleted from IFD0 and the GPS IFD bytes zeroed IN PLACE — every
  other tag (parsed or not: Exif sub-IFD, exposure, maker notes)
  survives byte-intact, and entropy-coded data is untouched, so
  decoded pixels are bit-identical.
* ``encode_exif_app1(...)``: the writer partner for fixtures/gates.
* ``exif_stats(df)`` / ``scrub_gps(df)``: the Spark map-side tier.

Reference scope: the reference engine has no media support
(SURVEY.md §2.5); north-star extension for multimodal pipelines.
"""

from __future__ import annotations

import struct
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame

_TAG_MAKE = 0x010F
_TAG_MODEL = 0x0110
_TAG_ORIENT = 0x0112
_TAG_SOFTWARE = 0x0131
_TAG_DATETIME = 0x0132
_TAG_GPS_IFD = 0x8825
_GPS_LAT_REF = 0x0001
_GPS_LAT = 0x0002
_GPS_LON_REF = 0x0003
_GPS_LON = 0x0004

_MAX_ENTRIES = 512  # adversarial-header guard


def _ifd_entries(tiff: bytes, off: int, bo: str):
    """Yield (tag, type, count, raw_value_bytes, value_off) for one
    IFD."""
    if off + 2 > len(tiff):
        return
    (n,) = struct.unpack_from(bo + "H", tiff, off)
    if n > _MAX_ENTRIES:
        return
    for i in range(n):
        e = off + 2 + 12 * i
        if e + 12 > len(tiff):
            return
        tag, typ, cnt = struct.unpack_from(bo + "HHI", tiff, e)
        size = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}.get(
            typ, 1
        ) * cnt
        if size <= 4:
            voff = e + 8
        else:
            (voff,) = struct.unpack_from(bo + "I", tiff, e + 8)
        if voff + size > len(tiff):
            continue
        yield tag, typ, cnt, tiff[voff : voff + size], voff


def _ascii(raw: bytes) -> str:
    return raw.split(b"\x00")[0].decode("ascii", "replace").strip()


def _rationals(raw: bytes, cnt: int, bo: str):
    out = []
    for i in range(cnt):
        num, den = struct.unpack_from(bo + "II", raw, 8 * i)
        out.append(num / den if den else 0.0)
    return out


def _app1_segment(payload: bytes):
    """(seg_start, seg_end, tiff_bytes) of the APP1 Exif segment, or
    None.  seg bounds include the FFE1 marker + length."""
    if payload is None or payload[:2] != b"\xff\xd8":
        return None
    pos = 2
    n = len(payload)
    while pos + 4 <= n and payload[pos] == 0xFF:
        marker = payload[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD9:
            pos += 2
            continue
        (ln,) = struct.unpack_from(">H", payload, pos + 2)
        if marker == 0xE1 and payload[pos + 4 : pos + 10] == b"Exif\x00\x00":
            return pos, pos + 2 + ln, payload[pos + 10 : pos + 2 + ln]
        if marker == 0xDA:  # entropy data starts — no EXIF before it
            return None
        pos += 2 + ln
    return None


def parse_exif(payload: bytes) -> Optional[dict]:
    """EXIF fields from a JPEG, or None when there is no APP1 Exif
    segment (or it is malformed)."""
    seg = _app1_segment(payload)
    if seg is None:
        return None
    tiff = seg[2]
    try:
        if tiff[:2] == b"II":
            bo = "<"
        elif tiff[:2] == b"MM":
            bo = ">"
        else:
            return None
        (magic,) = struct.unpack_from(bo + "H", tiff, 2)
        if magic != 42:
            return None
        (ifd0,) = struct.unpack_from(bo + "I", tiff, 4)
        out = {
            "make": None, "model": None, "datetime": None,
            "orientation": None, "software": None, "has_gps": False,
            "gps_lat": None, "gps_lon": None,
        }
        gps_off = None
        for tag, typ, cnt, raw, _ in _ifd_entries(tiff, ifd0, bo):
            if tag == _TAG_MAKE:
                out["make"] = _ascii(raw)
            elif tag == _TAG_MODEL:
                out["model"] = _ascii(raw)
            elif tag == _TAG_SOFTWARE:
                out["software"] = _ascii(raw)
            elif tag == _TAG_DATETIME:
                out["datetime"] = _ascii(raw)
            elif tag == _TAG_ORIENT:
                (out["orientation"],) = struct.unpack_from(
                    bo + "H", raw, 0
                )
            elif tag == _TAG_GPS_IFD:
                (gps_off,) = struct.unpack_from(bo + "I", raw, 0)
        if gps_off is not None:
            out["has_gps"] = True
            lat = lon = None
            lat_s = lon_s = 1.0
            for tag, typ, cnt, raw, _ in _ifd_entries(tiff, gps_off, bo):
                if tag == _GPS_LAT_REF:
                    lat_s = -1.0 if _ascii(raw) == "S" else 1.0
                elif tag == _GPS_LON_REF:
                    lon_s = -1.0 if _ascii(raw) == "W" else 1.0
                elif tag == _GPS_LAT and typ == 5 and cnt >= 3:
                    d, m, s = _rationals(raw, 3, bo)
                    lat = d + m / 60 + s / 3600
                elif tag == _GPS_LON and typ == 5 and cnt >= 3:
                    d, m, s = _rationals(raw, 3, bo)
                    lon = d + m / 60 + s / 3600
            if lat is not None:
                out["gps_lat"] = round(lat_s * lat, 6)
            if lon is not None:
                out["gps_lon"] = round(lon_s * lon, 6)
        return out
    except (struct.error, IndexError, ValueError):
        return None


def strip_gps(payload: bytes) -> bytes:
    """The same JPEG with GPS data removed by SURGICAL in-place edit
    of the APP1 Exif segment: the GPS-IFD pointer entry is deleted
    from IFD0 (remaining entries shift up, the freed 12 bytes are
    zeroed, the entry count decrements) and the GPS IFD itself — its
    entry table and every value blob its entries reference — is
    zeroed.  Nothing else moves, so every OTHER tag (Exif sub-IFD,
    exposure, thumbnail pointers, maker notes) survives byte-intact
    and no dangling GPS bytes remain anywhere in the segment.
    Entropy-coded data is untouched — decoded pixels are
    bit-identical.  JPEGs without EXIF/GPS pass through unchanged."""
    seg = _app1_segment(payload)
    if seg is None:
        return payload
    s0, s1, tiff_ro = seg
    tiff = bytearray(tiff_ro)
    try:
        if tiff[:2] == b"II":
            bo = "<"
        elif tiff[:2] == b"MM":
            bo = ">"
        else:
            return payload
        (magic,) = struct.unpack_from(bo + "H", tiff, 2)
        if magic != 42:
            return payload
        (ifd0,) = struct.unpack_from(bo + "I", tiff, 4)
        if ifd0 + 2 > len(tiff):
            return payload
        (n0,) = struct.unpack_from(bo + "H", tiff, ifd0)
        if n0 > _MAX_ENTRIES:
            return payload
        gps_idx = gps_off = None
        for i in range(n0):
            e = ifd0 + 2 + 12 * i
            if e + 12 > len(tiff):
                return payload
            (tag,) = struct.unpack_from(bo + "H", tiff, e)
            if tag == _TAG_GPS_IFD:
                gps_idx = i
                (gps_off,) = struct.unpack_from(bo + "I", tiff, e + 8)
                break
        if gps_idx is None:
            return payload
        # zero the GPS IFD: its entry table (+ next-IFD pointer slot)
        # and each entry's out-of-line value span
        if gps_off + 2 <= len(tiff):
            (gn,) = struct.unpack_from(bo + "H", tiff, gps_off)
            if gn <= _MAX_ENTRIES:
                for _tag, _typ, cnt, raw, voff in list(_ifd_entries(
                    bytes(tiff), gps_off, bo
                )):
                    tiff[voff : voff + len(raw)] = b"\x00" * len(raw)
                tbl_end = min(gps_off + 2 + 12 * gn + 4, len(tiff))
                tiff[gps_off:tbl_end] = b"\x00" * (tbl_end - gps_off)
        # delete the pointer entry from IFD0: shift the entries after
        # it plus the next-IFD pointer up 12 bytes, zero the tail gap
        ek = ifd0 + 2 + 12 * gps_idx
        blk_end = min(ifd0 + 2 + 12 * n0 + 4, len(tiff))
        tiff[ek : blk_end - 12] = tiff[ek + 12 : blk_end]
        tiff[blk_end - 12 : blk_end] = b"\x00" * 12
        struct.pack_into(bo + "H", tiff, ifd0, n0 - 1)
    except (struct.error, IndexError, ValueError):
        return payload
    return payload[: s0 + 10] + bytes(tiff) + payload[s1:]


def encode_exif_app1(
    make: str | None = None,
    model: str | None = None,
    datetime_str: str | None = None,
    orientation: int | None = None,
    gps: tuple | None = None,
    software: str | None = None,
) -> bytes:
    """A complete APP1 Exif segment (big-endian TIFF) with the given
    IFD0 fields and optional ``gps=(lat, lon)`` in signed degrees —
    the writer partner of ``parse_exif`` for fixtures and gates."""
    entries = []
    blobs = bytearray()

    def add(tag, typ, cnt, val4=None, blob=None, base=0):
        if blob is not None:
            entries.append((tag, typ, cnt, None, len(blobs)))
            blobs.extend(blob)
            if len(blob) & 1:
                blobs.append(0)
        else:
            entries.append((tag, typ, cnt, val4, None))

    def ascii_field(tag, s):
        b = s.encode("ascii", "replace") + b"\x00"
        if len(b) <= 4:
            add(tag, 2, len(b), b.ljust(4, b"\x00"))
        else:
            add(tag, 2, len(b), blob=b)

    if make:
        ascii_field(_TAG_MAKE, make)
    if model:
        ascii_field(_TAG_MODEL, model)
    if orientation:
        add(_TAG_ORIENT, 3, 1, struct.pack(">HH", orientation, 0))
    if software:
        ascii_field(_TAG_SOFTWARE, software)
    if datetime_str:
        ascii_field(_TAG_DATETIME, datetime_str)
    gps_ifd = b""
    if gps is not None:
        entries.append((_TAG_GPS_IFD, 4, 1, None, "GPS"))

    # layout: header(8) + IFD0 + value blobs + GPS IFD (+ its blobs)
    n0 = len(entries)
    ifd0_size = 2 + 12 * n0 + 4
    blob_base = 8 + ifd0_size
    gps_base = blob_base + len(blobs)

    if gps is not None:
        lat, lon = gps

        def dms(v):
            v = abs(v)
            d = int(v)
            m = int((v - d) * 60)
            s = round(((v - d) * 60 - m) * 60 * 10000)
            return struct.pack(
                ">IIIIII", d, 1, m, 1, s, 10000
            )

        gps_entries = []
        gblobs = bytearray()
        g_n = 4
        g_ifd_size = 2 + 12 * g_n + 4
        g_blob_base = gps_base + g_ifd_size

        def gadd(tag, typ, cnt, val4=None, blob=None):
            if blob is not None:
                gps_entries.append(
                    (tag, typ, cnt,
                     struct.pack(">I", g_blob_base + len(gblobs)))
                )
                gblobs.extend(blob)
            else:
                gps_entries.append((tag, typ, cnt, val4))

        gadd(_GPS_LAT_REF, 2, 2,
             (b"S" if lat < 0 else b"N") + b"\x00\x00\x00")
        gadd(_GPS_LAT, 5, 3, blob=dms(lat))
        gadd(_GPS_LON_REF, 2, 2,
             (b"W" if lon < 0 else b"E") + b"\x00\x00\x00")
        gadd(_GPS_LON, 5, 3, blob=dms(lon))
        gps_ifd = struct.pack(">H", g_n)
        for tag, typ, cnt, val4 in sorted(gps_entries):
            gps_ifd += struct.pack(">HHI", tag, typ, cnt) + val4
        gps_ifd += b"\x00\x00\x00\x00" + bytes(gblobs)

    ifd0 = struct.pack(">H", n0)
    for tag, typ, cnt, val4, blob_off in sorted(entries):
        ifd0 += struct.pack(">HHI", tag, typ, cnt)
        if blob_off == "GPS":
            ifd0 += struct.pack(">I", gps_base)
        elif blob_off is not None:
            ifd0 += struct.pack(">I", blob_base + blob_off)
        else:
            ifd0 += val4
    ifd0 += b"\x00\x00\x00\x00"  # no next IFD

    tiff = b"MM" + struct.pack(">HI", 42, 8) + ifd0 + bytes(blobs) + gps_ifd
    body = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body


# ------------------------------------------------------------ Spark tier


def exif_stats(df: DataFrame) -> DataFrame:
    """(media_id, make, model, datetime, orientation, software,
    has_gps, gps_lat, gps_lon) for JPEG rows carrying EXIF —
    map-side, bytes never decoded."""
    out_schema = (
        "media_id long, make string, model string, datetime string, "
        "orientation int, software string, has_gps boolean, "
        "gps_lat double, gps_lon double"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "image":
                    continue
                meta = parse_exif(bytes(payload))
                if meta is None:
                    continue
                rows.append((
                    int(mid), meta["make"], meta["model"],
                    meta["datetime"], meta["orientation"],
                    meta["software"], meta["has_gps"],
                    meta["gps_lat"], meta["gps_lon"],
                ))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "make", "model", "datetime",
                         "orientation", "software", "has_gps",
                         "gps_lat", "gps_lon"],
            )

    from .parallel import kernel_map

    return kernel_map(
        df, batches, out_schema, cols=("media_id", "kind", "payload")
    )


def scrub_gps(df: DataFrame) -> DataFrame:
    """The input media table with every JPEG's GPS EXIF removed —
    the image-PII scrub pass (pixels untouched; rows without GPS pass
    through byte-identical)."""
    schema = df.schema

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf.copy()
            pdf["payload"] = [
                bytearray(strip_gps(bytes(p))) if k == "image" else p
                for k, p in zip(pdf["kind"], pdf["payload"])
            ]
            yield pdf

    from .parallel import kernel_map

    return kernel_map(df, batches, schema)
