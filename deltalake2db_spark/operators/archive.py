"""Archive ingestion — zip / tar(.gz/.bz2/.xz) members as rows.

Source-code corpora arrive as archives (GitHub tarballs, zipped
repos, Kaggle dumps) the same way crawls arrive as WARCs — so this is
the code-pipeline sibling of ``operators/warc.py``: stdlib-only
parsing (``zipfile`` / ``tarfile`` over in-memory payloads), executed
map-side with ``mapInPandas`` so archive bytes never cross a shuffle
and ingestion distributes with the scan.  One output row per member:
path, size, the content bytes, and the UTF-8 text when it decodes
(text files flow straight into the curation screens in
``operators/code.py`` / ``text.py``).

Zip-bomb hygiene (untrusted input, same guard class as the media
container parsers): member count, per-member inflated size, and total
inflated bytes are all capped BEFORE allocation; members over the cap
are skipped fail-open, a poisoned archive never OOMs an executor.

``encode_zip`` / ``encode_tar`` are the fixture/gate writers.

Reference scope: no ingestion tier in the reference engine
(SURVEY.md §2.5); north-star extension.
"""

from __future__ import annotations

import io
import tarfile
import zipfile
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame

_MAX_MEMBERS = 100_000
_MAX_MEMBER_BYTES = 64 << 20        # 64 MiB per member
_MAX_TOTAL_BYTES = 1 << 30          # 1 GiB inflated per archive


def sniff_archive(payload: bytes) -> Optional[str]:
    """'zip' | 'tar' | 'tgz' | 'tbz2' | 'txz' | None by magic."""
    if payload is None or len(payload) < 4:
        return None
    if payload[:4] in (b"PK\x03\x04", b"PK\x05\x06", b"PK\x06\x06"):
        return "zip"
    if payload[:2] == b"\x1f\x8b":
        return "tgz"
    if payload[:3] == b"BZh":
        return "tbz2"
    if payload[:6] == b"\xfd7zXZ\x00":
        return "txz"
    if len(payload) > 262 and payload[257:262] == b"ustar":
        return "tar"
    return None


def _zip_members(
    payload: bytes,
    max_member: int = _MAX_MEMBER_BYTES,
    max_total: int = _MAX_TOTAL_BYTES,
    with_truncated: bool = False,
):
    truncated = False

    def _ret(v):
        return (v, truncated) if with_truncated else v

    try:
        zf = zipfile.ZipFile(io.BytesIO(payload))
    except (zipfile.BadZipFile, NotImplementedError, ValueError,
            OSError):
        return _ret(None)
    out = []
    total = 0
    with zf:
        infos = zf.infolist()
        if len(infos) > _MAX_MEMBERS:
            truncated = True  # member-count cap drops the tail
        for info in infos[:_MAX_MEMBERS]:
            if info.is_dir():
                continue
            if info.file_size > max_member:
                truncated = True
                continue  # fail-open: skip the oversized member
            if total + info.file_size > max_total:
                truncated = True
                break
            try:
                with zf.open(info) as fh:
                    data = fh.read(max_member + 1)
            except (zipfile.BadZipFile, NotImplementedError,
                    ValueError, OSError, EOFError):
                continue
            if len(data) > max_member:  # header lied about the size
                truncated = True
                continue
            # Charge the total budget with the ACTUAL inflated bytes,
            # not the untrusted header's file_size: a zip whose
            # entries all declare tiny sizes must not bypass the cap.
            total += len(data)
            if total > max_total:
                truncated = True
                break
            out.append((info.filename, data))
    return _ret(out)


def _tar_members(
    payload: bytes,
    max_member: int = _MAX_MEMBER_BYTES,
    max_total: int = _MAX_TOTAL_BYTES,
    with_truncated: bool = False,
):
    import zlib

    truncated = False

    def _ret(v):
        return (v, truncated) if with_truncated else v

    try:
        tf = tarfile.open(fileobj=io.BytesIO(payload), mode="r:*")
    except (tarfile.TarError, ValueError, OSError, EOFError,
            zlib.error):
        return _ret(None)
    out = []
    total = 0
    with tf:
        try:
            for info in tf:
                if len(out) >= _MAX_MEMBERS:
                    truncated = True
                    break
                if not info.isfile():
                    continue
                if info.size > max_member:
                    truncated = True
                    continue
                total += info.size
                if total > max_total:
                    truncated = True
                    break
                fh = tf.extractfile(info)
                if fh is None:
                    continue
                data = fh.read(max_member + 1)
                if len(data) > max_member:
                    truncated = True
                    continue
                out.append((info.name, data))
        except (tarfile.TarError, ValueError, OSError, EOFError,
                zlib.error):
            return _ret(out or None)
    return _ret(out)


def archive_member_list(
    payload: bytes, with_truncated: bool = False
):
    """[(path, content_bytes)] for any supported archive, or None
    when the payload is not a parseable archive.

    ``with_truncated=True`` returns ``(members, truncated)`` where
    ``truncated`` reports whether any zip-bomb budget (member size,
    total inflated bytes, member count) dropped content — the audit
    flag ``archive_members`` surfaces per row so a pipeline can count
    what the budgets rejected instead of mistaking a clipped archive
    for a complete one."""
    def _ret(v, t=False):
        return (v, t) if with_truncated else v

    kind = sniff_archive(bytes(payload)) if payload is not None else None
    if kind is None:
        return _ret(None)
    if kind == "zip":
        m, t = _zip_members(bytes(payload), with_truncated=True)
        return _ret(m, t)
    m, t = _tar_members(bytes(payload), with_truncated=True)
    if m is not None:
        return _ret(m, t)
    if kind == "tgz":
        # a bare gzip that is not a tar: surface the single member.
        # BUDGETED inflate (decompressobj with a bounded request, the
        # same discipline as warc._gunzip_members) — plain
        # gzip.decompress would materialize a whole bomb before the
        # size check ran.
        import zlib

        d = zlib.decompressobj(wbits=31)
        try:
            data = d.decompress(bytes(payload), _MAX_MEMBER_BYTES + 1)
        except zlib.error:
            return _ret(None)
        if len(data) > _MAX_MEMBER_BYTES or d.unconsumed_tail:
            return _ret(None, True)  # budget-rejected, not malformed
        return _ret([("", data)])
    return _ret(None)


def encode_zip(members: list) -> bytes:
    """Fixture writer: ``members`` is ``[(path, bytes)]``."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for path, data in members:
            zi = zipfile.ZipInfo(path, date_time=(2024, 1, 1, 0, 0, 0))
            zf.writestr(zi, data)
    return buf.getvalue()


def encode_tar(members: list, gz: bool = True) -> bytes:
    """Fixture writer: ``members`` is ``[(path, bytes)]``."""
    buf = io.BytesIO()
    with tarfile.open(
        fileobj=buf, mode="w:gz" if gz else "w"
    ) as tf:
        for path, data in members:
            info = tarfile.TarInfo(path)
            info.size = len(data)
            info.mtime = 1704067200  # 2024-01-01, deterministic
            tf.addfile(info, io.BytesIO(data))
    return buf.getvalue()


def archive_members(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    max_member_bytes: int = _MAX_MEMBER_BYTES,
) -> DataFrame:
    """(id, member_idx, path, n_bytes, text, truncated) — one row per
    file member of every parseable archive payload, extracted map-side
    (``mapInPandas``): archive bytes never cross a shuffle.  ``text``
    is the UTF-8 decode when the member is valid UTF-8, else NULL
    (binary members keep their size but don't ship bytes onward —
    select the raw member via a second pass when needed).
    Unparseable payloads are skipped fail-open.  ``truncated`` is True
    on every row of an archive whose zip-bomb budgets dropped content
    (oversized member, total-bytes cap, member-count cap) — surviving
    members still ingest, but the clip is countable, never silent."""
    out_schema = (
        f"{id_col} long, member_idx int, path string, n_bytes long, "
        "text string, truncated boolean"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                members, trunc = archive_member_list(
                    bytes(payload), with_truncated=True
                )
                if members is None:
                    continue
                # per-payload flag: resolve the caller-level member
                # cap BEFORE emitting so every row of the payload
                # carries the same audit value
                trunc = trunc or any(
                    len(data) > max_member_bytes for _, data in members
                )
                for j, (path, data) in enumerate(members):
                    if len(data) > max_member_bytes:
                        continue
                    try:
                        text = data.decode("utf-8")
                    except UnicodeDecodeError:
                        text = None
                    rows.append(
                        (int(rid), j, path, len(data), text, trunc)
                    )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "member_idx", "path", "n_bytes",
                         "text", "truncated"],
            )

    from .parallel import kernel_map

    return kernel_map(df, batches, out_schema, cols=(id_col, payload_col))
