"""Minimal Azure Blob Storage REST emulator over a local directory
(test-only) — the Azurite role in the reference's test server
(``/root/reference/test_server/__init__.py``), rebuilt on stdlib
``http.server`` because this sandbox has no Azurite/npm.

Implements the READ subset of the public Blob service protocol that the
Azure C++ SDK inside ``pyarrow.fs.AzureFileSystem`` issues (observed by
pointing the SDK at a logging stub):

- ``HEAD /{acct}/{container}/{path}?action=getAccessControl`` — the
  DFS-endpoint HNS probe; answered 400 so the SDK treats the account
  as flat-namespace (Azurite does the same).
- ``GET /{acct}/{container}?restype=container&comp=list`` — List Blobs
  (hierarchy when ``delimiter=/``): XML ``EnumerationResults`` with
  ``Blob``/``BlobPrefix`` entries, honoring ``prefix`` + ``maxresults``.
- ``HEAD /{acct}/{container}/{blob}`` — Get Blob Properties.
- ``GET /{acct}/{container}/{blob}`` with optional ``Range`` — Download
  Blob (200 full / 206 partial).

Blobs are the files under ``root/{container}/...``.  Authorization
headers are accepted without verification (emulator semantics — the
SDK still SIGNS every request with the well-known Azurite key, so the
client-side SharedKey code path runs for real).
"""

from __future__ import annotations

import email.utils
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, unquote, urlparse
from xml.sax.saxutils import escape

# the documented Azurite well-known devstore credentials
ACCOUNT = "devstoreaccount1"
KEY = (
    "Eby8vdM02xNOcqFlqUwJPLlmEtlCDXJ1OUzFT50uSRZ6IFsuFq2UVErCz4I6tq"
    "/K1SZFPTOtr/KBHBeksoGMGw=="
)


def _httpdate(ts: float) -> str:
    return email.utils.formatdate(ts, usegmt=True)


class _Handler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"
    root = "."  # overridden per-server

    def log_message(self, fmt, *args):  # quiet
        pass

    # -- helpers ------------------------------------------------------
    def _split(self):
        """(container, blob_path, query) from /{acct}/{container}/..."""
        up = urlparse(self.path)
        parts = unquote(up.path).lstrip("/").split("/", 2)
        if not parts or parts[0] != ACCOUNT:
            return None, None, parse_qs(up.query)
        container = parts[1] if len(parts) > 1 else ""
        blob = parts[2] if len(parts) > 2 else ""
        return container, blob, parse_qs(up.query)

    def _send(
        self,
        code: int,
        body: bytes = b"",
        headers: dict | None = None,
        content_length: int | None = None,
    ):
        self.send_response(code)
        for k, v in (headers or {}).items():
            self.send_header(k, v)
        self.send_header("x-ms-version", "2022-11-02")
        self.send_header(
            "Content-Length",
            str(len(body) if content_length is None else content_length),
        )
        self.end_headers()
        if body and self.command != "HEAD":
            self.wfile.write(body)

    def _blob_headers(self, fn: str) -> dict:
        st = os.stat(fn)
        # the C++ SDK's BlobProperties parser hard-requires several
        # x-ms-* headers (map::at abort when absent) — emit the same
        # set Azurite does
        return {
            "Content-Type": "application/octet-stream",
            "Last-Modified": _httpdate(st.st_mtime),
            "ETag": f'"0x{st.st_ino:X}{st.st_size:X}"',
            "x-ms-blob-type": "BlockBlob",
            "x-ms-creation-time": _httpdate(st.st_mtime),
            "x-ms-lease-status": "unlocked",
            "x-ms-lease-state": "available",
            "x-ms-server-encrypted": "true",
            "Accept-Ranges": "bytes",
        }

    def _list_blobs(self, container: str, q: dict):
        cdir = os.path.join(self.root, container)
        if not os.path.isdir(cdir):
            self._send(404)
            return
        prefix = q.get("prefix", [""])[0]
        delimiter = q.get("delimiter", [""])[0]
        maxresults = int(q.get("maxresults", ["5000"])[0])
        names: list[str] = []
        for dirpath, _dirs, files in os.walk(cdir):
            for f in files:
                rel = os.path.relpath(os.path.join(dirpath, f), cdir)
                rel = rel.replace(os.sep, "/")
                if rel.startswith(prefix):
                    names.append(rel)
        names.sort()
        blobs: list[str] = []
        prefixes: list[str] = []
        for n in names:
            if delimiter:
                tail = n[len(prefix):]
                if delimiter in tail:
                    p = prefix + tail.split(delimiter, 1)[0] + delimiter
                    if p not in prefixes:
                        prefixes.append(p)
                    continue
            blobs.append(n)
        items: list[str] = []
        shown = 0
        for n in sorted(blobs + prefixes):
            if shown >= maxresults:
                break
            shown += 1
            if n in prefixes:
                items.append(f"<BlobPrefix><Name>{escape(n)}</Name></BlobPrefix>")
            else:
                st = os.stat(os.path.join(cdir, n))
                items.append(
                    "<Blob><Name>{}</Name><Properties>"
                    "<Creation-Time>{}</Creation-Time>"
                    "<Last-Modified>{}</Last-Modified>"
                    "<Etag>0x1</Etag>"
                    "<Content-Length>{}</Content-Length>"
                    "<Content-Type>application/octet-stream</Content-Type>"
                    "<BlobType>BlockBlob</BlobType>"
                    "</Properties></Blob>".format(
                        escape(n), _httpdate(st.st_mtime),
                        _httpdate(st.st_mtime), st.st_size,
                    )
                )
        body = (
            '<?xml version="1.0" encoding="utf-8"?>'
            '<EnumerationResults ServiceEndpoint="http://{host}/{acct}" '
            'ContainerName="{c}">'
            "<Prefix>{p}</Prefix><Delimiter>{d}</Delimiter>"
            "<Blobs>{items}</Blobs><NextMarker/></EnumerationResults>"
        ).format(
            host=self.headers.get("host", ""), acct=ACCOUNT, c=escape(container),
            p=escape(prefix), d=escape(delimiter), items="".join(items),
        ).encode()
        self._send(200, body, {"Content-Type": "application/xml"})

    # -- verbs --------------------------------------------------------
    def do_HEAD(self):
        container, blob, q = self._split()
        if container is None:
            self._send(404)
            return
        if "action" in q:  # DFS getAccessControl HNS probe
            self._send(400)
            return
        fn = os.path.join(self.root, container, blob)
        if blob and os.path.isfile(fn):
            # Get Blob Properties: Content-Length is the blob size
            self._send(
                200, b"", self._blob_headers(fn),
                content_length=os.path.getsize(fn),
            )
            return
        self._send(404)

    def do_GET(self):
        container, blob, q = self._split()
        if container is None:
            self._send(404)
            return
        if q.get("restype") == ["container"] and q.get("comp") == ["list"]:
            self._list_blobs(container, q)
            return
        fn = os.path.join(self.root, container, blob)
        if not (blob and os.path.isfile(fn)):
            self._send(404)
            return
        size = os.path.getsize(fn)
        # the Azure SDK sends x-ms-range; plain HTTP clients send Range
        rng = self.headers.get("x-ms-range") or self.headers.get("Range")
        with open(fn, "rb") as fh:
            if rng and rng.startswith("bytes="):
                lo_s, _, hi_s = rng[len("bytes="):].partition("-")
                if lo_s == "":  # suffix form bytes=-N (parquet footers)
                    lo = max(0, size - int(hi_s))
                    hi = size - 1
                else:
                    lo = int(lo_s)
                    hi = min(int(hi_s), size - 1) if hi_s else size - 1
                fh.seek(lo)
                data = fh.read(hi - lo + 1)
                self._send(
                    206, data,
                    {**self._blob_headers(fn),
                     "Content-Range": f"bytes {lo}-{hi}/{size}"},
                )
            else:
                self._send(200, fh.read(), self._blob_headers(fn))


def start_server(root: str) -> tuple[str, ThreadingHTTPServer]:
    """Serve ``root`` as the account's containers; returns
    ("127.0.0.1:port", server)."""
    handler = type("_H", (_Handler,), {"root": root})
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return f"127.0.0.1:{srv.server_address[1]}", srv
