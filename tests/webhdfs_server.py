"""Minimal WebHDFS REST server over the local filesystem (test-only).

Implements the read-side subset of the public WebHDFS protocol
(GETFILESTATUS / LISTSTATUS / OPEN with offset+length / GETSERVERDEFAULTS)
so Spark's built-in ``webhdfs://`` Hadoop filesystem can read real
parquet bytes over HTTP from the test process — an end-to-end data read
across a non-``file://`` scheme with no external services.  Mirrors the
role of the reference's Azurite-backed test server
(``/root/reference/test_server/__init__.py``) with a protocol the
stock Spark classpath already speaks.
"""

from __future__ import annotations

import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

PREFIX = "/webhdfs/v1"


def _file_status(path: str, suffix: str = "") -> dict:
    st = os.stat(path)
    is_dir = os.path.isdir(path)
    return {
        "accessTime": int(st.st_atime * 1000),
        "blockSize": 128 << 20,
        "childrenNum": len(os.listdir(path)) if is_dir else 0,
        "fileId": st.st_ino,
        "group": "supergroup",
        "length": 0 if is_dir else st.st_size,
        "modificationTime": int(st.st_mtime * 1000),
        "owner": "test",
        "pathSuffix": suffix,
        "permission": "755" if is_dir else "644",
        "replication": 0 if is_dir else 1,
        "storagePolicy": 0,
        "type": "DIRECTORY" if is_dir else "FILE",
    }


class _Handler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"

    def log_message(self, fmt, *args):  # quiet
        pass

    def _json(self, code: int, payload: dict):
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _not_found(self, path: str):
        self._json(
            404,
            {
                "RemoteException": {
                    "exception": "FileNotFoundException",
                    "javaClassName": "java.io.FileNotFoundException",
                    "message": f"File does not exist: {path}",
                }
            },
        )

    def do_GET(self):  # noqa: N802 (http.server API)
        u = urlparse(self.path)
        if not u.path.startswith(PREFIX):
            self._json(400, {"RemoteException": {"message": "bad prefix"}})
            return
        fs_path = u.path[len(PREFIX):] or "/"
        q = parse_qs(u.query)
        op = (q.get("op") or [""])[0].upper()

        if op == "GETSERVERDEFAULTS":
            self._json(
                200,
                {
                    "FileSystemServerDefaults": {
                        "blockSize": 128 << 20,
                        "bytesPerChecksum": 512,
                        "writePacketSize": 65536,
                        "replication": 1,
                        "fileBufferSize": 4096,
                        "encryptDataTransfer": False,
                        "trashInterval": 0,
                        "keyProviderUri": "",
                        "defaultStoragePolicyId": 7,
                    }
                },
            )
            return
        if not os.path.exists(fs_path):
            self._not_found(fs_path)
            return
        if op == "GETFILESTATUS":
            self._json(200, {"FileStatus": _file_status(fs_path)})
        elif op == "GETFILEBLOCKLOCATIONS":
            size = os.path.getsize(fs_path)
            self._json(
                200,
                {
                    "BlockLocations": {
                        "BlockLocation": [
                            {
                                "cachedHosts": [],
                                "corrupt": False,
                                "hosts": ["localhost"],
                                "length": size,
                                "names": ["127.0.0.1:50010"],
                                "offset": 0,
                                "storageTypes": ["DISK"],
                                "topologyPaths": ["/default-rack/127.0.0.1:50010"],
                            }
                        ]
                    }
                },
            )
        elif op == "LISTSTATUS":
            if os.path.isdir(fs_path):
                entries = [
                    _file_status(os.path.join(fs_path, n), suffix=n)
                    for n in sorted(os.listdir(fs_path))
                ]
            else:
                # LISTSTATUS of a file = one entry, empty pathSuffix
                entries = [_file_status(fs_path)]
            self._json(200, {"FileStatuses": {"FileStatus": entries}})
        elif op == "OPEN":
            if "redirected" not in q:
                # namenode step: self-redirect to the "datanode" (us)
                sep = "&" if u.query else ""
                loc = (
                    f"http://{self.headers['Host']}{u.path}?"
                    f"{u.query}{sep}redirected=true"
                )
                self.send_response(307)
                self.send_header("Location", loc)
                self.send_header("Content-Length", "0")
                self.end_headers()
                return
            offset = int((q.get("offset") or ["0"])[0])
            size = os.path.getsize(fs_path)
            length = int((q.get("length") or [str(size - offset)])[0])
            length = max(0, min(length, size - offset))
            with open(fs_path, "rb") as fh:
                fh.seek(offset)
                data = fh.read(length)
            self.send_response(200)
            self.send_header("Content-Type", "application/octet-stream")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)
        else:
            self._json(
                400,
                {
                    "RemoteException": {
                        "exception": "UnsupportedOperationException",
                        "message": f"op {op} not implemented",
                    }
                },
            )


def start_server() -> tuple[ThreadingHTTPServer, str]:
    """Start on an ephemeral port; return (server, 'host:port')."""
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    host, port = srv.server_address
    return srv, f"{host}:{port}"
