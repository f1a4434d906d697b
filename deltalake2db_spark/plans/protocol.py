"""Delta reader-protocol feature gate.

Reference parity: ``deltalake2db/protocol_check.py:7-44``, with one
deliberate fix: the reference accepts any ``minReaderVersion <= 3``
outright, but PROTOCOL.md defines reader version 3 as *exactly* the
version that introduces ``readerFeatures`` — deletionVectors tables
advertise ``minReaderVersion=3, readerFeatures=['deletionVectors']``,
and skipping the check there would silently resurface deleted rows.
We only bypass for ``<= 2`` and validate ``readerFeatures`` from 3 up
(notably unsupported: ``deletionVectors``, ``v2Checkpoint``).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from .meta import MetaState

SUPPORTED_READER_FEATURES: frozenset[str] = frozenset(
    {
        "columnMapping",
        "timestampNtz",
        "typeWidening",
        "vacuumProtocolCheck",
        # full read support (plans/deletion_vectors.py + the scan's
        # row_index anti-join) — a capability the reference rejects
        "deletionVectors",
        # UUID-named manifests + sidecar files (plans/meta.py
        # _apply_checkpoint) — also beyond the reference
        "v2Checkpoint",
    }
)


class DeltaProtocolError(Exception):
    """Raised when a table requires reader features we do not implement."""


def unsupported_features(state: "MetaState") -> list[str]:
    protocol = state.protocol
    if protocol is None:
        raise DeltaProtocolError("table has no protocol action")
    if protocol.get("minReaderVersion", 1) <= 2:
        return []
    features = protocol.get("readerFeatures") or []
    return [f for f in features if f not in SUPPORTED_READER_FEATURES]


def is_protocol_supported(state: "MetaState") -> bool:
    return not unsupported_features(state)


def check_is_supported(state: "MetaState") -> None:
    bad = unsupported_features(state)
    if bad:
        raise DeltaProtocolError(
            "Delta table requires unsupported reader features: " + ", ".join(sorted(bad))
        )
