"""Pluggable put-if-absent COMMIT-SLOT backends — the LogStore seam.

Both table-format modules (delta_lite, iceberg_lite) commit a version
by atomically creating the next log/metadata file if and only if it
does not already exist.  On a POSIX filesystem that primitive is
``open(..., O_CREAT | O_EXCL)``; on S3-family object stores it does
not exist — a bare PUT is last-writer-wins, so two writers racing the
same slot would both "succeed" and one commit would be silently lost.
delta-spark solves this with its LogStore abstraction (HDFSLogStore's
atomic rename, S3DynamoDBLogStore's external claim table); Iceberg
solves it with the catalog's compare-and-swap.  This module is that
seam for the lite implementations:

* :class:`PosixCommitSlots` — the default; O_EXCL on the local
  filesystem, correct wherever POSIX create-exclusive is (local disk,
  NFS, HDFS mounts).
* :class:`CoordinatedCommitSlots` — put-if-absent decided by an
  EXTERNAL claim table (any dict-like with ``setdefault`` semantics;
  a DynamoDB conditional put in production, a plain dict or a
  multiprocessing.Manager().dict() in tests), then the payload is
  written with a plain non-exclusive write — the exact
  S3DynamoDBLogStore shape: the store never needs O_EXCL because the
  claim table is the serialization point.

Both back ends implement one method, so a cloud deployment swaps the
backend without touching any verb:

    table = DeltaLiteTable(path, commit_backend=CoordinatedCommitSlots(claims))
"""

from __future__ import annotations

import os
from typing import MutableMapping, Protocol

__all__ = [
    "CommitSlots",
    "PosixCommitSlots",
    "CoordinatedCommitSlots",
]


class CommitSlots(Protocol):
    """put_if_absent(path, payload) -> True if THIS call created the
    slot, False if the slot was already taken.  Implementations must
    guarantee that at most one concurrent caller per path sees True —
    that single guarantee is the entire optimistic-concurrency story
    of both log formats."""

    def put_if_absent(
        self, path: str, payload: bytes
    ) -> bool:  # pragma: no cover - protocol
        ...


class PosixCommitSlots:
    """The default: O_CREAT|O_EXCL create-exclusive.  Atomic on POSIX
    filesystems; NOT correct on S3-family object stores (no
    compare-and-set PUT) — see the module docstring."""

    def put_if_absent(self, path: str, payload: bytes) -> bool:
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        with os.fdopen(fd, "wb") as fh:
            fh.write(payload)
        return True


class CoordinatedCommitSlots:
    """put-if-absent decided by an external claim table (the
    S3DynamoDBLogStore shape).  ``claims`` is any mapping whose
    ``setdefault`` is atomic for the deployment's concurrency model —
    a DynamoDB conditional put in production; a plain dict
    (thread-safe under the GIL) or a managed dict in tests.  The
    winner writes the payload with a PLAIN write: the claim table, not
    the filesystem, is the serialization point, which is exactly why
    this shape survives object stores."""

    def __init__(self, claims: MutableMapping[str, str]):
        self._claims = claims

    def put_if_absent(self, path: str, payload: bytes) -> bool:
        import uuid

        key = os.path.abspath(path)
        # one token per CALL: two racers through the same handle must
        # still resolve to a single winner
        token = f"pid:{os.getpid()}:call:{uuid.uuid4().hex}"
        won = self._claims.setdefault(key, token) == token
        if not won:
            return False  # claimed by another writer
        with open(path, "wb") as fh:  # plain PUT; claim already won
            fh.write(payload)
        return True
