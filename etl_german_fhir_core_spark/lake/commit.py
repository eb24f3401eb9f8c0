"""Pluggable snapshot-commit protocol.

A SnapshotTable commit is the publication of one immutable manifest file at a
deterministic path (snapshot-<n>.json). Correctness needs exactly one primitive:

    PUT-IF-ABSENT(path, payload) — publish payload at path iff nothing exists
    there; two racers for the same path must see exactly one winner.

On POSIX filesystems that primitive is ``os.link`` (exclusive hard-link of a
fsynced temp file — rename() would silently clobber a racer). On an object
store the SAME protocol is a conditional write / compare-and-swap:

- S3: ``PutObject`` with ``If-None-Match: *`` (or a DynamoDB lock table on
  older deployments — the Iceberg/Delta commit-service pattern),
- GCS: ``x-goog-if-generation-match: 0``,
- ABFS: ``If-None-Match: *``.

Everything above the committer (staging files first, manifest references them,
readers resolve the highest snapshot) is store-agnostic, so swapping
PosixCommitter for an object-store implementation changes no table logic.
"""

from __future__ import annotations

import os
import uuid


class CommitConflict(FileExistsError):
    """Another writer already published this snapshot id (optimistic-concurrency
    loss — the caller should re-read the manifest and retry on top)."""


class PosixCommitter:
    """PUT-IF-ABSENT via exclusive hard-link creation — atomic on POSIX local/NFS
    filesystems (link(2) fails with EEXIST; rename(2) would clobber)."""

    def commit(self, path: str, payload: bytes) -> None:
        tmp = path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "wb") as fh:
            fh.write(payload)
            fh.flush()
            os.fsync(fh.fileno())
        try:
            os.link(tmp, path)
        except FileExistsError as e:
            raise CommitConflict(
                f"snapshot already committed by a concurrent writer: {path}"
            ) from e
        finally:
            os.unlink(tmp)
