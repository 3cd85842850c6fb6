"""Persisted-error journal (SURVEY §2.10 T6).

The reference records persistence failures as one JSON file per error
at `<db_dir>/error/<timestamp_nano>.list` (path format
`storage/api/mod.rs:126-128`) with fields
`{time, metrics, error_type (serde-tagged), block_timestamp, detail}`
(`storage/persisted_error/mod.rs:22-52`). It is written when the
post-write cloud upload fails (`storage/api/write.rs:96-107`) — the
local block stayed durable, the journal tells an operator which blocks
never reached the object store so the upload can be replayed.

The rebuild keeps the same shape and the same role: the journal is for
failures that happen AFTER data is locally durable but before the
warehouse is fully consistent (manifest update, rollup refresh, cloud
metadata PUT). Plain Spark task failures don't belong here — Spark's
own retry + event log covers those.

Journal writes must never mask the original failure, so `journal()`
swallows its own IO errors (the reference logs-and-continues the same
way at write.rs:97).
"""

from __future__ import annotations

from dataclasses import asdict, dataclass

from ..datetime_util import now_utc_nanos
from . import fsio

# reference PersistedErrorType (persisted_error/mod.rs:24-26) plus the
# rebuild's own post-durability failure points
FAILED_TO_UPLOAD = "FailedToUploadBlockOrBLockList"
FAILED_TO_UPDATE_BLOCK_LIST = "FailedToUpdateBlockList"
FAILED_TO_REFRESH_ROLLUP = "FailedToRefreshRollup"


@dataclass(frozen=True)
class PersistedError:
    """persisted_error/mod.rs:29-36, field-for-field."""

    time_nanos: int
    metrics: str | None
    error_type: str
    since_sec: int | None  # block_timestamp.since_sec
    until_sec: int | None  # block_timestamp.until_sec
    detail: str | None


def error_dir(db_dir: str) -> str:
    return fsio.join(db_dir, "error")


def error_file_path(db_dir: str, time_nanos: int) -> str:
    """`<db_dir>/error/<timestamp_nano>.list` — api/mod.rs:126-128."""
    return fsio.join(error_dir(db_dir), f"{time_nanos}.list")


def write_persisted_error(db_dir: str, err: PersistedError) -> str:
    path = error_file_path(db_dir, err.time_nanos)
    fsio.write_json_atomic(path, asdict(err))
    return path


def journal(
    db_dir: str,
    metrics: str | None,
    error_type: str,
    since_sec: int | None = None,
    until_sec: int | None = None,
    detail: str | None = None,
) -> PersistedError | None:
    """Best-effort journal write; never raises (the caller is already
    handling the real failure)."""
    err = PersistedError(
        time_nanos=now_utc_nanos(),
        metrics=metrics,
        error_type=error_type,
        since_sec=since_sec,
        until_sec=until_sec,
        detail=detail,
    )
    try:
        write_persisted_error(db_dir, err)
        return err
    except OSError:
        return None


def list_persisted_errors(db_dir: str) -> list[PersistedError]:
    """All journaled errors, oldest first (file name = time_nanos)."""
    d = error_dir(db_dir)
    names = fsio.list_suffix_names(d, ".list")
    out = []
    for name in sorted(names, key=int):
        doc = fsio.read_json(fsio.join(d, f"{name}.list"))
        out.append(PersistedError(**doc))
    return out


def clear_persisted_errors(db_dir: str, before_nanos: int | None = None) -> int:
    """Drop journal entries (all, or strictly older than a bound) after
    the operator has replayed/acknowledged them. Returns count removed."""
    d = error_dir(db_dir)
    removed = 0
    for name in fsio.list_suffix_names(d, ".list"):
        if before_nanos is not None and int(name) >= before_nanos:
            continue
        fsio.delete(fsio.join(d, f"{name}.list"))
        removed += 1
    return removed
