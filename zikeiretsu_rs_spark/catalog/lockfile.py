"""Per-metrics writer lockfile (SURVEY §2.10 T5).

The reference serializes multi-process writers per metrics with a
lockfile at `<db_dir>/<metrics>.lock` (path format
`storage/api/mod.rs:114-115`): `Lockfile::create` (create-new
semantics) acquires it and the writer's UUID is written into the file
(`storage/api/write.rs:191-202`); the lock is removed when the write
finishes. A crashed writer leaves the file behind, and
`remove_local_lock_file_if_same_writer` (`storage/api/write.rs:142-167`)
deletes it only when the file's content matches the caller's writer id,
so one writer can never break another's live lock. The cloud analog
(`CloudLockfilePath`, `storage/api/write.rs:33-41`) is a
check-then-create object marker with the same content rule.

Spark-first position: a single Spark driver already serializes persists
per metrics (one manifest read-modify-write at a time), so this lock
exists for the same reason the reference's does — multiple independent
*processes* sharing one warehouse directory. It guards the
metadata read-modify-write (manifest + block append), not the
distributed executor work, which is append-only and safe.

Local paths get true O_CREAT|O_EXCL atomicity. Object-store URIs get
the reference's own cloud semantics (exists-then-put, best-effort —
identical race window to `CloudLockfilePath`).
"""

from __future__ import annotations

import os
import time
import uuid
from contextlib import contextmanager

from ..errors import StorageError
from . import fsio


class AcquireLockError(StorageError):
    """Lockfile already held (reference: StorageApiError::AcquireLockError)."""


def lockfile_path(db_dir: str, metrics: str) -> str:
    """`<db_dir>/<metrics>.lock` — storage/api/mod.rs:114-115."""
    return fsio.join(db_dir, f"{metrics}.lock")


def new_writer_id() -> str:
    """Writers identify themselves by UUID (write.rs:22 `writer_id: &Uuid`)."""
    return str(uuid.uuid4())


def _read_holder(path: str) -> str:
    try:
        if fsio.is_uri(path):
            doc = fsio.read_json(path)
            return str(doc.get("writer_id", ""))
        with open(path) as f:
            return f.read().strip()
    except (OSError, ValueError):
        return ""


def _try_create(path: str, writer_id: str) -> bool:
    if fsio.is_uri(path):
        # reference cloud lock: exists check then create (write.rs:33-41)
        if fsio.exists(path):
            return False
        fsio.write_json_atomic(path, {"writer_id": writer_id})
        return True
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    try:
        fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        return False
    with os.fdopen(fd, "w") as f:
        f.write(writer_id)
    return True


def _remove(path: str) -> None:
    fsio.delete(path)


@contextmanager
def metrics_lock(
    db_dir: str,
    metrics: str,
    writer_id: str,
    timeout_sec: float = 0.0,
    poll_sec: float = 0.05,
):
    """Acquire `<db_dir>/<metrics>.lock` for the duration of the block.

    `timeout_sec=0` fails fast like the reference (`Lockfile::create`
    errors immediately when the file exists); a positive timeout polls,
    which is the practical multi-writer mode for schedulable jobs like
    compaction racing ingest.
    """
    path = lockfile_path(db_dir, metrics)
    deadline = time.monotonic() + timeout_sec
    while not _try_create(path, writer_id):
        if time.monotonic() >= deadline:
            holder = _read_holder(path)
            raise AcquireLockError(
                f"lockfile already exists at {path}"
                + (f" (held by writer {holder})" if holder else "")
            )
        time.sleep(poll_sec)
    try:
        yield path
    finally:
        try:
            _remove(path)
        except OSError:
            pass


MAINTENANCE_LOCK_NAME = "__maintenance"


@contextmanager
def store_mutation_lock(owner, store_dir: str, timeout_sec: float = 0.0):
    """Mutual exclusion for a lake index store's MUTATING verbs —
    add_batch / delete / upsert_batch / forget / purge / refresh /
    compact (round 12, VERDICT r11 item 3). Those verbs' "must not
    run concurrently with add_batch" contracts used to be prose only;
    a violated contract corrupts silently (interleaved epoch
    numbering, a purge rewrite racing an append). This makes the
    violation fail loudly with the holder's writer id, using the SAME
    lockfile machinery the warehouse writers already trust (T5):
    `<store_dir>/__maintenance.lock`, O_CREAT|O_EXCL locally,
    exists-then-put on object stores.

    Reentrant per `owner` (an index instance): composite verbs take
    the lock once at the outermost call (upsert = delete + add,
    compact = purge + merge + refresh), while a different instance or
    process contends on the real file. The owner carries its writer
    id for the instance's lifetime (`owner._writer_id`, created here
    on first use), so the T5 scavenging discipline applies unchanged:
    a crashed holder's lock is removed by
    `remove_lock_if_same_writer(store_dir, MAINTENANCE_LOCK_NAME,
    writer_id)` — never by a different live writer."""
    depth = getattr(owner, "_store_lock_depth", 0)
    if depth:
        owner._store_lock_depth = depth + 1
        try:
            yield None
        finally:
            owner._store_lock_depth = depth
        return
    wid = getattr(owner, "_writer_id", None)
    if wid is None:
        wid = owner._writer_id = new_writer_id()
    owner._store_lock_depth = 1
    try:
        with metrics_lock(
            store_dir, MAINTENANCE_LOCK_NAME, wid, timeout_sec
        ) as path:
            yield path
    finally:
        owner._store_lock_depth = 0


def read_holder(db_dir: str, metrics: str) -> str:
    """The writer id recorded in a live lockfile ('' when absent or
    unreadable) — the operator-facing half of crash scavenging: read
    the holder, verify out-of-band that its process is dead, then
    remove with `remove_lock_if_same_writer(db_dir, metrics, holder)`.
    The same-writer rule still holds — this never removes anything
    itself, so one writer can never break another's LIVE lock by
    accident."""
    return _read_holder(lockfile_path(db_dir, metrics))


def locked_mutation(fn):
    """Decorator form of `store_mutation_lock` for index methods: the
    instance must expose `store_dir`. Keeps the verb bodies untouched
    — the lock wraps the whole call, releases on any raise, and the
    per-owner reentrancy lets decorated verbs compose (compact →
    purge → recover, upsert → delete + add)."""
    import functools

    @functools.wraps(fn)
    def wrapper(self, *args, **kwargs):
        with store_mutation_lock(self, self.store_dir):
            return fn(self, *args, **kwargs)

    return wrapper


def remove_lock_if_same_writer(db_dir: str, metrics: str, writer_id: str) -> bool:
    """Stale-lock cleanup after a crash: remove the lock only when its
    recorded writer id matches (`remove_local_lock_file_if_same_writer`,
    write.rs:142-167). Returns True when a lock was removed."""
    path = lockfile_path(db_dir, metrics)
    if not fsio.exists(path):
        return False
    if _read_holder(path) != writer_id:
        return False
    try:
        _remove(path)
        return True
    except OSError:
        return False
