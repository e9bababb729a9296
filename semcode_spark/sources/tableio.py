"""TableIO seam: snapshot-committed table storage for the index.

The north_rule targets Iceberg tables; this sandbox ships no Iceberg
jars (and installs are off), so the engine isolates every storage
primitive it needs behind this module, implemented for local parquet
directories with a CURRENT pointer file. Each primitive has an exact
Iceberg equivalent — swapping this module's bodies (spark.writeTo /
MERGE INTO / snapshot commit) is the only change needed on a cluster
with an Iceberg catalog:

| TableIO primitive (here)           | Iceberg equivalent |
|------------------------------------|--------------------|
| per-seg/group dir overwrite (the callers' `write.mode("overwrite")` into `seg=S/`/`group=G/`) | `df.writeTo(t).overwritePartitions()` — idempotent partition replace |
| manifest-gated visibility (read_index filters to completed rows) | snapshot isolation: readers see only committed snapshots |
| `commit_current_version` (os.replace of CURRENT) | the atomic snapshot commit / `CALL catalog.system.cherrypick_snapshot` on the compacted table |
| tombstones + stats delta rows (doc replace) | `MERGE INTO docs USING new ON doc_id WHEN MATCHED UPDATE ... WHEN NOT MATCHED INSERT` + equality deletes on postings |
| `version_dir` layout (v{N}/...)    | table metadata versions (vN.metadata.json) managed by the catalog |
| meta.json (analyzer, layout)       | table properties (`ALTER TABLE ... SET TBLPROPERTIES`) |

Reference parity: the reference's storage layer is Milvus collection
upsert keyed on id (storage/milvus_store.py:87-133) plus a JSON registry
(storage/registry.py:54-62); the manifest + snapshot pointer here carry
the same contracts (keyed replace, atomic registry update, resume).
"""

from __future__ import annotations

import json
import os


def _current_path(index_dir: str) -> str:
    return os.path.join(index_dir, "CURRENT")


def read_current_version(index_dir: str) -> int | None:
    """The live snapshot version, or None for a not-yet-initialized dir."""
    try:
        with open(_current_path(index_dir)) as f:
            return int(f.read().strip())
    except FileNotFoundError:
        return None


def commit_current_version(index_dir: str, version: int) -> None:
    """Atomically flip the live-version pointer (write-temp + os.replace
    — POSIX-atomic; the Iceberg-snapshot-commit analog). Everything under
    v{version} must be fully written before calling this."""
    os.makedirs(index_dir, exist_ok=True)
    tmp = _current_path(index_dir) + ".tmp"
    with open(tmp, "w") as f:
        f.write(f"{version}\n")
    os.replace(tmp, _current_path(index_dir))


def version_dir(index_dir: str, version: int) -> str:
    return os.path.join(index_dir, f"v{version}")


def write_meta(vdir: str, props: dict) -> None:
    """Persist table properties (analyzer, layout) for a version."""
    os.makedirs(vdir, exist_ok=True)
    with open(os.path.join(vdir, "meta.json"), "w") as f:
        json.dump(props, f)


def read_meta(vdir: str) -> dict:
    try:
        with open(os.path.join(vdir, "meta.json")) as f:
            return json.load(f)
    except FileNotFoundError:
        return {}


# ------------------------------------------------------------ write lease ---

class ConcurrentWriterError(RuntimeError):
    """A second writer tried to mutate an index a first writer holds."""


_HEARTBEATS: dict = {}
# payload of the lease file each acquire in this process wrote — the
# identity check that keeps a zombie holder (whose lease was broken and
# re-acquired) from heartbeating or unlinking the NEW holder's file.
# Payload, not inode: a fresh create right after an unlink routinely
# reuses the inode number, so st_ino cannot distinguish holders.
_LEASE_PAYLOADS: dict = {}
import itertools as _itertools

_LEASE_SEQ = _itertools.count()


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True  # exists, other uid
    return True


def acquire_lease(index_dir: str, owner: str, ttl_s: float = 3600.0,
                  heartbeat: bool = True) -> str:
    """Single-writer guard for index mutations (add_segment, compaction).

    O_CREAT|O_EXCL on a `_lease` file — atomic on POSIX. A second writer
    raises ConcurrentWriterError instead of silently racing (the r2
    failure mode: a segment added during compaction's rewrite would be
    dropped by the CURRENT flip). Iceberg analog: optimistic commit
    conflict detection — on a real catalog the snapshot commit itself
    rejects the loser.

    Liveness (r3 advice #2 — a fixed TTL against a never-refreshed
    mtime silently broke the lease of any legitimately long build):
    the holder HEARTBEATS the file (mtime touch every ttl/4, daemon
    thread), so a live writer's lease never looks stale no matter how
    long the job runs. A second writer breaks the lease only when the
    heartbeat has been silent for a full ``ttl_s`` AND the recorded
    holder pid is provably dead on this host; a silent-but-alive
    same-host holder raises instead of being broken (cross-host
    holders have no pid check — the heartbeat is the only signal, and
    its absence for a full TTL is the break condition)."""
    os.makedirs(index_dir, exist_ok=True)
    path = os.path.join(index_dir, "_lease")
    host = os.uname().nodename
    # seq makes every acquire's payload unique even for the same
    # owner+pid — the heartbeat/release identity check needs it
    payload = (f"{owner} pid={os.getpid()} host={host} "
               f"seq={next(_LEASE_SEQ)}\n")
    for _ in range(2):
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            with os.fdopen(fd, "w") as f:
                f.write(payload)
            _LEASE_PAYLOADS[path] = payload
            if heartbeat:
                _start_heartbeat(path, min(60.0, ttl_s / 4.0), payload)
            return path
        except FileExistsError:
            import time as _t

            try:
                age = _t.time() - os.path.getmtime(path)
                with open(path) as f:
                    holder = f.read().strip()
            except FileNotFoundError:
                continue  # holder released between checks — retry
            if age > ttl_s:
                h_pid, h_host = _parse_holder(holder)
                if h_host == host and h_pid is not None and _pid_alive(h_pid):
                    raise ConcurrentWriterError(
                        f"{index_dir} lease is stale ({age:.0f}s past "
                        f"heartbeat) but holder {holder} is still alive "
                        f"on this host — refusing to break a live "
                        f"writer's lease; investigate or kill it first")
                os.unlink(path)  # provably dead (or unreachable) writer
                continue
            raise ConcurrentWriterError(
                f"{index_dir} is locked by another writer ({holder}, "
                f"{age:.0f}s ago) — index mutations are single-writer; "
                f"wait, or remove _lease if that writer is known dead")
    raise ConcurrentWriterError(f"could not acquire lease under {index_dir}")


def _parse_holder(holder: str) -> tuple[int | None, str | None]:
    pid, host = None, None
    for tok in holder.split():
        if tok.startswith("pid="):
            try:
                pid = int(tok[4:])
            except ValueError:
                pid = None
        elif tok.startswith("host="):
            host = tok[5:]
    return pid, host


def _start_heartbeat(path: str, interval_s: float, payload: str) -> None:
    """Refresh mtime every ``interval_s`` — but only while the file at
    ``path`` is still THE lease this holder created (payload re-read).
    If the lease was broken and re-acquired by another writer, a blind
    utime would keep the NEW holder's file perpetually fresh even after
    that holder dies — locking all future writers out until this zombie
    process exits (r4 ADVICE #3). A changed/missing payload stops the
    thread instead.

    Residual TOCTOU window (r5 ADVICE #3, documented trade): the
    payload check and the subsequent utime/unlink are read-then-act —
    if the lease is broken AND re-acquired by a new holder in the
    microseconds between them, the zombie can refresh (or, in
    release_lease, delete) the new holder's file ONCE before the next
    payload re-read stops it. One spurious heartbeat extends the new
    lease by at most one interval; one spurious delete degrades to the
    pre-lease state (two live writers racing), which the manifest's
    versioned-snapshot commit keeps crash-consistent. Closing it fully
    needs an O_EXCL-held fd + fstat/st_nlink verification per beat —
    complexity not worth it for a window this narrow on a single-writer
    maintenance path."""
    import threading

    stop = threading.Event()

    def beat() -> None:
        while not stop.wait(interval_s):
            try:
                with open(path) as f:
                    if f.read() != payload:
                        return  # someone else's lease — never touch it
                os.utime(path)
            except OSError:
                return  # lease gone (released/broken): stop quietly

    t = threading.Thread(target=beat, name=f"lease-hb:{path}", daemon=True)
    _HEARTBEATS[path] = (stop, t)
    t.start()


def release_lease(path: str) -> None:
    hb = _HEARTBEATS.pop(path, None)
    if hb is not None:
        hb[0].set()
    mine = _LEASE_PAYLOADS.pop(path, None)
    try:
        if mine is not None:
            with open(path) as f:
                if f.read() != mine:
                    return  # broken + re-acquired: a NEW holder's file
        os.unlink(path)
    except FileNotFoundError:
        pass
