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
