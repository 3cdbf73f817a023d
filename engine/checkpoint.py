"""Per-task checkpoint manifests: lineage (input files → output files) + metrics.

The reference persists inter-stage state as monolithic pickles
(``codes/utils/generalFunctions.py:109-130``; e.g.
``codes/search/construct_index.py:540-543`` writes one pickle per process
group) — resumable only at whole-stage granularity.  Here every maintenance
pass is split into tasks (file groups / partitions); each task appends one
JSON record after its outputs are durably staged, so a killed pass resumes by
skipping completed tasks and reusing their staged outputs (FIXTURES.md §4).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Any


@dataclass
class TaskRecord:
    pass_id: str
    op: str
    task_id: str                 # partition / file-group identifier
    input_files: list[str]
    output_files: list[str]
    rows: int = 0
    bytes: int = 0
    skew_factor: float = 1.0     # task rows / mean task rows of the pass
    committed: bool = False
    extra: dict[str, Any] = field(default_factory=dict)


class CheckpointLog:
    """Append-only JSONL log for one maintenance pass (idempotent replay)."""

    def __init__(self, table_root: str, pass_id: str, op: str):
        self.op = op
        self.pass_id = pass_id
        self.dir = os.path.join(table_root, "metadata", "checkpoints")
        os.makedirs(self.dir, exist_ok=True)
        self.path = os.path.join(self.dir, f"{op}-{pass_id}.jsonl")
        self._done: dict[str, dict] = {}
        if os.path.exists(self.path):
            with open(self.path) as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    rec = json.loads(line)
                    if rec["task_id"] == "__abort__":
                        # abandon(): every record before this point belongs
                        # to a dead attempt — a replay must REPLAN, not
                        # resume stale staged output
                        self._done.clear()
                        continue
                    self._done[rec["task_id"]] = rec

    def is_done(self, task_id: str) -> bool:
        return task_id in self._done

    def get(self, task_id: str) -> dict | None:
        return self._done.get(task_id)

    def completed(self) -> list[dict]:
        return list(self._done.values())

    def record(self, rec: TaskRecord) -> None:
        doc = {
            "pass_id": rec.pass_id, "op": rec.op, "task_id": rec.task_id,
            "input_files": rec.input_files, "output_files": rec.output_files,
            "rows": rec.rows, "bytes": rec.bytes,
            "skew_factor": rec.skew_factor, "committed": rec.committed,
            **({"extra": rec.extra} if rec.extra else {}),
        }
        # durability: write the line, fsync, then it is replayable
        with open(self.path, "a") as f:
            f.write(json.dumps(doc) + "\n")
            f.flush()
            os.fsync(f.fileno())
        self._done[rec.task_id] = doc

    def finalize(self, extra: dict | None = None) -> None:
        """Mark the whole pass committed (snapshot swap done)."""
        self.record(TaskRecord(self.pass_id, self.op, "__pass__",
                               [], [], committed=True, extra=extra or {}))

    def abandon(self, extra: dict | None = None) -> None:
        """Terminate the current ATTEMPT without a snapshot swap (commit
        conflict): an ``__abort__`` tombstone invalidates every record
        before it, so (a) the orphan sweep stops protecting the dead
        attempt's staged outputs (the winning concurrent commit owns the
        table now) and (b) a replay with the same pass_id REPLANS from the
        fresh snapshot instead of silently no-opping — a streaming batch
        whose merge lost a race must re-merge on restart, never drop its
        updates."""
        self.record(TaskRecord(self.pass_id, self.op, "__abort__",
                               [], [], committed=False,
                               extra={"aborted": True, **(extra or {})}))
        self._done.clear()

    def pass_committed(self) -> bool:
        rec = self._done.get("__pass__")
        if rec and rec.get("committed"):
            return True
        if self._done:
            return False
        # empty log: the pass may have committed long ago and had its log
        # reaped by expire_checkpoints — the tombstone index retains just
        # the pass key (~50 bytes vs the full log), so a late replay with
        # a reaped pass_id still no-ops instead of re-executing the pass
        # against the changed table
        return f"{self.op}-{self.pass_id}" in _committed_tombstones(self.dir)


def _tombstone_index_path(ckpt_dir: str) -> str:
    return os.path.join(ckpt_dir, "_committed.index")


_tombstone_cache: dict = {}  # path -> ((mtime_ns, size), frozenset of keys)


def _committed_tombstones(ckpt_dir: str) -> set[str]:
    """Pass keys (``<op>-<pass_id>``) of committed passes whose full logs
    were reaped. Append-only, one key per line. Every FRESH pass start
    consults this (its own log is empty), so the parse is cached per
    (mtime, size) — the index grows one line per committed-then-expired
    pass forever, and an O(lifetime-passes) read per streaming micro-batch
    would dominate at cadence."""
    path = _tombstone_index_path(ckpt_dir)
    try:
        st = os.stat(path)
    except FileNotFoundError:
        return set()
    key = (st.st_mtime_ns, st.st_size)
    hit = _tombstone_cache.get(path)
    if hit is not None and hit[0] == key:
        return hit[1]
    with open(path) as f:
        keys = frozenset(line.strip() for line in f if line.strip())
    _tombstone_cache[path] = (key, keys)
    return keys


def record_committed_tombstone(ckpt_dir: str, pass_key: str) -> None:
    with open(_tombstone_index_path(ckpt_dir), "a") as f:
        f.write(pass_key + "\n")
        f.flush()
        os.fsync(f.fileno())
