"""Per-stage checkpoint manifest with lineage + metrics.

The scale analogue of ck's ``.ck/manifest.json`` (IndexManifest,
/root/reference/ck-index/src/lib.rs:158-192) and of its atomic
tmp+fsync+rename sidecar writes (ck-index/src/lib.rs:1504-1523): every
completed build stage writes one JSON record atomically (tmp + os.replace);
resume skips stages whose record exists for the same input snapshot
(analogue of ck's hash-gated skip at ck-index/src/lib.rs:841-906).

In production these records live in an Iceberg ``index_manifest`` table
(MERGE INTO per stage); the JSON-file form keeps the sandbox dependency-free
while preserving the exact semantics (atomic per-partition commit, lineage,
metrics).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict, dataclass


@dataclass
class StageRecord:
    stage: str
    partition_id: int
    input_snapshot: str
    rows: int
    terms: int
    build_ms: int
    status: str
    lineage: str
    created_at: float


class Manifest:
    def __init__(self, root: str):
        self.dir = os.path.join(root, "manifest")
        os.makedirs(self.dir, exist_ok=True)

    def _path(self, stage: str, partition_id: int) -> str:
        return os.path.join(self.dir, f"stage-{stage}-{partition_id}.json")

    def complete(self, stage: str, partition_id: int, input_snapshot: str,
                 rows: int, terms: int, build_ms: int, lineage: str) -> None:
        rec = StageRecord(stage, partition_id, input_snapshot, rows, terms,
                          build_ms, "complete", lineage, time.time())
        tmp = self._path(stage, partition_id) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(asdict(rec), f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._path(stage, partition_id))

    def is_complete(self, stage: str, partition_id: int, input_snapshot: str) -> bool:
        p = self._path(stage, partition_id)
        if not os.path.exists(p):
            return False
        try:
            with open(p) as f:
                rec = json.load(f)
        except (json.JSONDecodeError, OSError):
            return False
        return rec.get("status") == "complete" and rec.get("input_snapshot") == input_snapshot

    def invalidate(self, *stages: str) -> None:
        """Remove every record of the given stages — used when their output
        directories are wiped, so resume can never skip re-creating them
        (a record without its data is a lie)."""
        for name in os.listdir(self.dir):
            for stage in stages:
                if name.startswith(f"stage-{stage}-") and name.endswith(".json"):
                    try:
                        os.remove(os.path.join(self.dir, name))
                    except FileNotFoundError:
                        pass

    def records(self) -> list[dict]:
        out = []
        for name in sorted(os.listdir(self.dir)):
            if name.startswith("stage-") and name.endswith(".json"):
                with open(os.path.join(self.dir, name)) as f:
                    out.append(json.load(f))
        return out

    # in-progress markers: crash-detection brackets around multi-artifact
    # mutations (update_index). Written atomically like stage records; the
    # presence of the marker means the bracketed mutation may be half-done.
    def _marker_path(self, name: str) -> str:
        return os.path.join(self.dir, f"marker-{name}.json")

    def save_marker(self, name: str, payload: dict) -> None:
        tmp = self._marker_path(name) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(payload, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._marker_path(name))

    def load_marker(self, name: str) -> dict | None:
        try:
            with open(self._marker_path(name)) as f:
                return json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            return None

    def clear_marker(self, name: str) -> None:
        try:
            os.remove(self._marker_path(name))
        except FileNotFoundError:
            pass

    # index-level metadata (tokenizer mode, segment count, BM25 params):
    # the analogue of ck's manifest embedding_model/chunk_hash_version fields.
    def save_meta(self, meta: dict) -> None:
        tmp = os.path.join(self.dir, "index_meta.json.tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=1)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, os.path.join(self.dir, "index_meta.json"))

    def load_meta(self) -> dict:
        with open(os.path.join(self.dir, "index_meta.json")) as f:
            return json.load(f)
