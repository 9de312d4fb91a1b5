"""Snapshot manifest: atomic publish, time travel, lineage.

The reference's commit point is a constant-time atomic rename of the
Lucene segments file inside one FDB transaction (reference:
FDBDirectory.java:350-365, README.md:70-86). No Iceberg runtime
exists in this sandbox (SURVEY.md section 7.2), so we implement the
same semantics as a JSON-manifest-over-Parquet layer:

- segment data is written to task-unique immutable paths first;
  anything not referenced by a committed manifest is invisible — the
  reference's write-after-delete tolerance (FDBIndexOutput.java:182-189)
  becomes orphan-output tolerance;
- publishing = write manifest.v{N}.json exclusively (optimistic CAS on
  the version — a writer losing the race gets a clean conflict error,
  mirroring the lock-free FDBIndexWriter claim, README.md:33-38), then
  os.rename a tmp CURRENT pointer (POSIX-atomic, the `rename` analogue);
- readers resolve CURRENT once and pin that snapshot for the whole
  query — the reference's ReadVersionCache snapshot pinning
  (ReadVersionCache.java:23,32-46) becomes manifest-version pinning,
  and any historical version remains openable (time travel / resume
  checkpoint, BASELINE.json north_rule "resumable from checkpoint").

On a real deployment this module is the seam where an Iceberg catalog
would be substituted; paths here are local-FS/POSIX.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass, field
from typing import Any

MANIFEST_DIR = "manifest"
CURRENT = "CURRENT"
FORMAT_VERSION = 1


def dir_fingerprint(path: str) -> tuple[int, str]:
    """(total_bytes, sha256 over sorted (relpath, size)) for a segment
    directory — detects missing/truncated files without a data pass."""
    import hashlib

    entries = []
    total = 0
    for base, _, files in os.walk(path):
        for f in files:
            if f.startswith(".") or f.endswith(".crc") or f == "_SUCCESS":
                continue
            p = os.path.join(base, f)
            size = os.path.getsize(p)
            total += size
            entries.append((os.path.relpath(p, path), size))
    h = hashlib.sha256()
    for rel, size in sorted(entries):
        h.update(f"{rel}:{size}\n".encode())
    return total, h.hexdigest()[:32]


def table_file_lists(seg_dir: str) -> dict[str, list[str]]:
    """table -> sorted parquet data file names for one segment dir,
    captured ONCE at commit time (the writer just produced the files,
    so the listing is cheap and consistent) and recorded in
    SegmentMeta.files for listing-free reads."""
    out: dict[str, list[str]] = {}
    for name in sorted(os.listdir(seg_dir)):
        sub = os.path.join(seg_dir, name)
        if not os.path.isdir(sub) or name.startswith(("_", ".")):
            continue
        files = sorted(f for f in os.listdir(sub) if f.endswith(".parquet"))
        if files:
            out[name] = files
    return out


class CommitConflict(Exception):
    """Another writer published this version first (optimistic CAS lost)."""


@dataclass
class SegmentMeta:
    """Stats + lineage for one immutable segment (reference analogue:
    per-file FileMetaData, FDBDirectory.java:438-449, plus the index
    counters of DATA.md:22,33-35)."""

    segment_id: str
    path: str                 # relative to index root
    n_docs: int
    sum_dl: int               # exact sum of field lengths (drives avgdl)
    n_terms: int
    n_postings: int
    doc_min: int
    doc_max: int
    bytes: int = 0
    lineage: list[dict] = field(default_factory=list)  # per-partition metrics
    # per-field corpus stats for multi-field indexes (reference:
    # TextField + StringField per doc, SimpleFDBDirectoryTest.java:202-207;
    # per-field dc/sdf/sttf keys, DATA.md:33-35). Top-level n_docs /
    # sum_dl remain the PRIMARY text field's numbers for back-compat.
    field_stats: dict = field(default_factory=dict)
    # structural checksum over (relpath, size) of every file — the
    # catalog-level analogue of the reference's per-file CRC32
    # (FDBIndexOutput.getChecksum, FDBIndexOutput.java:93,113-115)
    content_hash: str = ""
    # table -> sorted parquet data file names, recorded at commit (the
    # reference's file catalog, DATA.md file metadata keyspace): readers
    # resolve data files from the MANIFEST, never from directory
    # listings — object-store LIST is slow and eventually consistent.
    # Empty for legacy manifests (readers fall back to listdir).
    files: dict = field(default_factory=dict)

    def to_json(self) -> dict:
        return dict(self.__dict__)

    @staticmethod
    def from_json(d: dict) -> "SegmentMeta":
        return SegmentMeta(**d)


@dataclass
class Manifest:
    version: int
    analyzer: str
    block_size: int
    n_shards: int
    segments: list[SegmentMeta]
    parent_version: int | None = None
    properties: dict[str, Any] = field(default_factory=dict)
    format_version: int = FORMAT_VERSION

    # -- aggregate corpus stats (exact; what BM25 needs, DATA.md:33-35)
    @property
    def n_docs(self) -> int:
        return sum(s.n_docs for s in self.segments)

    @property
    def sum_dl(self) -> int:
        return sum(s.sum_dl for s in self.segments)

    @property
    def avgdl(self) -> float:
        return self.sum_dl / self.n_docs if self.n_docs else 0.0

    @property
    def n_postings(self) -> int:
        return sum(s.n_postings for s in self.segments)

    def fields(self) -> list[str]:
        out: list[str] = []
        for s in self.segments:
            for f in s.field_stats:
                if f not in out:
                    out.append(f)
        return out or ["text"]

    def field_stat(self, fld: str, key: str) -> int:
        return sum(int(s.field_stats.get(fld, {}).get(key, 0)) for s in self.segments)

    def avgdl_for(self, fld: str) -> float:
        if not any(fld in s.field_stats for s in self.segments):
            return self.avgdl  # legacy single-field manifests
        n = self.field_stat(fld, "n_docs")
        return self.field_stat(fld, "sum_dl") / n if n else 0.0

    def n_docs_for(self, fld: str) -> int:
        if not any(fld in s.field_stats for s in self.segments):
            return self.n_docs
        return self.field_stat(fld, "n_docs")

    def sum_dl_for(self, fld: str) -> int:
        """Exact total token count of a field (Lucene
        CollectionStatistics.sumTotalTermFreq) — drives the LM
        similarities' collection model."""
        if not any(fld in s.field_stats for s in self.segments):
            return self.sum_dl
        return self.field_stat(fld, "sum_dl")

    @property
    def doc_max(self) -> int:
        return max((s.doc_max for s in self.segments), default=-1)

    def segment_paths(self, root: str, table: str) -> list[str]:
        return [os.path.join(root, s.path, table) for s in self.segments]

    def to_json(self) -> dict:
        d = dict(self.__dict__)
        d["segments"] = [s.to_json() for s in self.segments]
        return d

    @staticmethod
    def from_json(d: dict) -> "Manifest":
        d = dict(d)
        d["segments"] = [SegmentMeta.from_json(s) for s in d["segments"]]
        return Manifest(**d)


class IndexCatalog:
    """Directory-open/create + snapshot commit for one index root
    (reference analogue: FDBDirectory.open, FDBDirectory.java:102-167)."""

    def __init__(self, root: str):
        self.root = root
        self.manifest_dir = os.path.join(root, MANIFEST_DIR)

    # ------------------------------------------------------------- read side
    def current_version(self) -> int | None:
        cur = os.path.join(self.manifest_dir, CURRENT)
        if not os.path.exists(cur):
            return None
        with open(cur) as f:
            name = f.read().strip()
        return int(name.split(".v")[1].split(".json")[0])

    def load(self, version: int | None = None) -> Manifest:
        """Pin a snapshot. version=None -> CURRENT (resolved exactly once)."""
        if version is None:
            version = self.current_version()
            if version is None:
                raise FileNotFoundError(f"no committed manifest under {self.root}")
        path = os.path.join(self.manifest_dir, f"manifest.v{version:06d}.json")
        with open(path) as f:
            return Manifest.from_json(json.load(f))

    def exists(self) -> bool:
        return self.current_version() is not None

    def versions(self) -> list[int]:
        if not os.path.isdir(self.manifest_dir):
            return []
        out = []
        for n in os.listdir(self.manifest_dir):
            if n.startswith("manifest.v") and n.endswith(".json"):
                out.append(int(n[len("manifest.v"):-len(".json")]))
        return sorted(out)

    # ------------------------------------------------------------ write side
    def commit(self, manifest: Manifest) -> Manifest:
        """Atomically publish a new snapshot (the `rename` analogue)."""
        os.makedirs(self.manifest_dir, exist_ok=True)
        path = os.path.join(self.manifest_dir, f"manifest.v{manifest.version:06d}.json")
        try:
            # exclusive create = optimistic CAS on the version number
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError as e:
            raise CommitConflict(f"manifest v{manifest.version} already committed") from e
        with os.fdopen(fd, "w") as f:
            json.dump(manifest.to_json(), f, indent=1)
        tmp = os.path.join(self.manifest_dir, f".{CURRENT}.tmp.{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            f.write(os.path.basename(path))
        os.rename(tmp, os.path.join(self.manifest_dir, CURRENT))  # atomic publish
        return manifest

    def next_version(self) -> int:
        """One past the newest version — by CURRENT *or* by manifest
        file. A writer can crash between manifest-file creation (the
        O_EXCL CAS) and the CURRENT rename; deriving next_version from
        CURRENT alone would then return the orphaned version forever
        and every committer would spin on CommitConflict."""
        cur = self.current_version() or 0
        newest = max(self.versions(), default=0)
        return max(cur, newest) + 1

    def new_segment_path(self, segment_id: str) -> str:
        """Immutable, collision-free data path (not yet visible)."""
        return os.path.join("data", "segments", segment_id)

    def commit_user_data(self, data: dict[str, str], retries: int = 8) -> Manifest:
        """Data-free checkpoint commit: publish a new snapshot that
        differs from the latest only in its commit user data (Lucene
        IndexWriter.setLiveCommitData + commit() with no doc changes —
        how an ingestion pipeline durably records 'consumed through
        sequence X' even when a batch indexed nothing). Lock-free CAS
        retry like every other commit; segment set, deletes, and all
        other properties carry through untouched."""
        from dataclasses import replace

        for _ in range(max(1, retries)):
            parent = self.load()
            manifest = replace(
                parent,
                version=self.next_version(),
                parent_version=parent.version,
                properties={
                    **parent.properties,
                    "user_data": {str(k): str(v) for k, v in data.items()},
                },
            )
            try:
                return self.commit(manifest)
            except CommitConflict:
                continue
        raise CommitConflict("commit_user_data lost the CAS race repeatedly")

    def rollback_to(self, version: int, retries: int = 8) -> Manifest:
        """Restore an OLD commit point as the new CURRENT (Lucene:
        open an IndexWriter on a SnapshotDeletionPolicy-held commit,
        i.e. IndexWriterConfig.setIndexCommit(old) — every doc/delete/
        doc-value state of the target version comes back, including
        its sidecar paths in properties). The restored state is
        re-published as a NEW manifest version: history stays
        append-only and monotonic, concurrent committers CAS as
        usual, and readers pinned to intermediate versions are
        untouched. Pair with snapshot() so expire_orphans cannot
        collect the target's segments first."""
        from dataclasses import replace

        target = self.load(version)  # raises if the commit point is gone
        for _ in range(max(1, retries)):
            cur = self.load()
            manifest = replace(
                target,
                version=self.next_version(),
                parent_version=cur.version,
                properties={**target.properties, "restored_version": version},
            )
            try:
                return self.commit(manifest)
            except CommitConflict:
                continue
        raise CommitConflict("rollback_to lost the CAS race repeatedly")

    # ------------------------------------------------------------ snapshots
    def snapshot(self, version: int | None = None) -> int:
        """Pin a commit point against physical cleanup (Lucene
        SnapshotDeletionPolicy.snapshot()): expire_orphans keeps every
        segment reachable from a snapshotted version, however old.
        One empty marker file per snapshot — atomic create, lock-free,
        idempotent. Returns the pinned version."""
        v = self.current_version() if version is None else int(version)
        if v is None or not os.path.exists(
            os.path.join(self.manifest_dir, f"manifest.v{v:06d}.json")
        ):
            raise FileNotFoundError(f"no manifest v{v} to snapshot under {self.root}")
        open(os.path.join(self.manifest_dir, f"snapshot.v{v:06d}"), "a").close()
        return v

    def release_snapshot(self, version: int) -> None:
        """SnapshotDeletionPolicy.release(): the commit point becomes
        collectible again once it also ages out of keep_versions."""
        try:
            os.remove(os.path.join(self.manifest_dir, f"snapshot.v{int(version):06d}"))
        except FileNotFoundError:
            raise ValueError(f"version {version} is not snapshotted")

    def snapshots(self) -> list[int]:
        if not os.path.isdir(self.manifest_dir):
            return []
        return sorted(
            int(n[len("snapshot.v"):])
            for n in os.listdir(self.manifest_dir)
            if n.startswith("snapshot.v")
        )

    def verify_segments(self, manifest: Manifest | None = None) -> list[str]:
        """Integrity check: every segment's files exist and the
        structural checksum matches the manifest (S17 analogue).
        Returns a list of problems (empty = healthy)."""
        manifest = manifest or self.load()
        problems = []
        for s in manifest.segments:
            seg_dir = os.path.join(self.root, s.path)
            if not os.path.isdir(seg_dir):
                problems.append(f"{s.segment_id}: missing directory {s.path}")
                continue
            if s.content_hash and dir_fingerprint(seg_dir)[1] != s.content_hash:
                problems.append(f"{s.segment_id}: content hash mismatch")
        return problems

    def expire_orphans(self, keep_versions: int = 3) -> list[str]:
        """Physical cleanup of segments unreachable from the newest
        manifests (Iceberg expire_snapshots analogue; reference: deferred
        pendingDeletions concept, FDBDirectory.java:387-390)."""
        versions = self.versions()
        # snapshotted commit points stay live regardless of age
        # (SnapshotDeletionPolicy contract)
        keep = set(versions[-keep_versions:]) | (set(self.snapshots()) & set(versions))
        live: set[str] = set()
        for v in keep:
            try:
                m = self.load(v)
            except (json.JSONDecodeError, KeyError, TypeError):
                continue  # half-written orphan from a crashed writer
            live |= {s.path for s in m.segments}
        seg_root = os.path.join(self.root, "data", "segments")
        removed = []
        if os.path.isdir(seg_root):
            for name in os.listdir(seg_root):
                rel = os.path.join("data", "segments", name)
                if rel not in live:
                    import shutil

                    shutil.rmtree(os.path.join(seg_root, name), ignore_errors=True)
                    removed.append(rel)
        return removed
