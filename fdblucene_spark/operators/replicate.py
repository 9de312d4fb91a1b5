"""Index replication: publish/sync commit points between index roots.

Lucene's ``replicator`` module (Replicator / ReplicationClient /
IndexRevision) re-expressed over our Iceberg-style manifest layer.
The reference itself gets replication for free from FoundationDB —
fdblucene's whole premise is that the Lucene directory lives in a
replicated KV store (/root/reference/README.md:7-15) — so a
file-based engine needs the Lucene-side mechanism instead:

- ``publish_revision`` = SnapshotDeletionPolicy.snapshot() + handing
  the pinned commit point to the replicator: the version can no
  longer be physically expired until released, so a slow replica can
  always finish copying it.
- ``sync_replica`` = ReplicationClient.updateNow(): copy only the
  segment/sidecar files the replica does not already have (segments
  are immutable and content-hashed, so presence + fingerprint equals
  Lucene's "same file name + length + checksum" skip rule), then
  atomically commit the manifest at the replica. Idempotent and
  resumable: a crashed sync leaves only invisible temp dirs; a rerun
  copies nothing it already has and commits nothing new.

Scale note: at 100 TB the per-file copy loop is a distributed
filesystem copy (DistCp / object-store server-side copy) driven by
the same manifest diff — the decision of WHAT to copy stays exactly
this metadata-sized computation (one manifest, one fingerprint per
segment directory); only the byte movement is delegated. Here the
byte movement is a thread pool, which is the single-node analogue.
"""

from __future__ import annotations

import os
import shutil
import uuid
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

from ..sources.manifest import CommitConflict, IndexCatalog, Manifest, dir_fingerprint

# manifest property keys that name sidecar parquet directories which
# must travel with the commit point (segment tables are in
# manifest.segments; these are the only out-of-segment data paths)
_SIDECAR_KEYS = ("deletes_path", "dv_path")


@dataclass
class SyncReport:
    """What one sync did (per-partition-lineage analogue for the
    replication job)."""

    src_version: int
    dst_version: int
    segments_copied: list[str] = field(default_factory=list)
    segments_skipped: list[str] = field(default_factory=list)
    sidecars_copied: list[str] = field(default_factory=list)
    sidecars_skipped: list[str] = field(default_factory=list)
    bytes_copied: int = 0
    committed: bool = False


def publish_revision(root: str, version: int | None = None) -> int:
    """Pin a commit point for replication (Replicator.publish).

    Returns the pinned version. The snapshot marker keeps every file
    of that commit reachable across expire_orphans until
    ``release_revision`` — Lucene's IndexRevision holds the
    SnapshotDeletionPolicy handle the same way.
    """
    return IndexCatalog(root).snapshot(version)


def release_revision(root: str, version: int) -> None:
    """Release a published commit point (Revision.release)."""
    IndexCatalog(root).release_snapshot(version)


def _copy_tree_atomic(src_dir: str, dst_dir: str, max_workers: int) -> int:
    """Copy a directory into place atomically: write to an invisible
    sibling temp dir, fsync-free rename into the final name. A
    concurrent syncer racing on the same segment loses harmlessly
    (its temp dir is discarded). Returns bytes copied."""
    parent = os.path.dirname(dst_dir.rstrip("/"))
    os.makedirs(parent, exist_ok=True)
    tmp = os.path.join(parent, f".sync-tmp-{uuid.uuid4().hex[:12]}")
    files: list[tuple[str, str]] = []
    for base, _dirs, names in os.walk(src_dir):
        rel = os.path.relpath(base, src_dir)
        os.makedirs(os.path.join(tmp, rel) if rel != "." else tmp, exist_ok=True)
        for n in names:
            files.append((os.path.join(base, n), os.path.join(tmp, rel, n)))
    def _copy_one(pair: tuple[str, str]) -> int:
        shutil.copy2(pair[0], pair[1])
        return os.path.getsize(pair[1])

    total = 0
    if files:
        with ThreadPoolExecutor(max_workers=max_workers) as pool:
            total = sum(pool.map(_copy_one, files))
    try:
        os.rename(tmp, dst_dir)
    except OSError:
        # lost the race: someone else installed the directory first
        shutil.rmtree(tmp, ignore_errors=True)
    return total


def sync_replica(
    src_root: str,
    dst_root: str,
    version: int | None = None,
    max_workers: int = 8,
) -> tuple[Manifest, SyncReport]:
    """Bring a replica root up to the source's (pinned) commit point.

    ReplicationClient.updateNow over the manifest layer:

    1. Load the source manifest (``version`` or current).
    2. Diff against what the replica already has: a segment directory
       that exists under the replica AND matches the manifest's
       content hash is skipped (immutability + checksum == Lucene's
       same-name/same-checksum file reuse); anything else is copied
       via invisible temp dir + atomic rename.
    3. Copy sidecar tables (delete lists, doc-values overrides) the
       same way — they are uuid-named immutable directories.
    4. CAS-commit the manifest at the replica, stamped with
       ``replica_of`` so a rerun at the same source version is a
       no-op commit-wise (full idempotence).

    Returns (replica manifest, SyncReport). Never mutates the source.
    """
    src_cat = IndexCatalog(src_root)
    src_m = src_cat.load(version)
    dst_cat = IndexCatalog(dst_root)

    report = SyncReport(src_version=src_m.version, dst_version=-1)

    for seg in src_m.segments:
        src_dir = os.path.join(src_root, seg.path)
        dst_dir = os.path.join(dst_root, seg.path)
        if os.path.isdir(dst_dir):
            if not seg.content_hash or dir_fingerprint(dst_dir)[1] == seg.content_hash:
                report.segments_skipped.append(seg.segment_id)
                continue
            # corrupt/partial replica copy: repair by re-sync
            shutil.rmtree(dst_dir, ignore_errors=True)
        report.bytes_copied += _copy_tree_atomic(src_dir, dst_dir, max_workers)
        if seg.content_hash and dir_fingerprint(dst_dir)[1] != seg.content_hash:
            raise IOError(
                f"replica copy of segment {seg.segment_id} does not match the "
                f"manifest content hash (source mutated or copy failed)"
            )
        report.segments_copied.append(seg.segment_id)

    for key in _SIDECAR_KEYS:
        rel = src_m.properties.get(key)
        if not rel:
            continue
        dst_dir = os.path.join(dst_root, rel)
        if os.path.isdir(dst_dir):
            report.sidecars_skipped.append(rel)
            continue
        report.bytes_copied += _copy_tree_atomic(
            os.path.join(src_root, rel), dst_dir, max_workers
        )
        report.sidecars_copied.append(rel)

    # commit at the replica: replica version history is its own
    # (a replica may sync from several source versions over time);
    # replica_of records the source lineage for idempotence checks
    cur_v = dst_cat.current_version()
    if cur_v is not None:
        cur = dst_cat.load()
        if cur.properties.get("replica_of") == f"{src_root}@{src_m.version}":
            report.dst_version = cur.version
            return cur, report

    while True:
        new = Manifest(
            version=dst_cat.next_version(),
            analyzer=src_m.analyzer,
            block_size=src_m.block_size,
            n_shards=src_m.n_shards,
            segments=src_m.segments,
            parent_version=dst_cat.current_version(),
            properties={**src_m.properties, "replica_of": f"{src_root}@{src_m.version}"},
        )
        try:
            committed = dst_cat.commit(new)
            break
        except CommitConflict:
            # another syncer landed first; if it landed OUR source
            # version we are done, else retry on top of it
            cur = dst_cat.load()
            if cur.properties.get("replica_of") == f"{src_root}@{src_m.version}":
                report.dst_version = cur.version
                return cur, report
    report.dst_version = committed.version
    report.committed = True
    return committed, report
