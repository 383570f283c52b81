"""Sink commit protocols for the filesystem connector's staged writes.

The reference commits a staged write by MOVING task files into place
(``FileSystemCommitter.java`` + ``PartitionTempFileManager.java``) —
correct where rename is atomic and O(1) (POSIX, HDFS). On object stores
(the realistic 100 TB substrate) rename is copy+delete and non-atomic,
so the concurrent-writer guarantee silently weakens. This module makes
the commit step a seam with two implementations, selected per table by
``'sink.commit-protocol'``:

- ``rename`` (default): the reference's protocol — move the staged
  files into the final partition directories; readers list directories.
- ``manifest``: the table-format pattern (Spark's FileCommitProtocol /
  Iceberg/Delta-style): data files keep globally-unique names in their
  final directories and a small JSON manifest is published atomically
  (write-temp + rename of ONE small file; a conditional PUT on a real
  object store) to declare which files are live. Readers resolve the
  manifest log instead of listing directories, so a crashed or
  concurrent writer's orphan data files are invisible, and OVERWRITE is
  a logical operation (the manifest marks partitions replaced — no
  delete on the data path).

Manifest ordering uses a monotonically increasing sequence number in
the manifest filename. Two racing committers can mint the same sequence
number; both manifests still publish (unique uuid suffix) and neither's
files are lost — only the replay order between the two is ambiguous,
exactly the window a real object store closes with a conditional PUT
(documented divergence, same shape as Delta's transaction-log contract).
"""

from __future__ import annotations

import json
import os
import re
import shutil
import uuid

_COMMITS_DIR = "_commits"
_MANIFEST_RE = re.compile(r"manifest-(\d{20})-[0-9a-f]{32}\.json$")


def _data_files(d: str) -> list[str]:
    return [
        f
        for f in os.listdir(d)
        if not f.startswith((".", "_")) and os.path.isfile(os.path.join(d, f))
    ]


def rename_commit(base: str, staging: str, rels: list[str], overwrite: bool) -> None:
    """The reference's protocol: move staged files into place; an
    OVERWRITE physically clears the produced partitions first."""
    for rel in rels:
        src = os.path.join(staging, rel) if rel else staging
        dst = os.path.join(base, rel) if rel else base
        if overwrite:
            if rel:
                shutil.rmtree(dst, ignore_errors=True)
            else:
                for e in os.scandir(base):
                    if e.name.startswith((".", "_")):
                        continue  # staging dirs, markers, metadata
                    if e.is_file():
                        os.remove(e.path)
                    elif e.is_dir() and "=" in e.name:
                        shutil.rmtree(e.path)
        os.makedirs(dst, exist_ok=True)
        for f in _data_files(src):
            os.replace(os.path.join(src, f), os.path.join(dst, f))
    shutil.rmtree(staging, ignore_errors=True)


def _next_seq(commits: str) -> int:
    seq = 0
    if os.path.isdir(commits):
        for fn in os.listdir(commits):
            m = _MANIFEST_RE.match(fn)
            if m:
                seq = max(seq, int(m.group(1)))
    return seq + 1


def _publish_manifest(base: str, body: dict) -> None:
    """The single atomic-publish step every manifest writer shares
    (write temp + rename of one small file; a conditional PUT on a real
    object store)."""
    commits = os.path.join(base, _COMMITS_DIR)
    os.makedirs(commits, exist_ok=True)
    name = f"manifest-{_next_seq(commits):020d}-{uuid.uuid4().hex}.json"
    tmp = os.path.join(commits, f".{name}.tmp")
    with open(tmp, "w") as fh:
        json.dump(body, fh)
    os.replace(tmp, os.path.join(commits, name))


def manifest_commit(base: str, staging: str, rels: list[str], overwrite: bool) -> None:
    """Move data files (already uniquely named by Spark's task-uuid part
    naming) into their final directories WITHOUT deleting anything, then
    atomically publish one manifest declaring them live. On an object
    store the move step disappears entirely — tasks write their final
    unique names directly and only the manifest publish remains."""
    files: dict[str, list[str]] = {}
    for rel in rels:
        src = os.path.join(staging, rel) if rel else staging
        dst = os.path.join(base, rel) if rel else base
        os.makedirs(dst, exist_ok=True)
        names = _data_files(src)
        for f in names:
            os.replace(os.path.join(src, f), os.path.join(dst, f))
        files[rel] = sorted(names)
    shutil.rmtree(staging, ignore_errors=True)
    _publish_manifest(
        base,
        {"overwrite": bool(overwrite), "partitions": sorted(rels), "files": files},
    )


def manifest_truncate_partitions(base: str, rel_prefix: str) -> None:
    """Logical DROP PARTITION on a manifest table: publish an overwrite
    manifest with zero files for every live partition under
    ``rel_prefix`` (data files stay on disk — only the live set
    changes, the same no-delete rule as manifest OVERWRITE)."""
    live = _live_map(base)
    victims = sorted(
        rel
        for rel in live
        if rel == rel_prefix or rel.startswith(rel_prefix + "/")
    )
    if not victims:
        return
    _publish_manifest(base, {"overwrite": True, "partitions": victims, "files": {}})


def _live_map(base: str) -> dict[str, set[str]]:
    """Replay the manifest log into {rel: live file names}."""
    commits = os.path.join(base, _COMMITS_DIR)
    live: dict[str, set[str]] = {}
    if not os.path.isdir(commits):
        return live
    for fn in sorted(fn for fn in os.listdir(commits) if _MANIFEST_RE.match(fn)):
        with open(os.path.join(commits, fn)) as fh:
            body = json.load(fh)
        if body.get("overwrite"):
            for rel in body.get("partitions", []):
                live[rel] = set()
        for rel, names in body.get("files", {}).items():
            live.setdefault(rel, set()).update(names)
    return live


def manifest_live_files(base: str) -> list[str]:
    """Replay the manifest log into the live file set. An ``overwrite``
    manifest logically truncates the partitions it covers before adding
    its own files; data files no manifest claims (crashed or in-flight
    writers) are invisible. Returns absolute paths."""
    live = _live_map(base)
    out: list[str] = []
    for rel, names in live.items():
        d = os.path.join(base, rel) if rel else base
        out.extend(os.path.join(d, n) for n in sorted(names))
    return sorted(out)
