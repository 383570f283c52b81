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
  to declare which files are live. Readers resolve the manifest log
  instead of listing directories, so a crashed or concurrent writer's
  orphan data files are invisible, and OVERWRITE is a logical operation
  (the manifest marks partitions replaced — no delete on the data path).

Sequencing: each manifest owns a unique monotonically increasing
sequence number, CLAIMED by creating ``manifest-<seq>.json`` with
``O_CREAT|O_EXCL`` (the local-filesystem equivalent of an object
store's conditional PUT / put-if-absent). A racing committer that loses
the claim retries with seq+1, so two committers can never publish the
same sequence number and replay order is total — the window the round-8
uuid-suffix scheme left open is closed. The full JSON body is written
into the claimed fd and fsynced; a reader that races the few-µs gap
between claim and content durability retries briefly and then treats
the manifest as in-flight (not yet committed), which is exactly the
pre-commit snapshot it would have seen a moment earlier.

Log growth: replaying every manifest since table creation is
O(#commits) per scan — unbounded on a frequently-committed table. Every
``CHECKPOINT_EVERY`` commits (or via :func:`manifest_compact`) the
committer also publishes ``checkpoint-<seq>.json``: a snapshot of the
full live-file map with every manifest ≤ seq folded in. Readers load
the newest checkpoint and replay only the tail manifests after it, so
read cost is bounded by ``CHECKPOINT_EVERY`` regardless of table age
(the same live-snapshot idea as Delta's ``_last_checkpoint`` /
Iceberg's metadata snapshots). Checkpoints are derived data: publishing
one is also O_EXCL-claimed, and a loser simply skips (the winner wrote
the identical fold).
"""

from __future__ import annotations

import json
import os
import re
import shutil
import time

_COMMITS_DIR = "_commits"
# Current naming is seq-only; the round-8 scheme suffixed a uuid. Accept
# both on replay so a table written by an older build stays readable.
_MANIFEST_RE = re.compile(r"manifest-(\d{20})(?:-[0-9a-f]{32})?\.json$")
_CHECKPOINT_RE = re.compile(r"checkpoint-(\d{20})\.json$")

#: Publish a checkpoint manifest every N commits (readers then replay at
#: most N tail manifests + 1 checkpoint).
CHECKPOINT_EVERY = 20


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


def _max_seq(commits: str) -> int:
    seq = 0
    if os.path.isdir(commits):
        for fn in os.listdir(commits):
            m = _MANIFEST_RE.match(fn)
            if m:
                seq = max(seq, int(m.group(1)))
    return seq


def _write_claimed(path: str, body: dict) -> bool:
    """Atomically claim ``path`` with O_CREAT|O_EXCL (conditional-PUT
    semantics) and write ``body`` into the claimed fd. Returns False if
    another writer already owns the name."""
    try:
        fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY, 0o644)
    except FileExistsError:
        return False
    try:
        os.write(fd, json.dumps(body).encode("utf-8"))
        os.fsync(fd)
    finally:
        os.close(fd)
    return True


def _publish_manifest(base: str, body: dict) -> int:
    """Publish one manifest under an exclusively-claimed sequence
    number; racing committers retry with seq+1 until the claim
    succeeds. Returns the sequence number published."""
    commits = os.path.join(base, _COMMITS_DIR)
    os.makedirs(commits, exist_ok=True)
    seq = _max_seq(commits) + 1
    while not _write_claimed(
        os.path.join(commits, f"manifest-{seq:020d}.json"), body
    ):
        seq += 1
    if seq % CHECKPOINT_EVERY == 0:
        _publish_checkpoint(base, seq)
    return seq


def _read_json(path: str) -> dict | None:
    """Read one manifest/checkpoint body. A file that stays unparseable
    after brief retries is an in-flight commit (name claimed, content
    not yet durable) — treated as not-yet-committed, i.e. skipped."""
    for _ in range(5):
        try:
            with open(path) as fh:
                return json.load(fh)
        except (json.JSONDecodeError, ValueError, OSError):
            time.sleep(0.01)
    return None


def _latest_checkpoint(commits: str) -> tuple[int, dict[str, set[str]]]:
    """Newest readable checkpoint: (folded-through seq, live map)."""
    if not os.path.isdir(commits):
        return 0, {}
    seqs = sorted(
        (int(m.group(1)) for fn in os.listdir(commits) if (m := _CHECKPOINT_RE.match(fn))),
        reverse=True,
    )
    for seq in seqs:
        body = _read_json(os.path.join(commits, f"checkpoint-{seq:020d}.json"))
        if body is not None:
            return seq, {rel: set(names) for rel, names in body.get("live", {}).items()}
    return 0, {}


def _replay(live: dict[str, set[str]], body: dict) -> None:
    if body.get("overwrite"):
        for rel in body.get("partitions", []):
            live[rel] = set()
    for rel, names in body.get("files", {}).items():
        live.setdefault(rel, set()).update(names)


def _publish_checkpoint(base: str, upto: int) -> None:
    """Snapshot the live map with every manifest ≤ ``upto`` folded in.
    Derived data: an O_EXCL loser skips (the winner wrote the same fold)."""
    commits = os.path.join(base, _COMMITS_DIR)
    start, live = _latest_checkpoint(commits)
    for fn in sorted(os.listdir(commits)):
        m = _MANIFEST_RE.match(fn)
        if m and start < int(m.group(1)) <= upto:
            body = _read_json(os.path.join(commits, fn))
            if body is not None:
                _replay(live, body)
    _write_claimed(
        os.path.join(commits, f"checkpoint-{upto:020d}.json"),
        {"live": {rel: sorted(names) for rel, names in live.items()}},
    )


def manifest_compact(base: str) -> None:
    """Explicit compaction: publish a checkpoint at the current head so
    the next reader replays zero tail manifests."""
    commits = os.path.join(base, _COMMITS_DIR)
    head = _max_seq(commits)
    if head:
        _publish_checkpoint(base, head)


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
    """Resolve {rel: live file names}: newest checkpoint + tail replay.
    Read cost is bounded by ``CHECKPOINT_EVERY`` tail manifests + one
    checkpoint regardless of the table's total commit count."""
    commits = os.path.join(base, _COMMITS_DIR)
    if not os.path.isdir(commits):
        return {}
    start, live = _latest_checkpoint(commits)
    for fn in sorted(os.listdir(commits)):
        m = _MANIFEST_RE.match(fn)
        if m and int(m.group(1)) > start:
            body = _read_json(os.path.join(commits, fn))
            if body is not None:
                _replay(live, body)
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
