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
into the claimed fd and fsynced. A reader that races the gap between
claim and content durability adjudicates per manifest: unreadable and
younger than ``DEAD_CLAIM_GRACE_S`` = in-flight (replay STOPS there, so
the served snapshot is a consistent prefix of the history); unreadable
past the grace = a dead claim whose writer crashed before durability
and — because a stalled writer withdraws its own claim rather than
acknowledge past half the grace — can never have reported success, so
it skips through as a non-commit. Checkpoints apply the same
adjudication and never fold past an in-flight manifest.

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
import uuid

_COMMITS_DIR = "_commits"
# Current naming is seq-only; the round-8 scheme suffixed a uuid. Accept
# both on replay so a table written by an older build stays readable.
_MANIFEST_RE = re.compile(r"manifest-(\d{20})(?:-[0-9a-f]{32})?\.json$")
_CHECKPOINT_RE = re.compile(r"checkpoint-(\d{20})\.json$")

#: Publish a checkpoint manifest every N commits (readers then replay at
#: most N tail manifests + 1 checkpoint).
CHECKPOINT_EVERY = 20

#: A claimed manifest whose body is still unreadable after this many
#: seconds is adjudicated DEAD (its writer crashed between claim and
#: fsync — it never acknowledged success, so no committed data is
#: lost by skipping it). Writers enforce the other side of the bargain:
#: a publish whose claim-to-durable gap exceeds half this grace
#: withdraws itself and retries under a fresh sequence number, so a
#: stalled-but-alive committer can never be half-adjudicated.
DEAD_CLAIM_GRACE_S = 60.0

#: minimum data-file retention :func:`manifest_vacuum_data` accepts
#: without an explicit override (Delta's retentionDurationCheck role).
#: Unreferenced-file reclamation is mtime-based, so retention must
#: comfortably exceed the commit lease AND any in-flight write's
#: staging-to-publish gap; one hour is far above both while still
#: letting operational vacuums run same-day.
MIN_DATA_RETENTION_S = 3600.0


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
    """Highest sequence number in use. Checkpoints count too: after a
    vacuum removes folded manifests, the newest checkpoint may be the
    only witness of the high-water mark — minting below it would
    publish commits the checkpointed replay window never reads."""
    seq = 0
    if os.path.isdir(commits):
        for fn in os.listdir(commits):
            m = _MANIFEST_RE.match(fn) or _CHECKPOINT_RE.match(fn)
            if m:
                seq = max(seq, int(m.group(1)))
    return seq


def _write_claimed(
    path: str, body: dict, enforce_grace: bool = False, post_claim_guard=None
) -> str:
    """Atomically claim ``path`` with O_CREAT|O_EXCL (conditional-PUT
    semantics), stage the body in a sibling temp file, then publish it
    into the claim with one atomic rename. Returns ``"ok"``,
    ``"lost"`` (another writer owns the name), ``"stale"`` (the
    post-claim guard rejected the name), or ``"withdrawn"``.

    With ``enforce_grace`` (data manifests), the claim-to-staged gap is
    checked BEFORE the body ever becomes readable under the claimed
    name: a publish that stalled past half the dead-claim grace
    withdraws (unlink claim + temp) so no adjudicator can have read it
    as committed — checking after durability would leave a window where
    a checkpoint folds in a commit whose writer then withdraws (the
    phantom-commit race a second review pass caught). The remaining
    assumption is lease-shaped and explicit: the final rename itself
    completes within the other half of the grace.

    ``post_claim_guard`` runs AFTER the claim succeeds but BEFORE any
    body becomes readable; a False return withdraws the claim (unlink)
    and reports ``"stale"``. Because the guard observes the world while
    the (empty, fresh) claim already exists — and a fresh empty claim
    adjudicates in-flight, which stops every checkpoint fold before it
    — whatever invariant the guard establishes cannot be invalidated by
    a later checkpoint until the lease expires."""
    t0 = time.time()
    try:
        fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY, 0o644)
    except FileExistsError:
        return "lost"
    os.close(fd)  # claim holds the name; content stays empty until publish
    if post_claim_guard is not None and not post_claim_guard():
        try:
            os.unlink(path)
        except OSError:
            pass
        return "stale"
    tmp = f"{path}.{uuid.uuid4().hex}.tmp"
    fd = os.open(tmp, os.O_CREAT | os.O_WRONLY, 0o644)
    try:
        os.write(fd, json.dumps(body).encode("utf-8"))
        os.fsync(fd)
    finally:
        os.close(fd)
    if enforce_grace and time.time() - t0 > DEAD_CLAIM_GRACE_S / 2:
        for p in (tmp, path):
            try:
                os.unlink(p)
            except OSError:
                pass
        return "withdrawn"
    os.replace(tmp, path)
    # make the rename itself durable BEFORE the caller acknowledges:
    # without the directory fsync a power loss can revert an
    # acknowledged commit to an empty claim, which the grace rule would
    # then adjudicate dead (third review pass)
    _fsync_dir(os.path.dirname(path))
    return "ok"


def _fsync_dir(d: str) -> None:
    try:
        fd = os.open(d, os.O_RDONLY)
    except OSError:
        return  # platform without directory fds: best effort
    try:
        os.fsync(fd)
    except OSError:
        pass
    finally:
        os.close(fd)


def _newest_checkpoint_name_seq(commits: str) -> int:
    """Highest checkpoint sequence BY NAME (readability irrelevant —
    for the stale-claim guard, an unreadable corpse with a high name
    still proves a vacuum cutoff may sit at or above it)."""
    seqs = [
        int(m.group(1))
        for fn in os.listdir(commits)
        if (m := _CHECKPOINT_RE.match(fn))
    ]
    return max(seqs, default=0)


class RewriteConflict(Exception):
    """A conflicting operation (overwrite/replace/unknown content)
    committed between a rewrite's snapshot and its publish; the caller
    must retry from a fresh snapshot (optimistic concurrency — the
    Iceberg rewrite-files validation rule)."""


def _conflict_in_range(commits: str, after_seq: int, before_seq: int) -> bool:
    """True if any manifest in (after_seq, before_seq) could invalidate
    a rewrite snapshotted at ``after_seq``: a published overwrite or
    replace reorders against the rewrite's delete+add (replaying the
    rewrite AFTER a truncation would resurrect the replaced
    generation), and an in-flight/vanished entry has UNKNOWN content —
    only provably pure-append manifests (and dead claims) are
    harmless."""
    for seq in range(after_seq + 1, before_seq):
        path = os.path.join(commits, f"manifest-{seq:020d}.json")
        status, body = _read_manifest(path)
        if status == "ok":
            if body.get("overwrite") or body.get("replace"):
                return True
        elif status == "dead":
            continue
        elif status == "vanished":
            # withdrawn claims are harmless; a VACUUMED commit's content
            # is unknowable — conservative conflict (rare: needs a full
            # checkpoint+vacuum cycle inside the rewrite's window)
            if _newest_checkpoint_name_seq(commits) >= seq:
                return True
        else:
            return True  # in-flight: content unknown
    return False


def _publish_manifest(base: str, body: dict, snapshot_seq: int | None = None) -> int:
    """Publish one manifest under an exclusively-claimed sequence
    number. A lost claim retries with seq+1 (another committer
    progressed — always terminates). A WITHDRAWN publish (the host
    stalled past the lease margin, _write_claimed) is retried a bounded
    number of times and then raised: spinning forever on a host that
    cannot fsync within the grace would hang the sink silently.
    Returns the sequence number published.

    Stale-claim guard: a committer that read ``_max_seq`` and then
    stalled while >= CHECKPOINT_EVERY commits, a checkpoint, AND a
    vacuum all landed can O_CREAT|O_EXCL-claim a VACUUMED sequence
    number (the name is free again) at or below the deletion cutoff —
    its acknowledged commit would sit below every reader's checkpoint
    replay window, silently invisible forever. So after every
    successful claim and before the body becomes readable, re-check
    that the claimed seq is above the newest checkpoint name; a claim
    at/below it withdraws and retries at the current _max_seq + 1.
    Guard timing is sound because the guard runs while our fresh EMPTY
    claim exists: checkpoints adjudicate it in-flight and stop folding
    before it, so no checkpoint can pass our seq between the guard
    passing and the body publish (within the lease).

    ``snapshot_seq`` (rewrite publishes): the sequence the caller's
    live-map snapshot folded through. The post-claim guard then ALSO
    validates that no conflicting operation committed in
    (snapshot_seq, claimed) — raising :class:`RewriteConflict` so the
    caller retries from a fresh snapshot. Without this, a user
    INSERT OVERWRITE landing inside the rewrite's window would be
    silently undone: replay order puts the truncation BEFORE the
    rewrite's delete+add, resurrecting the replaced generation."""
    commits = os.path.join(base, _COMMITS_DIR)
    os.makedirs(commits, exist_ok=True)
    seq = _max_seq(commits) + 1
    withdrawals = 0
    conflict = False

    def _guard(claimed: int) -> bool:
        nonlocal conflict
        if claimed <= _newest_checkpoint_name_seq(commits):
            return False  # vacuum-recycled name: remint
        if snapshot_seq is not None and _conflict_in_range(
            commits, snapshot_seq, claimed
        ):
            conflict = True
            return False  # withdraw; surfaced as RewriteConflict below
        return True

    while True:
        claimed = seq
        status = _write_claimed(
            os.path.join(commits, f"manifest-{seq:020d}.json"),
            body,
            enforce_grace=True,
            post_claim_guard=lambda: _guard(claimed),
        )
        if conflict:
            raise RewriteConflict(
                f"conflicting commit in ({snapshot_seq}, {claimed}); "
                "retry the rewrite from a fresh snapshot"
            )
        if status == "ok":
            break
        if status == "stale":
            # the name was recycled by a vacuum below a newer checkpoint:
            # any seq we derived before stalling is untrustworthy — remint
            # from the current high-water mark (checkpoints count in it)
            seq = max(_max_seq(commits), seq) + 1
            continue
        if status == "withdrawn":
            withdrawals += 1
            if withdrawals >= 3:
                raise RuntimeError(
                    "manifest publish withdrew 3 times: the claim-to-"
                    f"durable gap keeps exceeding {DEAD_CLAIM_GRACE_S / 2:.0f}s "
                    "— this host/filesystem is too slow for the manifest "
                    "protocol's lease assumption"
                )
        seq += 1
    if seq % CHECKPOINT_EVERY == 0:
        # The manifest above is already durable and visible — the commit
        # HAS happened. The checkpoint is derived data (the next
        # CHECKPOINT_EVERY boundary or manifest_compact re-covers it), so
        # an IO failure here must not make an acknowledged commit look
        # failed: a caller retry would duplicate data.
        try:
            _publish_checkpoint(base, seq)
        except OSError as exc:
            import warnings

            warnings.warn(
                f"manifest commit {seq} succeeded but its derived "
                f"checkpoint publish failed ({exc}); readers replay a "
                "longer tail until the next checkpoint boundary",
                RuntimeWarning,
                stacklevel=2,
            )
    return seq


_OLD_STYLE_RE = re.compile(r"manifest-\d{20}-[0-9a-f]{32}\.json$")


def _age(path: str) -> float:
    try:
        return time.time() - os.path.getmtime(path)
    except OSError:
        return -1.0


def _read_manifest(path: str) -> tuple[str, dict | None]:
    """Read one manifest body and adjudicate four ways:

    - ``("ok", body)`` — parsed.
    - ``("vanished", None)`` — ENOENT: a withdrawn claim, or a manifest
      a concurrent vacuum just removed. The caller must RESTART its
      resolution from the newest checkpoint (which covers anything a
      vacuum may delete) rather than skip-and-continue — skipping a
      vacuumed COMMITTED manifest while replaying later ones would
      serve a hole in history (third review pass).
    - ``("dead", None)`` — provably never acknowledged: an EMPTY claim
      past the dead-claim grace (with stage-then-rename, a claim is
      either empty or complete JSON), or — back-compat — a TORN body
      under an old-build uuid-suffixed name past the grace (that build
      wrote bodies in place, so torn = crashed mid-write; without this
      a pre-upgrade crash would wedge replay forever).
    - ``("inflight", None)`` — anything we cannot positively clear: a
      fresh empty claim, a transient read OSError (an EIO on a
      long-committed manifest must NEVER fold as dead), or torn content
      under a new-style name (bit rot; replay stops conservatively)."""
    for attempt in range(5):
        try:
            with open(path, "rb") as fh:
                data = fh.read()
        except FileNotFoundError:
            return "vanished", None
        except OSError:
            data = None  # transient IO: retry, then inflight (stop)
        if data:
            try:
                return "ok", json.loads(data.decode("utf-8"))
            except (ValueError, UnicodeDecodeError):
                # torn content: old-build in-place writes age to dead
                if _OLD_STYLE_RE.search(path) and _age(path) > DEAD_CLAIM_GRACE_S:
                    return "dead", None
        elif data is not None:
            # empty claim: adjudicate age BEFORE burning retries so a
            # dead orphan never taxes every scan with the retry loop
            age = _age(path)
            if age < 0:
                return "inflight", None
            if age > DEAD_CLAIM_GRACE_S:
                return "dead", None
        if attempt < 4:
            time.sleep(0.01)
    return "inflight", None


def _read_json(path: str) -> dict | None:
    """Checkpoint-body reader (derived data: an unreadable checkpoint is
    simply not used; the next-older one or a longer tail replay covers)."""
    status, body = _read_manifest(path)
    return body if status == "ok" else None


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
    """Apply one manifest to the live map. Three ops compose:

    - ``overwrite`` + ``partitions``: logical TRUNCATE of whole
      partitions (INSERT OVERWRITE's intent — last writer wins);
    - ``replace``: remove exactly the NAMED files (the compaction
      rewrite's delete+add, Iceberg's rewrite-files snapshot shape —
      a concurrent commit's files in the same partition SURVIVE,
      which a partition-level overwrite would silently wipe);
    - ``files``: add files."""
    if body.get("overwrite"):
        for rel in body.get("partitions", []):
            live[rel] = set()
    for rel, names in body.get("replace", {}).items():
        live.setdefault(rel, set()).difference_update(names)
    for rel, names in body.get("files", {}).items():
        live.setdefault(rel, set()).update(names)


def _tail_entries(commits: str, start: int, upto: int | None = None) -> list:
    """Sorted (seq, filename) of manifests with start < seq [<= upto]."""
    out = []
    for fn in os.listdir(commits):
        m = _MANIFEST_RE.match(fn)
        if m:
            q = int(m.group(1))
            if q > start and (upto is None or q <= upto):
                out.append((q, fn))
    return sorted(out)


_RESOLVE_ATTEMPTS = 25


def _resolve(commits: str, upto: int | None = None) -> tuple[dict, int, int]:
    """Fold newest checkpoint + tail into (live, folded_seq, start_seq).

    A listed manifest that VANISHES mid-scan has exactly two causes,
    distinguished by a property the vacuum itself guarantees: vacuum
    only ever deletes sequences at/below a DURABLE checkpoint, so

    - a checkpoint name >= the vanished seq exists -> possibly a
      concurrent vacuum: RESTART from a fresh checkpoint listing (the
      newer checkpoint covers everything the vacuum deleted). Folding
      past it instead would serve a hole in history — under a
      fast-compacting maintenance daemon the old 3-attempt cap was hit
      in practice (the round-10 concurrency stress caught a reader
      observing a committed file vanish), so restarts now retry up to
      _RESOLVE_ATTEMPTS; each needs a FRESH checkpoint+vacuum pair to
      land inside the reader's millisecond tail scan, so the race
      probability decays geometrically. At exhaustion the fold STOPS at
      the gap (a stale-but-consistent prefix, never a hole).
    - no checkpoint at/above it -> it cannot have been vacuumed: a
      WITHDRAWN claim (its writer never acknowledged), folds through
      deterministically as a non-commit.

    The same adjudication applies to sequence numbers MISSING from the
    tail listing outright (not just vanishing mid-read): sequences are
    minted densely (every claim outcome — ok, lost, withdrawn — steps
    by one), so a gap between the checkpoint and the highest listed
    manifest is either a withdrawn claim or an already-vacuumed commit.
    This closes the silent-hole window the stress caught SECOND: a
    reader preempted between its checkpoint listing and its tail
    listing, while a fast maintenance daemon lands two checkpoint+vacuum
    cycles, simply never LISTS the vacuumed manifests — no read error
    fires, and without the density check the fold would skip them."""
    start = 0
    live: dict[str, set[str]] = {}
    folded = 0
    for _attempt in range(_RESOLVE_ATTEMPTS):
        start, live = _latest_checkpoint(commits)
        folded = start
        restart = False
        entries = dict(_tail_entries(commits, start, upto))
        top = max(entries, default=start)
        for seq in range(start + 1, top + 1):
            fn = entries.get(seq)
            if fn is None:
                # absent from the listing: withdrawn or vacuumed —
                # the same two-way adjudication as a mid-scan vanish
                if _newest_checkpoint_name_seq(commits) >= seq:
                    restart = True
                    break
                folded = seq  # provably never vacuumed: withdrawn claim
                continue
            status, body = _read_manifest(os.path.join(commits, fn))
            if status == "ok":
                _replay(live, body)
                folded = seq
            elif status == "dead":
                folded = seq  # never-acknowledged claim: fold past it
            elif status == "vanished":
                if _newest_checkpoint_name_seq(commits) >= seq:
                    restart = True  # vacuum suspect: newer checkpoint covers
                    break
                folded = seq  # provably not vacuumed: a withdrawn claim
            else:
                break  # in-flight: cannot adjudicate — stop here
        if not restart:
            return live, folded, start
    return live, folded, start  # exhausted: consistent prefix up to the gap


def _publish_checkpoint(base: str, upto: int) -> None:
    """Snapshot the live map, folding manifests in sequence order and
    STOPPING at the first in-flight one: a checkpoint must never fold
    out a claim whose writer might still acknowledge success (the
    data-loss race a review pass reproduced) — the checkpoint is
    published at the last cleanly-adjudicated sequence instead, and the
    next publisher extends it. Dead claims (past the grace; writer can
    never have acknowledged) fold through as non-commits. Derived data:
    an O_EXCL loser normally skips (the winner wrote the same fold),
    but a loser that finds the existing file UNREADABLE past the grace
    replaces the corpse in place — a checkpoint writer that crashed
    between claim and rename must not block compaction at that fold
    point forever."""
    commits = os.path.join(base, _COMMITS_DIR)
    live, folded, start = _resolve(commits, upto)
    if folded <= start:
        return
    path = os.path.join(commits, f"checkpoint-{folded:020d}.json")
    body = {"live": {rel: sorted(names) for rel, names in live.items()}}
    if _write_claimed(path, body) == "lost":
        if _read_json(path) is None and _age(path) > DEAD_CLAIM_GRACE_S:
            tmp = f"{path}.{uuid.uuid4().hex}.tmp"
            fd = os.open(tmp, os.O_CREAT | os.O_WRONLY, 0o644)
            try:
                os.write(fd, json.dumps(body).encode("utf-8"))
                os.fsync(fd)
            finally:
                os.close(fd)
            os.replace(tmp, path)
            _fsync_dir(commits)


def manifest_compact(base: str) -> None:
    """Explicit compaction: publish a checkpoint at the current head so
    the next reader replays zero tail manifests."""
    commits = os.path.join(base, _COMMITS_DIR)
    head = _max_seq(commits)
    if head:
        _publish_checkpoint(base, head)


def manifest_vacuum(base: str, keep_checkpoints: int = 2) -> int:
    """Delete log files no reader can need: manifests folded into the
    OLDEST RETAINED checkpoint (readers replay from the newest; older
    retained ones are crash insurance) and checkpoints beyond the
    newest ``keep_checkpoints``. Bounds the log's STORAGE the way
    checkpoints bound its read cost (Delta's log-retention /
    Iceberg's expire-snapshots role). Returns the number of files
    removed. Safe with concurrent readers of the retained checkpoints:
    only sequences ≤ an already-durable checkpoint are touched, and
    _max_seq counts checkpoints so sequence minting never regresses."""
    commits = os.path.join(base, _COMMITS_DIR)
    if not os.path.isdir(commits):
        return 0

    def _rm(fn: str) -> int:
        try:
            os.unlink(os.path.join(commits, fn))
            return 1
        except OSError:
            return 0

    # retention decisions use only checkpoints whose bodies READ BACK:
    # an empty corpse (writer crashed between claim and rename) must
    # never become the deletion cutoff — manifests it "covers" were
    # never folded anywhere, and deleting them would destroy committed
    # history (third review pass, reproduced)
    readable = sorted(
        int(m.group(1))
        for fn in os.listdir(commits)
        if (m := _CHECKPOINT_RE.match(fn))
        and _read_json(os.path.join(commits, fn)) is not None
    )
    if not readable:
        return 0
    retained = set(readable[-max(keep_checkpoints, 1):])
    cutoff = min(retained)
    removed = 0
    for fn in list(os.listdir(commits)):
        full = os.path.join(commits, fn)
        m = _MANIFEST_RE.match(fn)
        if m and int(m.group(1)) <= cutoff:
            removed += _rm(fn)
            continue
        m = _CHECKPOINT_RE.match(fn)
        if m and int(m.group(1)) not in retained:
            # readable-but-over-retention, or an aged unreadable corpse;
            # a FRESH unreadable checkpoint may still be mid-publish
            if _read_json(full) is not None or _age(full) > DEAD_CLAIM_GRACE_S:
                removed += _rm(fn)
            continue
        # staging leftovers from crashed writers (manifest/checkpoint
        # .tmp files) age out too — vacuum exists to bound storage
        if fn.endswith(".tmp") and _age(full) > DEAD_CLAIM_GRACE_S:
            removed += _rm(fn)
    return removed


def manifest_vacuum_data(
    base: str,
    older_than_s: float = 86400.0,
    enforce_retention_floor: bool = True,
) -> int:
    """Reclaim UNREFERENCED data files: anything on the data path that
    the current live resolution does not claim and whose mtime is older
    than ``older_than_s`` (Delta ``VACUUM ... RETAIN n HOURS`` /
    Iceberg remove_orphan_files). Two populations qualify: generations
    replaced by logical OVERWRITEs / rewrites, and crashed writers'
    orphans. The grace protects (a) files a healthy committer has moved
    into place but whose manifest has not published yet (that gap is
    lease-bounded: :func:`manifest_commit` renews the staging dir's
    mtime immediately before the move-publish step, so mtime age really
    does bound the publish gap even for a long-running writer) and
    (b) readers still scanning a snapshot that was live when their
    query planned — retention must exceed the longest query, the same
    operational rule Delta documents. Because mtime is the only guard,
    a retention below :data:`MIN_DATA_RETENTION_S` is REFUSED unless
    ``enforce_retention_floor=False`` (Delta's
    ``retentionDurationCheck`` role — a zero-retention run concurrent
    with an in-flight writer is a data-loss hazard). Returns the number
    of files removed. The log itself is bounded separately by
    :func:`manifest_vacuum`."""
    if enforce_retention_floor and older_than_s < MIN_DATA_RETENTION_S:
        raise ValueError(
            f"data-vacuum retention {older_than_s}s is below the safety "
            f"floor {MIN_DATA_RETENTION_S}s: files committed but not yet "
            "covered by a published manifest and live staging dirs are "
            "only mtime-protected, so a short retention concurrent with "
            "an in-flight writer can delete live data. Set table option "
            "'sink.vacuum.retention-check'='false' (or pass "
            "enforce_retention_floor=False) to override — safe only when "
            "no writer or long-running reader is active."
        )
    live = set(manifest_live_files(base))
    now = time.time()
    removed = 0
    for root, dirs, files in os.walk(base):
        keep_dirs = []
        for d in dirs:
            if d.startswith((".staging-", ".compact-")):
                # a crashed writer's staging dir: invisible to every
                # reader and never referenced — reclaim past the same
                # retention (a LIVE writer's staging is younger than any
                # sane retention; its files move out within the lease)
                p = os.path.join(root, d)
                try:
                    if now - os.path.getmtime(p) > older_than_s:
                        shutil.rmtree(p, ignore_errors=True)
                        removed += 1
                except OSError:
                    pass
                continue  # never descend into staging
            if not d.startswith((".", "_")):
                keep_dirs.append(d)
        dirs[:] = keep_dirs
        for f in files:
            if f.startswith((".", "_")):
                continue
            p = os.path.join(root, f)
            if p in live:
                continue
            try:
                if now - os.path.getmtime(p) > older_than_s:
                    os.unlink(p)
                    removed += 1
            except OSError:
                continue  # concurrently removed / transient: next pass
    return removed


def manifest_commit(base: str, staging: str, rels: list[str], overwrite: bool) -> None:
    """Move data files (already uniquely named by Spark's task-uuid part
    naming) into their final directories WITHOUT deleting anything, then
    atomically publish one manifest declaring them live. On an object
    store the move step disappears entirely — tasks write their final
    unique names directly and only the manifest publish remains."""
    # lease renewal: refresh the staging dir's mtime at the move-publish
    # boundary so a concurrent data vacuum's mtime-age check bounds the
    # true publish gap (a long write leaves the dir's mtime at job
    # start — files land in nested partition subdirs)
    try:
        os.utime(staging)
    except OSError:
        pass
    files: dict[str, list[str]] = {}
    for rel in rels:
        src = os.path.join(staging, rel) if rel else staging
        dst = os.path.join(base, rel) if rel else base
        os.makedirs(dst, exist_ok=True)
        names = _data_files(src)
        for f in names:
            final = os.path.join(dst, f)
            os.replace(os.path.join(src, f), final)
            # rename preserves the WRITE-time mtime — a task file from
            # hours ago would look vacuum-ably old while its manifest is
            # still unpublished; stamp move time so the retention clock
            # starts at commit, not at write
            try:
                os.utime(final)
            except OSError:
                pass
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
    """Resolve {rel: live file names}: newest checkpoint + tail replay
    in sequence order, STOPPING at the first in-flight manifest so the
    served snapshot is always a consistent PREFIX of the commit history
    (replaying seq N+1 while skipping an unreadable N would serve a
    state that never existed). Dead claims (see _read_manifest) skip
    through — they never committed. Read cost stays bounded by
    ``CHECKPOINT_EVERY`` tail manifests + one checkpoint regardless of
    the table's total commit count."""
    commits = os.path.join(base, _COMMITS_DIR)
    if not os.path.isdir(commits):
        return {}
    live, _folded, _start = _resolve(commits)
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
