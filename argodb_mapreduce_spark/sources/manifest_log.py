"""Log-structured manifest storage — Delta's ``_delta_log`` shape.

The versioned store's manifest was previously ONE JSON array
(``_snapshots.json``), rewritten wholesale per commit and parsed
wholesale per read: commit cost grew O(versions × segments), the
next driver-side bottleneck at years-of-daily-commits scale. This
module re-lays it out as:

``_log/{version:020d}.json``
    One file per commit holding that version's manifest entry —
    written with tmp+rename, so the RENAME is the atomic commit
    point (exactly one JSON append per commit, Delta's
    ``_delta_log/N.json``).

``_log/{version:020d}.checkpoint.json``
    Every ``CHECKPOINT_INTERVAL`` commits, the FULL entry list up to
    that version (Delta's periodic parquet checkpoint, JSON here —
    the entries are small dicts). Readers load the newest checkpoint
    and replay only the per-commit tail after it, so open cost is
    O(history)-once + O(interval), and per-commit write cost is O(1)
    amortized.

``_snapshots.json``
    Retained as an O(1) POINTER/MARKER file (``{"format": "log",
    "head": N}``): dozens of call sites use its existence as
    "table exists" and its mtime for fixture staleness — both keep
    working because every commit rewrites the tiny pointer. Tables
    written before this layout hold the full legacy array there;
    reads fall back to it and the first new commit migrates by
    checkpointing the legacy history into ``_log/``.

Concurrency: writers are serialized by the table commit lock (owned
by ``versioned.py``); readers are lock-free. A reader that races a
checkpoint's tail-pruning can hit a deleted per-commit file — it
retries the whole listing (bounded), the same way Delta readers
re-LIST after a metadata cleanup.

This module is dependency-light ON PURPOSE (os/json/tempfile only):
the Spark 4 Python DataSource imports it in contexts where the full
package (and pyspark) may be heavyweight to load.
"""

from __future__ import annotations

import json
import os
import tempfile

MARKER = "_snapshots.json"
LOG_DIR = "_log"
#: Write a checkpoint every N commits; per-commit cost stays O(1)
#: amortized while reads replay at most N per-commit files.
CHECKPOINT_INTERVAL = 16
#: Checkpoints kept on disk (the newest, plus the previous one for
#: readers that listed the directory just before a new checkpoint
#: landed and pruned the tail they were about to read).
_KEEP_CHECKPOINTS = 2
_READ_RETRIES = 5


def _entry_name(version: int) -> str:
    return f"{version:020d}.json"


def _ck_name(version: int) -> str:
    return f"{version:020d}.checkpoint.json"


def _write_json_atomic(dirpath: str, name: str, obj) -> None:
    fd, tmp = tempfile.mkstemp(dir=dirpath, prefix=name, suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(obj, f, indent=1)
        os.replace(tmp, os.path.join(dirpath, name))
    except BaseException:
        # Never leak the temp file: crash debris in a directory whose
        # whole point is bounded size (the reaper in _prune sweeps any
        # survivors from hard kills).
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise


def _touch_marker(path: str, head: int) -> None:
    """Rewrite the O(1) pointer file: existence = table exists, mtime =
    last-commit time (fixture staleness), content = where the real
    manifest lives."""
    _write_json_atomic(path, MARKER, {"format": "log", "head": head})


def _split_names(names):
    """(sorted checkpoint versions, sorted entry versions) from a
    ``_log/`` listing; tmp files and foreign names are ignored."""
    cks, ents = [], []
    for n in names:
        if n.endswith(".checkpoint.json"):
            v = n[: -len(".checkpoint.json")]
            if v.isdigit():
                cks.append(int(v))
        elif n.endswith(".json"):
            v = n[: -len(".json")]
            if v.isdigit():
                ents.append(int(v))
    return sorted(cks), sorted(ents)


def read_entries(path: str) -> list[dict]:
    """The full manifest entry list: newest checkpoint + per-commit tail
    replay; legacy single-array fallback for pre-log tables."""
    log_dir = os.path.join(path, LOG_DIR)
    if not os.path.isdir(log_dir):
        # Legacy layout: the marker IS the manifest array.
        with open(os.path.join(path, MARKER)) as f:
            legacy = json.load(f)
        if not isinstance(legacy, list):
            raise ValueError(
                f"{path}: marker is a log pointer but {LOG_DIR}/ is missing"
            )
        return legacy
    err = None
    for _ in range(_READ_RETRIES):
        try:
            cks, ents = _split_names(os.listdir(log_dir))
            entries: list[dict] = []
            ck_v = -1
            if cks:
                ck_v = cks[-1]
                with open(os.path.join(log_dir, _ck_name(ck_v))) as f:
                    entries = json.load(f)
            for v in ents:
                if v > ck_v:
                    with open(os.path.join(log_dir, _entry_name(v))) as f:
                        entries.append(json.load(f))
        except FileNotFoundError as e:
            # Raced a checkpoint's tail-prune (or a wholesale rewrite):
            # re-list and retry — the new state is always complete.
            err = e
            continue
        if entries:
            return entries
        # An EMPTY listing is a terminal state, not a prune race — it
        # never heals by re-listing, so it must not burn the retry
        # budget (nor surface as a raced-prune FileNotFoundError).
        # Crash window: a legacy migration created _log/ but died
        # before its first atomic rename landed. The marker still
        # holds the intact legacy array — serve it instead of
        # bricking the table.
        with open(os.path.join(path, MARKER)) as f:
            legacy = json.load(f)
        if isinstance(legacy, list) and legacy:
            return legacy
        raise ValueError(f"{log_dir}: empty manifest log")
    raise err


def head_entry(path: str) -> dict | None:
    """O(1) head manifest entry — the writer's plan-time hot path: the
    marker pointer names the head version, whose per-commit file is one
    small JSON read, no checkpoint replay. Legacy tables read the
    marker array's tail; a head whose per-commit file was already
    folded into a checkpoint falls back to the full replay. Raises
    FileNotFoundError for a fresh table (no marker). Lives HERE so the
    layout constants (MARKER/LOG_DIR/entry naming) have exactly one
    owner — a future layout change cannot desynchronize callers."""
    with open(os.path.join(path, MARKER)) as f:
        marker = json.load(f)
    if isinstance(marker, list):
        return marker[-1] if marker else None
    entry_path = os.path.join(path, LOG_DIR, _entry_name(int(marker["head"])))
    if os.path.exists(entry_path):
        with open(entry_path) as f:
            return json.load(f)
    return read_entries(path)[-1]


def append_entry(path: str, entries: list[dict]) -> None:
    """O(1)-amortized commit append: ``entries`` is the full list
    ENDING with the new entry (the caller just appended under the
    commit lock). Writes one per-commit file; every
    ``CHECKPOINT_INTERVAL`` commits also writes a checkpoint and prunes
    the replayed tail. A legacy table migrates on first append: its
    pre-append history becomes the first checkpoint."""
    log_dir = os.path.join(path, LOG_DIR)
    new = entries[-1]
    if not os.path.isdir(log_dir):
        os.makedirs(log_dir, exist_ok=True)
        if len(entries) > 1:
            # Legacy migration: checkpoint everything before the new
            # entry so the log is self-contained from its first file.
            _write_json_atomic(
                log_dir, _ck_name(entries[-2]["version"]), entries[:-1]
            )
    _write_json_atomic(log_dir, _entry_name(new["version"]), new)
    if new["version"] % CHECKPOINT_INTERVAL == 0 and len(entries) > 1:
        _write_json_atomic(log_dir, _ck_name(new["version"]), entries)
        _prune(log_dir)
    _touch_marker(path, new["version"])


def rewrite(path: str, entries: list[dict]) -> None:
    """Wholesale manifest replacement (vacuum, rollback fixtures,
    clone bootstrap, hand-built histories): the new state becomes one
    checkpoint at head; every other log file is dropped. O(history) —
    correct for maintenance ops, never on the commit hot path."""
    log_dir = os.path.join(path, LOG_DIR)
    os.makedirs(log_dir, exist_ok=True)
    head = entries[-1]["version"]
    _write_json_atomic(log_dir, _ck_name(head), entries)
    keep = {_ck_name(head)}
    for n in os.listdir(log_dir):
        if n not in keep and (n.endswith(".json")):
            try:
                os.remove(os.path.join(log_dir, n))
            except FileNotFoundError:
                pass
    _touch_marker(path, head)


def _prune(log_dir: str) -> None:
    """Post-checkpoint hygiene: keep the newest ``_KEEP_CHECKPOINTS``
    checkpoints and drop per-commit files already covered by the OLDEST
    kept one (in-flight readers of the previous checkpoint still find
    their tail; anything older retries into the new state)."""
    cks, ents = _split_names(os.listdir(log_dir))
    kept_cks = cks[-_KEEP_CHECKPOINTS:]
    floor = kept_cks[0] if kept_cks else -1
    doomed = [_ck_name(v) for v in cks[: -_KEEP_CHECKPOINTS]]
    doomed += [_entry_name(v) for v in ents if v <= floor]
    # Hard-kill debris: .tmp files from a writer killed mid-dump. Safe
    # to sweep here — writers serialize on the table commit lock, so no
    # live writer's temp exists while this holder prunes.
    doomed += [n for n in os.listdir(log_dir) if n.endswith(".tmp")]
    for n in doomed:
        try:
            os.remove(os.path.join(log_dir, n))
        except FileNotFoundError:
            pass
