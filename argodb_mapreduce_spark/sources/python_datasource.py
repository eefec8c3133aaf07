"""Custom Python DataSource for versioned tables — the Spark-4-native
re-expression of the reference's custom InputFormat (SURVEY.md §2.A).

The reference IS a Hadoop InputFormat: ``getSplits`` resolves a
snapshot to file-aligned splits (ArgodbMapreduceInputFormat.java:
104-199) and ``createRecordReader`` streams each split's rows
(ArgodbMapreduceRecordReader.java:121-169). Spark 4's Python DataSource
API is the exact native analogue, and this module maps the pieces 1:1:

================================  =====================================
reference InputFormat             Python DataSource here
================================  =====================================
setInput(db, table) + txn begin   DataSource(options) — path + version
getSplits: snapshot → rowsets →   DataSourceReader.partitions():
  file-aligned splits               manifest resolved at PLAN time →
  (splitRowSetsToFiles :156-158)    one InputPartition per parquet file
createRecordReader/nextKeyValue   read(partition): pyarrow record
  (row loop :121-169)               batches streamed per file
snapshot renew / RO locks         manifest pinned in the reader object
  (:257-279)                        — concurrent writes can't change a
                                    planned scan's file set
================================  =====================================

``read`` yields Arrow RecordBatches (the columnar fast path — the
analogue of the reference's ``ReadMode.BatchMode``, :292), not Python
tuples. Classes are defined inside a factory function so cloudpickle
ships them BY VALUE — executors cannot import this repo.

Scale: one partition per file gives the same parallelism contract as
the reference's file-aligned splits; a 100 TB versioned table fans out
to its file count, and Spark schedules partitions with the usual
locality/packing. Source-level DATA SKIPPING is implemented through an
immutable ``prune`` LOAD OPTION (JSON ``(col, op, literal)`` triples):
``partitions()`` drops every file whose manifest min/max provably
excludes the predicates — the same channel the reference uses for its
partition filter (a conf-passed string, ArgodbMapreduceInputFormat
.java:208-255), generalized to range predicates on any stats-bearing
column. Catalyst's ``pushFilters`` hook (4.1, off by default) is
deliberately NOT used: Spark's scan-reuse cache matches a later
unfiltered plan of the same relation to the pushed-down scan WITHOUT
re-invoking the reader (verified empirically — the stale pruned
partition list then silently drops rows), while load options are
pinned per relation, so every plan derived from one load() shares the
same predicates and cached-scan reuse stays correct by construction.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


from argodb_mapreduce_spark.functions.oracle_safe import sql_dsum as _sql_dsum
from argodb_mapreduce_spark.registry import register

FORMAT_NAME = "argodb_versioned"


def make_versioned_datasource():
    """Build the DataSource class. Everything needed executor-side is
    defined in this closure (pickled by value) or imported from
    packages the executors do have (pyspark, pyarrow, json, os)."""
    import json as _json
    import os as _os

    # Captured on the DRIVER at registration time and shipped by value:
    # the writer's commit worker prepends it to sys.path so the guarded
    # repo imports (stats harvest, commit lock) work even when the
    # worker's PYTHONPATH lacks the repo (same-machine local mode; a
    # real cluster with a different layout still degrades gracefully).
    _REPO_ROOT = _os.path.dirname(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    )

    def _manifest_log():
        """Import the dependency-light log-structured manifest module
        with the _REPO_ROOT sys.path guard: plan/commit run in
        driver-side data-source WORKER processes whose PYTHONPATH may
        lack the repo — same pattern as the commit-lock import. Defined
        in this closure so the classes pickle it BY VALUE (a module-
        level reference would unpickle-by-import and fail on workers)."""
        import sys as _sys

        if _REPO_ROOT not in _sys.path:
            _sys.path.insert(0, _REPO_ROOT)
        from argodb_mapreduce_spark.sources import manifest_log as _m

        return _m

    def _column_mapping_of(path):
        """(logical->physical map, retired physical names) from the
        table-properties sidecar — standalone os/json read, no package
        import (runs in the data-source worker). Empty = no mapping."""
        p = _os.path.join(path, "_properties.json")
        if not _os.path.exists(p):
            return {}, []
        with open(p) as f:
            props = _json.load(f)
        return (
            props.get("column_mapping", {}) or {},
            props.get("column_mapping_retired", []) or [],
        )

    def _resolve_mapping_for_write(path, field_names):
        """Plan-time logical->physical resolution for the pyds WRITER —
        the columnMapping WRITER feature (r13; the r12 gate refused all
        pyds/streaming writes the day a table got its first RENAME).
        Mapped logical names write their recorded PHYSICAL name; NEW
        logical columns identity-extend the mapping AT COMMIT (under
        the table lock) unless they collide with a live or retired
        physical name still present in data files — the same collision
        rule versioned._extend_column_mapping enforces. Returns
        ``(renames, new_logicals, mapping_snapshot)``; all empty when
        no mapping is active (zero overhead on the common path). The
        snapshot is re-checked at commit so a concurrent RENAME/DROP
        between plan and publish aborts instead of landing bytes under
        a stale physical name."""
        cmap, retired = _column_mapping_of(path)
        if not cmap and not retired:
            return {}, (), {}
        renames, new_logicals, snapshot = {}, [], {}
        live_phys = set(cmap.values())
        for name in field_names:
            if name in cmap:
                snapshot[name] = cmap[name]
                if cmap[name] != name:
                    renames[name] = cmap[name]
            elif name in live_phys or name in retired:
                raise ValueError(
                    f"{name!r} collides with a (possibly retired) "
                    "PHYSICAL column name still present in data files; "
                    "pick a different name"
                )
            else:
                new_logicals.append(name)
                snapshot[name] = name
        return renames, tuple(new_logicals), snapshot

    def _crypto(master_b64):
        """(CryptoFactory, KmsConnectionConfig) for parquet MODULAR
        ENCRYPTION keyed by ONE caller-supplied master key — the
        reference threads decryption keys through read options the same
        way (ArgodbMapreduceInputFormat.java:295). parquet-cpp does the
        real cryptography (AES-GCM data/metadata modules, fresh data
        key per file); this local KMS only WRAPS those data keys:
        mask = HMAC-SHA256(master, nonce), ct = DEK xor mask, plus an
        HMAC tag so a WRONG key fails loud at unwrap instead of feeding
        garbage to AES-GCM. Defined in-closure so executor pickles
        carry it by value (vanilla sessions cannot import this repo on
        Python workers)."""
        import base64 as _b64

        import pyarrow.parquet.encryption as _pe

        master = _b64.b64decode(master_b64)
        if len(master) < 16:
            raise ValueError(
                "encryptionKey must be base64 of at least 16 bytes"
            )

        class _HmacWrapKms(_pe.KmsClient):
            def __init__(self, config):
                super().__init__()

            def wrap_key(self, key_bytes, master_key_identifier):
                import hashlib as _hl
                import hmac as _hm
                import os as _osr

                nonce = _osr.urandom(16)
                mask = _hm.new(
                    master,
                    b"wrap|" + master_key_identifier.encode() + b"|" + nonce,
                    _hl.sha256,
                ).digest()
                ct = bytes(a ^ b for a, b in zip(key_bytes, mask))
                tag = _hm.new(
                    master, b"tag|" + nonce + ct, _hl.sha256
                ).digest()[:16]
                return _b64.b64encode(nonce + ct + tag).decode()

            def unwrap_key(self, wrapped_key, master_key_identifier):
                import hashlib as _hl
                import hmac as _hm

                raw = _b64.b64decode(wrapped_key)
                nonce, ct, tag = raw[:16], raw[16:-16], raw[-16:]
                want = _hm.new(
                    master, b"tag|" + nonce + ct, _hl.sha256
                ).digest()[:16]
                if not _hm.compare_digest(tag, want):
                    raise ValueError(
                        "encryption key mismatch: the supplied "
                        "encryptionKey cannot unwrap this file's data key"
                    )
                mask = _hm.new(
                    master,
                    b"wrap|" + master_key_identifier.encode() + b"|" + nonce,
                    _hl.sha256,
                ).digest()
                return bytes(a ^ b for a, b in zip(ct, mask))

        return (
            _pe.CryptoFactory(lambda config: _HmacWrapKms(config)),
            _pe.KmsConnectionConfig(),
        )

    def _encryption_properties(master_b64, schema, enc_cols=None):
        """Per-FILE encryption properties (never reused — each call
        generates fresh data keys): every leaf column encrypted under
        the footer key, PLAINTEXT footer so schema and row counts stay
        keyless-readable (ledger harvest, describe_detail, time-travel
        planning) while column chunk metadata — min/max stats included
        — stays encrypted; the manifest records NO stats for encrypted
        segments, so nothing about the data leaks (pruning is the
        documented trade for confidentiality)."""
        import io as _io

        import pyarrow.parquet as _pq
        import pyarrow.parquet.encryption as _pe

        # Leaf paths (a nested column encrypts per leaf, e.g.
        # emb.list.element) derived from an empty in-memory footer.
        buf = _io.BytesIO()
        with _pq.ParquetWriter(buf, schema):
            pass
        pqs = _pq.ParquetFile(_io.BytesIO(buf.getvalue())).schema
        leaves = [pqs.column(i).path for i in range(len(pqs))]
        if enc_cols is not None:
            # COLUMN-level encryption (r14): only leaves under the
            # listed top-level columns are encrypted; the rest stay
            # plaintext, keyless-readable by projection.
            want = set(enc_cols)
            leaves = [p for p in leaves if p.split(".")[0] in want]
            if not leaves:
                raise ValueError(
                    "encryptColumns matches no leaf column in the "
                    "write schema"
                )
        cf, cfg = _crypto(master_b64)
        return cf.file_encryption_properties(
            cfg,
            _pe.EncryptionConfiguration(
                footer_key="k0",
                plaintext_footer=True,
                column_keys={"k0": leaves},
            ),
        )

    def _decryption_properties(master_b64):
        """(decryption properties, factory). The factory must stay
        referenced while reads run — unwrap happens lazily through its
        callback."""
        cf, cfg = _crypto(master_b64)
        return cf.file_decryption_properties(cfg), cf

    def _head_entry(path):
        """O(1) head manifest entry on the write-plan hot path —
        delegates to manifest_log.head_entry so the log layout
        (marker/dir/entry naming) has exactly one owner and a future
        layout change cannot silently desynchronize this probe.
        Raises FileNotFoundError for a fresh table."""
        return _manifest_log().head_entry(path)

    def _key_fp_of(master_b64):
        """SELF-CONTAINED key fingerprint — wire-identical to
        versioned.key_fingerprint (HMAC-SHA256(master, constant)[:16]),
        re-derived locally because this runs inside DataSource
        reader()/writer() methods that execute in Python WORKER
        processes which cannot import this repo."""
        import base64 as _b64
        import hashlib as _hl
        import hmac as _hm

        return _hm.new(
            _b64.b64decode(master_b64), b"argodb-key-fingerprint", _hl.sha256
        ).hexdigest()[:16]

    def _read_keys_json(path):
        """The table's ``_keys.json`` rotation sidecar (r14), or None
        for legacy direct-wrap tables. SELF-CONTAINED — wire-identical
        to versioned._read_keys_sidecar."""
        import json as _jn

        p = _os.path.join(path, "_keys.json")
        if not _os.path.exists(p):
            return None
        with open(p) as f:
            return _jn.load(f)

    def _kek_unwrap(master_b64, blob):
        """Unwrap the table KEK with the master — the same HMAC
        envelope the file-DEK KMS uses (key_id 'kek'); a wrong master
        fails the tag check loudly."""
        import base64 as _b64
        import hashlib as _hl
        import hmac as _hm

        master = _b64.b64decode(master_b64)
        raw = _b64.b64decode(blob)
        nonce, ct, tag = raw[:16], raw[16:-16], raw[-16:]
        want = _hm.new(master, b"tag|" + nonce + ct, _hl.sha256).digest()[:16]
        if not _hm.compare_digest(tag, want):
            raise ValueError(
                "encryption key mismatch: the supplied encryptionKey "
                "cannot unwrap this table's key-encryption key"
            )
        mask = _hm.new(
            master, b"wrap|kek|" + nonce, _hl.sha256
        ).digest()
        return bytes(a ^ b for a, b in zip(ct, mask))

    def _kek_wrap(master_b64, payload):
        """Inverse of :func:`_kek_unwrap` — wire-identical to
        versioned._hmac_wrap(master, 'kek', payload)."""
        import base64 as _b64
        import hashlib as _hl
        import hmac as _hm
        import os as _osr

        master = _b64.b64decode(master_b64)
        nonce = _osr.urandom(16)
        mask = _hm.new(
            master, b"wrap|kek|" + nonce, _hl.sha256
        ).digest()
        ct = bytes(a ^ b for a, b in zip(payload, mask))
        tag = _hm.new(master, b"tag|" + nonce + ct, _hl.sha256).digest()[:16]
        return _b64.b64encode(nonce + ct + tag).decode()

    def _resolve_wrap_key(path, master_b64):
        """Master key -> effective WRAP key (r14 rotation): with a key
        sidecar, file DEKs are wrapped under a per-table KEK that the
        master unwraps — so rotate_encryption_key re-wraps one 32-byte
        secret and every historical file reads under the NEW master.
        A rotated-out or unknown master fails here at plan time. Legacy
        tables (no sidecar) keep the master as the wrap key."""
        import base64 as _b64

        sidecar = _read_keys_json(path)
        if sidecar is None:
            return master_b64
        rec = (sidecar.get("keks") or {}).get(_key_fp_of(master_b64))
        if rec is None:
            raise ValueError(
                "encryptionKey does not match any master key this "
                "table's key sidecar knows (key-fingerprint lookup "
                "failed)"
            )
        if rec.get("retired"):
            raise ValueError(
                "this master key was ROTATED OUT of the table; reads "
                "and writes require the current master key"
            )
        return _b64.b64encode(_kek_unwrap(master_b64, rec["wrapped"])).decode()

    def _check_key_fp(meta, enc_key, path=None):
        """Plan-time wrong-key rejection for READS: when the manifest
        recorded the master's fingerprint, a mismatched key fails here
        with a clear error instead of N tasks later at HMAC unwrap.
        Pre-fingerprint entries (no key_fp) skip — unwrap still fails
        loud for them. With a rotation sidecar (r14) the sidecar is the
        authority: the supplied master must be known and un-retired,
        and must share the KEK lineage (kek_id) of the version being
        read — so pre-rotation versions read under the post-rotation
        master, while a different-lineage key is still rejected."""
        if path is not None:
            sidecar = _read_keys_json(path)
            if sidecar:
                rec = (sidecar.get("keks") or {}).get(_key_fp_of(enc_key))
                if rec is None:
                    raise ValueError(
                        "encryptionKey does not match any master key "
                        "this table's key sidecar knows (key-"
                        "fingerprint lookup failed)"
                    )
                if rec.get("retired"):
                    raise ValueError(
                        "this master key was ROTATED OUT of the table; "
                        "reads require the current master key"
                    )
                efp = meta.get("key_fp") if meta else None
                erec = (sidecar.get("keks") or {}).get(efp) if efp else None
                if erec and erec.get("kek_id") != rec.get("kek_id"):
                    raise ValueError(
                        "encryptionKey belongs to a different key "
                        "lineage than the one this version was "
                        "encrypted under"
                    )
                return
        fp = meta.get("key_fp") if meta else None
        if fp and _key_fp_of(enc_key) != fp:
            raise ValueError(
                "encryptionKey does not match the master key this "
                "version is encrypted under (manifest key-"
                "fingerprint mismatch)"
            )

    def _check_encryption_transition(
        head, enc_key, overwrite, path, enc_cols=None
    ):
        """The mixed-version gates, shared by the plan-time fast-fail
        and the authoritative under-lock commit check."""
        head_enc = bool(head and head.get("encrypted"))
        # COLUMN-level encryption (r14): an append must keep the head's
        # exact encrypted-column set — widening it would leave earlier
        # files' values plaintext on disk (a silent confidentiality
        # hole), narrowing it would leak new rows of a protected
        # column, and either would break the keyless plaintext-subset
        # projection contract mid-table.
        if not overwrite and head_enc and enc_key:
            head_cols = sorted(head.get("enc_columns") or [])
            if head_cols != sorted(enc_cols or []):
                raise ValueError(
                    "append's encryptColumns must match the head "
                    f"version's encrypted-column set {head_cols or '(full table)'}; "
                    "changing the confidentiality shape requires an "
                    "overwrite"
                )
        if not overwrite and head_enc and not enc_key:
            raise ValueError(
                "the head version is parquet-modular-encrypted; "
                "appends must pass option('encryptionKey', ...)"
            )
        if not overwrite and enc_key and head is not None and not head_enc:
            raise ValueError(
                "cannot append ENCRYPTED segments onto a plaintext "
                "head: the mixed version would need per-file read "
                "options; overwrite, or write to a new table"
            )
        # Key IDENTITY gate (ADVICE r13): an append wrapped under a
        # DIFFERENT master than the head's would commit a version no
        # single key can read in full — reject by manifest fingerprint.
        # Pre-fingerprint entries (no key_fp) skip; unwrap still fails
        # loud for them.
        if not overwrite and head_enc and enc_key and head.get("key_fp"):
            if _key_fp_of(enc_key) != head["key_fp"]:
                # Sidecar lineage check before refusing: after a
                # rotation CRASHED between its sidecar write and its
                # manifest append, the head still carries the OLD
                # master's fingerprint while only the NEW master is
                # live — both resolve to the SAME KEK (same kek_id),
                # so an append under the new master is safe and HEALS
                # the head's fingerprint. A genuinely different master
                # (different or no lineage) is still refused.
                sidecar = _read_keys_json(path)
                ours = (sidecar or {}).get("keks", {}).get(
                    _key_fp_of(enc_key)
                )
                theirs = (sidecar or {}).get("keks", {}).get(
                    head["key_fp"]
                )
                same_lineage = (
                    ours is not None
                    and not ours.get("retired")
                    and theirs is not None
                    and ours.get("kek_id") == theirs.get("kek_id")
                )
                if not same_lineage:
                    raise ValueError(
                        "encryptionKey does not match the master key "
                        "the head version is encrypted under (manifest "
                        "key-fingerprint mismatch); appending files "
                        "wrapped under a different master would make "
                        "the version unreadable by any single key"
                    )

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceArrowWriter,
        DataSourceReader,
        DataSourceStreamReader,
        InputPartition,
        WriterCommitMessage,
    )

    class SegmentFilePartition(InputPartition):
        def __init__(self, path: str, excluded=(), parts=()):
            self.path = path
            # Tombstoned row positions from the version's deletion
            # vector (merge-on-read): dropped during read().
            self.excluded = excluded
            # Hive partition values decoded from the file's directory
            # branch at PLAN time: ((col, raw_string_or_None,
            # ledger_type_str), ...) triples — None is the reference's
            # NULL sentinel directory
            # (ArgodbMapreduceRecordReader.java:172-198). read() appends
            # them as constant typed columns, the record-reader
            # partition-value append re-expressed.
            self.parts = parts

    class CDFPartition(InputPartition):
        """One change-feed unit: an appended file (kind='insert'), the
        deleted positions of one file from a DV delta (kind='delete',
        positions = sorted row indices), a dropped/removed file's live
        rows (kind='drop', positions = masked-out prior tombstones), a
        restore-readded file's live rows (kind='add', positions =
        masked-out current tombstones), or un-tombstoned positions a
        restore resurrected (kind='revive')."""

        def __init__(self, kind: str, path: str, version: int, positions=None, parts=()):
            self.kind = kind
            self.path = path
            self.version = version
            self.positions = positions
            self.parts = parts

    def _stat_decode_local(v):
        # Parity twin of versioned._stat_decode, inlined so the pickled
        # classes stay repo-import-free.
        import datetime as _ldt

        if isinstance(v, dict):
            if v["t"] == "ts":
                return _ldt.datetime.fromisoformat(v["v"])
            if v["t"] == "date":
                return _ldt.date.fromisoformat(v["v"])
            raise ValueError(f"unknown stat tag {v['t']!r}")
        return v

    _HIVE_NULL_LOCAL = "__HIVE_DEFAULT_PARTITION__"

    def _decode_branch(rel: str) -> dict:
        """{col -> raw_or_None} from one Hive directory branch ('.' or
        'a=1/b=x'): percent-decode, NULL sentinel -> None. The single
        copy of the branch-decoding convention for this module."""
        from urllib.parse import unquote as _unq

        pairs = {}
        if rel != ".":
            for comp in rel.split(_os.sep):
                if "=" in comp:
                    c, v = comp.split("=", 1)
                    v = _unq(v)
                    pairs[c] = None if v == _HIVE_NULL_LOCAL else v
        return pairs

    def _decode_part_value(raw, type_str):
        """Directory-name string -> typed Python value per the manifest
        schema ledger (the reference record reader's partition-value
        decode, ArgodbMapreduceRecordReader.java:172-198). None stays
        None (NULL sentinel). Unknown types stay strings — Spark's own
        partition discovery has the same string fallback."""
        import datetime as _ldt

        if raw is None:
            return None
        t = (type_str or "string").lower()
        if t in ("tinyint", "smallint", "int", "bigint"):
            return int(raw)
        if t == "date":
            return _ldt.date.fromisoformat(raw)
        if t in ("double", "float"):
            return float(raw)
        if t == "boolean":
            return raw.lower() == "true"
        return raw

    def _walk_partition_files(seg_dir: str, part_cols) -> list:
        """[(file_path, ((col, raw_or_None), ...)), ...] for one
        Hive-partitioned segment: partition values decoded from the
        directory branch of each parquet file, NULL sentinel -> None."""
        out = []
        for root, _dirs, fs in sorted(_os.walk(seg_dir)):
            pairs = _decode_branch(_os.path.relpath(root, seg_dir))
            parts = tuple((c, pairs.get(c)) for c in part_cols)
            for f in sorted(fs):
                if f.endswith(".parquet"):
                    out.append((_os.path.join(root, f), parts))
        return sorted(out)

    def _decoded_stats(raw):
        """Manifest per-column [min,max] -> decoded Python values, or
        None when the segment recorded no stats. ONE copy for the batch
        resolver and the stream planner, so their prune semantics
        cannot drift."""
        if not raw:
            return None
        return {
            c: [_stat_decode_local(mn), _stat_decode_local(mx)]
            for c, (mn, mx) in raw.items()
        }

    def _tighten_with_parts(stats, parts):
        """File-precise stats: each partition value becomes an exact
        [v, v] bound (NULL branches contribute none — conservative
        keep, the residual row filter drops them). Shared by the batch
        resolver and the stream planner."""
        out = dict(stats or {})
        for c, raw, t in parts:
            tv = _decode_part_value(raw, t)
            if tv is not None:
                out[c] = [tv, tv]
        return out

    def _resolve_files(path: str, version: int | None):
        """(ordered file list, {file -> decoded per-column [min,max]},
        {file -> deleted row positions from the deletion vector},
        {file -> ((partition col, raw value), ...)},
        {partition col -> simpleString type from the schema ledger},
        {"evolved": bool, "ledger": ordered {col -> simpleString} union
         across the version's segments — drives ADD-column evolution:
         an evolved version engages the reorder/backfill emit path and
         schema() appends ledger columns the first file lacks}).

        Stats ride the manifest (harvested at write time from parquet
        footers); they are decoded here at PLAN time so pushed-filter
        pruning in ``partitions()`` is pure metadata — no file opened.
        For a Hive-partitioned segment (r10 layout, versioned.py
        partition_by) every parquet file is walked out of its
        ``col=value`` directory branch and the decoded value becomes
        BOTH the file's exact per-column stat (equality/range pruning
        on partition columns is file-precise) and a constant column
        appended at read() time — the reference's file-aligned splits +
        record-reader partition append, including the NULL sentinel."""
        cmap, retired = _column_mapping_of(path)
        renames = {ph: l for l, ph in cmap.items() if ph != l}
        mapping_active = bool(renames or retired)
        entries = _manifest_log().read_entries(path)
        by_version = {e["version"]: e for e in entries}
        if version is None or version < 0:
            version = entries[-1]["version"]
        if version not in by_version:
            raise ValueError(f"unknown version {version}; have {sorted(by_version)}")
        entry = by_version[version]
        seg_ledgers = entry.get("schemas", {})
        ledger_union: dict = {}
        for seg in entry["segments"]:
            for c, t in seg_ledgers.get(seg, {}).items():
                ledger_union.setdefault(c, t)
        evolved = (
            len({_json.dumps(seg_ledgers.get(s, {}), sort_keys=True) for s in entry["segments"]})
            > 1
        )
        files, file_stats, file_parts, part_types = [], {}, {}, {}
        for seg in entry["segments"]:
            seg_dir = _os.path.join(path, seg)
            decoded = _decoded_stats(entry.get("stats", {}).get(seg))
            part_cols = entry.get("partition_by", {}).get(seg) or ()
            ledger = entry.get("schemas", {}).get(seg, {})
            for c in part_cols:
                part_types.setdefault(c, ledger.get(c, "string"))
            if not part_cols:
                for f in sorted(_os.listdir(seg_dir)):
                    if f.endswith(".parquet"):
                        fp = _os.path.join(seg_dir, f)
                        files.append(fp)
                        file_stats[fp] = decoded
                continue
            for fp, parts in _walk_partition_files(seg_dir, part_cols):
                files.append(fp)
                file_parts[fp] = parts
                pstats = _tighten_with_parts(
                    decoded,
                    [(c, v, part_types.get(c)) for c, v in parts],
                )
                file_stats[fp] = pstats or None
        # Merge-on-read parity with snapshot_read: the version's
        # deletion vector resolves to per-file tombstoned positions at
        # PLAN time (DVs are O(deleted rows), read with pyarrow).
        dv_excluded: dict = {}
        if entry.get("dv"):
            dv_excluded = _dv_positions_local(path, entry["dv"])
        meta = {
            "evolved": evolved,
            "ledger": ledger_union,
            # Column mapping (r12): readers resolve logical<->physical
            # through these; empty/false = identity, zero overhead.
            "cmap": cmap,
            "renames": renames,
            "mapping_active": mapping_active,
            # Parquet modular encryption (r13): reads of this version
            # REQUIRE option('encryptionKey', ...).
            "encrypted": bool(entry.get("encrypted")),
            "key_fp": entry.get("key_fp"),
            "enc_columns": entry.get("enc_columns"),
        }
        return files, file_stats, dv_excluded, file_parts, part_types, meta

    def _local_path(fp: str) -> str:
        """``_metadata.file_path`` -> plain filesystem path: strip the
        scheme AND percent-decode (a partition value with a space is
        %20-encoded in the metadata column but not on disk)."""
        from urllib.parse import unquote as _unq

        if ":" in fp:
            fp = "/" + fp.split(":", 1)[-1].lstrip("/")
        return _unq(fp)

    def _dv_positions_local(path: str, dv_name: str) -> dict:
        """{local_file_path -> sorted tuple of deleted row positions}."""
        import glob as _glob

        import pyarrow.parquet as pq

        per_file: dict = {}
        for f in sorted(_glob.glob(_os.path.join(path, dv_name, "*.parquet"))):
            t = pq.read_table(f, columns=["file_path", "row_index"])
            for fp, ri in zip(
                t.column("file_path").to_pylist(), t.column("row_index").to_pylist()
            ):
                per_file.setdefault(_local_path(fp), set()).add(ri)
        return {fp: tuple(sorted(s)) for fp, s in per_file.items()}

    def _coerce_lit(lit, stat_sample):
        """Make an option-passed literal (JSON: str/int/float) or a
        datetime comparable with the decoded stat values — parity twin
        of versioned._coerce_literal plus naive-UTC normalization."""
        import datetime as _ldt

        if isinstance(lit, _ldt.datetime) and lit.tzinfo is not None:
            lit = lit.astimezone(_ldt.timezone.utc).replace(tzinfo=None)
        if isinstance(stat_sample, _ldt.datetime) and isinstance(lit, str):
            return _ldt.datetime.fromisoformat(lit)
        if isinstance(stat_sample, _ldt.datetime) and type(lit) is _ldt.date:
            return _ldt.datetime(lit.year, lit.month, lit.day)
        if type(stat_sample) is _ldt.date and isinstance(lit, str):
            return _ldt.date.fromisoformat(lit)
        return lit

    def _stats_may_match(stats, pushed) -> bool:
        """Conservative segment-stat test, parity twin of
        versioned._segment_may_match: True unless some pushed predicate
        PROVABLY excludes every row. Missing stats / incomparable types
        keep the file."""
        if not stats:
            return True
        for col, op, lit in pushed:
            if col not in stats:
                continue
            mn, mx = stats[col]
            try:
                lit = _coerce_lit(lit, mn)
                if op == "=" and not (mn <= lit <= mx):
                    return False
                if op == "<" and not (mn < lit):
                    return False
                if op == "<=" and not (mn <= lit):
                    return False
                if op == ">" and not (mx > lit):
                    return False
                if op == ">=" and not (mx >= lit):
                    return False
            except (TypeError, ValueError):
                continue  # incomparable/malformed literal: conservative keep
        return True

    def _us_schema(schema):
        """Arrow schema with every ns timestamp demoted to µs. Spark's
        Arrow bridge rejects Timestamp(NANOSECOND) batches, and
        pandas-written lakes are full of them; truncating to µs is the
        same normalization DuckDB and catalog.read_parquet_any apply,
        so values stay engine-identical."""
        import pyarrow as pa

        fields = [
            f.with_type(pa.timestamp("us", tz=f.type.tz))
            if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
            else f
            for f in schema
        ]
        return pa.schema(fields)

    def _cast_batches_to_us(pf, row_groups=None, columns=None):
        """Stream a ParquetFile's batches cast to the µs-normalized
        schema; zero-row batches are skipped (to_batches() on an empty
        table is empty — the latent [0] IndexError). ``row_groups``
        bounds the read to a row-group subset (row-group skipping);
        ``columns`` bounds it to a top-level column subset (requested
        in FILE order so the cast target is unambiguous) — the pyds
        projection path, and the only legal way to read a
        COLUMN-encrypted file keyless."""
        import pyarrow as pa

        full = _us_schema(pf.schema_arrow)
        if columns is not None:
            want = set(columns)
            cols = [n for n in pf.schema_arrow.names if n in want]
            target = pa.schema([full.field(n) for n in cols])
        else:
            cols = None
            target = full
        kw = {}
        if row_groups is not None:
            kw["row_groups"] = row_groups
        if cols is not None:
            kw["columns"] = cols
        it = pf.iter_batches(**kw)
        for batch in it:
            if batch.num_rows == 0:
                continue
            if batch.schema != target:
                batch = (
                    pa.Table.from_batches([batch])
                    .cast(target, safe=False)
                    .combine_chunks()
                    .to_batches()[0]
                )
            yield batch

    def _select_row_groups(pf, pushed):
        """ROW-GROUP skipping (one granularity below the manifest's
        file-level stats, the reference's rowset-level skip): keep only
        the row groups whose parquet column statistics may match the
        pushed predicates, via the SAME conservative test the file
        level uses. Returns (kept_indices, their_start_offsets) — the
        offsets are GLOBAL row positions within the file, so deletion-
        vector masking by (file, row_index) stays correct when groups
        are skipped. O(row groups) footer metadata, no data read."""
        md = pf.metadata
        keep, offsets, off = [], [], 0
        for i in range(md.num_row_groups):
            rg = md.row_group(i)
            stats = {}
            for j in range(rg.num_columns):
                c = rg.column(j)
                s = c.statistics
                if s is not None and s.has_min_max:
                    stats[c.path_in_schema] = [s.min, s.max]
            if _stats_may_match(stats or None, pushed):
                keep.append(i)
                offsets.append(off)
            off += rg.num_rows
        return keep, offsets

    def _split_top(s: str) -> list:
        """Split on commas at bracket depth 0. Tracks angle brackets
        AND parentheses: a decimal(p,s) nested inside struct<>/map<>
        carries a comma inside its own parens that must not split."""
        out, depth, cur = [], 0, []
        for ch in s:
            if ch in "<(":
                depth += 1
            elif ch in ">)":
                depth -= 1
            if ch == "," and depth == 0:
                out.append("".join(cur))
                cur = []
            else:
                cur.append(ch)
        if cur:
            out.append("".join(cur))
        return out

    def _arrow_type_full(type_str: str):
        """Spark simpleString -> Arrow type, JVM-free (schema() runs in
        the data-source planner worker, which has no SparkContext, so
        pyspark's DDL parser is unavailable). Covers everything
        versioned_write's ledger records: primitives, decimal, array,
        map, struct. Timestamps map to µs (the store's normalization);
        plain 'timestamp' is LTZ, hence tz=UTC."""
        import pyarrow as pa

        t = type_str.strip()
        prim = {
            "boolean": pa.bool_(),
            "tinyint": pa.int8(),
            "smallint": pa.int16(),
            "int": pa.int32(),
            "bigint": pa.int64(),
            "float": pa.float32(),
            "double": pa.float64(),
            "string": pa.string(),
            "binary": pa.binary(),
            "date": pa.date32(),
            "timestamp": pa.timestamp("us", tz="UTC"),
            "timestamp_ntz": pa.timestamp("us"),
            "void": pa.null(),
        }
        if t in prim:
            return prim[t]
        if t.startswith("decimal(") and t.endswith(")"):
            p, s = (int(x) for x in t[8:-1].split(","))
            return pa.decimal128(p, s)
        if t.startswith("array<") and t.endswith(">"):
            return pa.list_(_arrow_type_full(t[6:-1]))
        if t.startswith("map<") and t.endswith(">"):
            k, v = _split_top(t[4:-1])
            return pa.map_(_arrow_type_full(k), _arrow_type_full(v))
        if t.startswith("struct<") and t.endswith(">"):
            fields = []
            for part in _split_top(t[7:-1]):
                name, ft = part.split(":", 1)
                fields.append((name.strip(), _arrow_type_full(ft)))
            return pa.struct(fields)
        raise ValueError(f"unsupported ledger type {type_str!r}")

    def _arrow_type_of(type_str):
        """Spark simpleString -> Arrow type for a PARTITION column (the
        directory-encodable types; unknowns fall back to string, the
        same fallback Spark's partition discovery uses)."""
        import pyarrow as pa

        return {
            "tinyint": pa.int8(),
            "smallint": pa.int16(),
            "int": pa.int32(),
            "bigint": pa.int64(),
            "string": pa.string(),
            "date": pa.date32(),
            "double": pa.float64(),
            "float": pa.float32(),
            "boolean": pa.bool_(),
        }.get((type_str or "string").lower(), pa.string())

    def _synth_batch(n, parts, col_order, col_types=None, renames=None):
        """An n-row batch built ENTIRELY from partition constants and
        NULL backfills — the projection path when no projected column
        physically lives in the file (e.g. partition-only projections,
        keyless reads where the file holds only encrypted columns)."""
        import pyarrow as pa

        arrays = {}
        for c, raw, type_str in parts or ():
            tv = _decode_part_value(raw, type_str)
            t = _arrow_type_of(type_str)
            name = renames.get(c, c) if renames else c
            arrays[name] = (
                pa.nulls(n, t) if tv is None else pa.array([tv] * n, type=t)
            )
        for name in col_order or ():
            if name not in arrays:
                if not col_types or name not in col_types:
                    raise ValueError(
                        f"plan column {name!r} has no partition value "
                        "and no plan type to NULL-backfill it"
                    )
                arrays[name] = pa.nulls(n, col_types[name])
        return pa.RecordBatch.from_arrays(
            [arrays[name] for name in col_order], names=list(col_order)
        )

    def _emit_batch(batch, parts, col_order, col_types=None, renames=None):
        """Append the split's partition values as constant typed columns
        (NULL sentinel -> null column) and reorder to the plan schema —
        the record reader's partition-value append
        (ArgodbMapreduceRecordReader.java:172-198). ``col_order`` is
        None for all-flat tables: the batch passes through untouched
        (zero overhead on the common path). A plan column the file
        lacks entirely (ADD-column schema evolution) NULL-backfills
        from ``col_types`` (plan-schema Arrow types), matching the
        native reader's unionByName(allowMissingColumns=True)."""
        if renames:
            # Column mapping: physical file columns rename to their
            # logical plan names first; retired (dropped) physicals
            # keep their names and fall out in the plan-order reorder
            # below (mapping-active plans always set col_order).
            import pyarrow as _pa

            names = [renames.get(n, n) for n in batch.schema.names]
            if names != list(batch.schema.names):
                batch = _pa.RecordBatch.from_arrays(
                    list(batch.columns), names=names
                )
        if not col_order:
            return batch
        if not parts and batch.schema.names == list(col_order):
            return batch  # flat file already in plan order: passthrough
        import pyarrow as pa

        n = batch.num_rows
        arrays = dict(zip(batch.schema.names, batch.columns))
        for c, raw, type_str in parts or ():
            tv = _decode_part_value(raw, type_str)
            t = _arrow_type_of(type_str)
            # Directory names carry PHYSICAL column names; a partition
            # column of an OLD layout may have been renamed since (the
            # head-layout refusal doesn't cover time-travel reads), so
            # the constant column lands under its LOGICAL plan name.
            name = renames.get(c, c) if renames else c
            arrays[name] = (
                pa.nulls(n, t) if tv is None else pa.array([tv] * n, type=t)
            )
        for name in col_order:
            if name not in arrays:
                if not col_types or name not in col_types:
                    raise ValueError(
                        f"file {batch.schema.names} lacks plan column "
                        f"{name!r} and no plan type is available to "
                        "NULL-backfill it"
                    )
                arrays[name] = pa.nulls(n, col_types[name])
        return pa.RecordBatch.from_arrays(
            [arrays[name] for name in col_order], names=list(col_order)
        )

    class VersionedReader(DataSourceReader):
        def __init__(
            self,
            files: list,
            file_stats: dict,
            prune: list,
            excluded=None,
            file_parts=None,
            part_types=None,
            col_order=None,
            col_types=None,
            renames=None,
            encryption_key=None,
            columns=None,
        ):
            # Parquet modular encryption (r13): base64 master key for
            # per-file data-key unwrap; None = plaintext table.
            self.encryption_key = encryption_key
            # Projection (r14, the `columns` load option): PHYSICAL
            # top-level names to decode from each file — the rest are
            # never read (and on a keyless COLUMN-encrypted read, never
            # touched: parquet-cpp hard-aborts keyless encrypted
            # column access). Partition constants and ledger backfills
            # come from col_order/_emit_batch as usual.
            self.columns = tuple(columns) if columns is not None else None
            self.files = files
            self.file_stats = file_stats
            # Immutable per relation (parsed from the load option): every
            # plan derived from this load() shares the same predicates,
            # so Spark's cross-plan scan-reuse cache cannot leak a
            # pruned file set into an unpruned query (see module doc —
            # this is why Catalyst pushFilters is NOT used here).
            self.prune = prune
            self.excluded = excluded or {}
            self.file_parts = file_parts or {}
            self.part_types = part_types or {}
            # Plan-schema column order + Arrow types; set ONLY when the
            # version has partitioned segments (engages the
            # append/reorder/backfill path).
            self.col_order = col_order
            self.col_types = col_types
            # physical -> logical column renames (column mapping);
            # applied per batch BEFORE the plan-order reorder.
            self.renames = renames

        def _split_parts(self, f):
            """((col, raw, type), ...) for one file — self-contained on
            the partition object so executors need no shared state."""
            return tuple(
                (c, v, self.part_types.get(c, "string"))
                for c, v in self.file_parts.get(f, ())
            )

        def partitions(self):
            # One partition per parquet file — the reference's
            # file-aligned splits (splitRowSetsToFiles) — minus every
            # file whose segment stats provably exclude the option
            # predicates (plan-time data skipping INSIDE the source).
            # Partitioned-segment files carry exact [v, v] stats for
            # their partition columns, so equality/range predicates on
            # them prune file-precisely (Hive partition pruning).
            files = [
                f
                for f in self.files
                if _stats_may_match(self.file_stats.get(f), self.prune)
            ]
            return [
                SegmentFilePartition(f, self.excluded.get(f, ()), self._split_parts(f))
                for f in files
            ]

        def read(self, partition):
            import pyarrow as pa
            import pyarrow.parquet as pq

            # Columnar batch path (≙ ReadMode.BatchMode): stream Arrow
            # record batches straight through, no per-row Python. ns
            # timestamps are truncated to µs batch-by-batch (safe=False:
            # sub-µs remainders TRUNCATE, matching read_parquet_any and
            # DuckDB). Merge-on-read: rows at the version's tombstoned
            # positions are masked out by running file offset — the same
            # (file, row-position) identity snapshot_read anti-joins on.
            import numpy as np

            excluded = getattr(partition, "excluded", ()) or ()
            # Vectorized tombstone masking: sorted global positions vs
            # each batch's [offset, offset+n) window via searchsorted —
            # O(n + |dv in window| log) per batch, no per-row Python.
            excl = np.asarray(excluded, dtype=np.int64)
            parts = getattr(partition, "parts", ()) or ()
            if self.encryption_key:
                # _factory must outlive the read: data keys unwrap
                # lazily through its KMS callback (generator frame
                # keeps the local alive).
                dec, _factory = _decryption_properties(self.encryption_key)
                pf = pq.ParquetFile(partition.path, decryption_properties=dec)
            else:
                pf = pq.ParquetFile(partition.path)

            file_cols = None
            if self.columns is not None:
                want = set(self.columns)
                file_cols = [
                    n for n in pf.schema_arrow.names if n in want
                ]
                if not file_cols:
                    # Every projected column is a partition constant or
                    # a ledger backfill: no byte of this file needs
                    # decoding — synthesize per-row-group row counts
                    # (keyless-safe: row counts are plaintext header
                    # fields even on encrypted files).
                    md = pf.metadata
                    off = 0
                    for rg in range(md.num_row_groups):
                        n_rg = md.row_group(rg).num_rows
                        n_live = n_rg
                        if excl.size:
                            lo = np.searchsorted(excl, off, side="left")
                            hi = np.searchsorted(
                                excl, off + n_rg, side="left"
                            )
                            n_live -= int(hi - lo)
                        if n_live > 0:
                            yield _synth_batch(
                                n_live,
                                parts,
                                self.col_order,
                                self.col_types,
                                self.renames,
                            )
                        off += n_rg
                    return

            def _windows():
                # (start_offset, batch) pairs; with pushed predicates,
                # skip whole row groups by their footer stats (the
                # within-file granularity below the manifest's
                # file-level skip), keeping offsets file-global so DV
                # masking stays position-exact.
                if not self.prune or pf.metadata.num_row_groups <= 1:
                    off = 0
                    for b in _cast_batches_to_us(pf, columns=file_cols):
                        yield off, b
                        off += b.num_rows
                    return
                keep, offs = _select_row_groups(pf, self.prune)
                for i, goff in zip(keep, offs):
                    off = goff
                    for b in _cast_batches_to_us(
                        pf, row_groups=[i], columns=file_cols
                    ):
                        yield off, b
                        off += b.num_rows

            for offset, batch in _windows():
                n = batch.num_rows
                if excl.size:
                    lo = np.searchsorted(excl, offset, side="left")
                    hi = np.searchsorted(excl, offset + n, side="left")
                    if hi > lo:
                        mask = np.ones(n, dtype=bool)
                        mask[excl[lo:hi] - offset] = False
                        batch = (
                            batch.filter(pa.array(mask)) if mask.any() else None
                        )
                if batch is not None and batch.num_rows:
                    yield _emit_batch(
                        batch, parts, self.col_order, self.col_types, self.renames
                    )

    class VersionedCommit(WriterCommitMessage):
        def __init__(self, filename, relpaths=()):
            self.filename = filename
            # Partitioned writes carry branch-relative paths
            # (col=value/part-... under staging) instead of one name.
            self.relpaths = relpaths

    #: Hive/Spark's escapePathName character set: ASCII control chars
    #: plus the path-hostile punctuation. Escaped one CHARACTER at a
    #: time as %XX; everything else — space and non-ASCII included —
    #: stays literal, exactly the directory names Spark's own partition
    #: writer produces and its discovery (and our unquote) decode.
    #: urllib.quote would multi-byte-escape non-ASCII (café ->
    #: caf%C3%A9), which Spark's byte-at-a-time unescape reads back as
    #: mojibake — the two readers would disagree on the value.
    _ESCAPE_CHARS = frozenset('"#%\'*/:=?\\{[]^\x7f') | frozenset(
        chr(i) for i in range(32)
    )

    def _branch_component(col: str, value, type_str: str) -> str:
        """One ``col=value`` directory component, Spark-compatible:
        NULL -> the Hive sentinel; dates ISO; booleans lowercase;
        Spark's escapePathName character set percent-escaped."""
        import datetime as _ldt

        if value is None:
            return f"{col}={_HIVE_NULL_LOCAL}"
        if isinstance(value, _ldt.date):
            s = value.isoformat()
        elif isinstance(value, bool):
            s = "true" if value else "false"
        else:
            s = str(value)
        esc = "".join(
            f"%{ord(ch):02X}" if ch in _ESCAPE_CHARS else ch for ch in s
        )
        return f"{col}={esc}"

    class VersionedArrowWriter(DataSourceArrowWriter):
        """Transactional versioned write: tasks stream Arrow batches into
        per-task parquet files inside a hidden staging dir; ``commit``
        (driver, after ALL tasks succeed) renames the staging dir to its
        segment name and publishes the manifest entry — readers never see
        a partial write, and failed jobs leave only an unreferenced
        staging dir (removed by ``abort``). The Arrow-batch path mirrors
        the reader: no per-row Python on either side.

        ``partitionBy`` (write option, comma-separated): each task
        splits its batches by partition value and streams the data
        columns into per-branch ``col=value/`` files (NULL sentinel
        included) — the write twin of the reader's partition decode;
        the manifest entry records the layout so native reads, the
        pyds reader, DML, and OPTIMIZE all see an ordinary
        Hive-partitioned segment."""

        def __init__(
            self,
            path: str,
            overwrite: bool,
            partition_by=(),
            renames=None,
            new_mappings=(),
            mapping_snapshot=None,
            encryption_key=None,
            wrap_key=None,
            pending_kek=None,
            enc_cols=None,
        ):
            import uuid as _uuid

            self.path = path
            self.overwrite = overwrite
            # ((col, simpleString type), ...) from the write schema —
            # PHYSICAL names when a column mapping is active.
            self.partition_by = tuple(partition_by)
            # Column mapping (r13): logical->physical renames applied
            # per Arrow batch before bytes land; new logical columns to
            # identity-extend at commit; the full plan-time snapshot
            # for the commit-side OCC re-check.
            self.renames = dict(renames or {})
            self.new_mappings = tuple(new_mappings)
            self.mapping_snapshot = dict(mapping_snapshot or {})
            # Parquet modular encryption (r13): base64 master key; each
            # task builds PER-FILE encryption properties from the WRAP
            # key (fresh data keys per file — properties are never
            # reused). With a rotation sidecar (r14) the wrap key is the
            # table KEK, resolved or freshly minted at plan time; the
            # master stays on encryption_key for fingerprint recording.
            self.encryption_key = encryption_key
            self.wrap_key = wrap_key or encryption_key
            # A KEK minted at plan time, published at commit under the
            # table lock ({"fp", "wrapped", "kek_id"}).
            self.pending_kek = pending_kek
            # COLUMN-level encryption (r14): encrypt only these
            # top-level columns; the rest stay plaintext so keyless
            # plaintext-subset reads (and manifest stats for the
            # plaintext columns) keep working.
            self.enc_cols = tuple(enc_cols) if enc_cols else None
            # Chosen on the driver so every task shares one staging dir.
            self.staging = f"_staging-{_uuid.uuid4().hex[:12]}"

        def _write_flat(self, iterator, out_dir, tag):
            import pyarrow.parquet as _pq

            fname = f"part-{tag}.parquet"
            fpath = _os.path.join(out_dir, fname)
            writer = None
            ok = False
            try:
                for batch in iterator:
                    if writer is None:
                        writer = _pq.ParquetWriter(
                            fpath,
                            batch.schema,
                            encryption_properties=(
                                _encryption_properties(
                                    self.wrap_key,
                                    batch.schema,
                                    self.enc_cols,
                                )
                                if self.wrap_key
                                else None
                            ),
                        )
                    writer.write_batch(batch)
                ok = True
            finally:
                if writer is not None:
                    writer.close()
                # A failed/zombie attempt must not leave a valid-looking
                # parquet file behind: closing the writer in the error
                # path would otherwise produce a readable partial file
                # that commit() could publish. Delete it so only files
                # named in a task's SUCCESSFUL commit message can ever
                # reach the published segment.
                if not ok and _os.path.exists(fpath):
                    _os.remove(fpath)
            # Empty partitions write no file and carry no commit payload.
            return VersionedCommit(fname if writer is not None else None)

        def _write_partitioned(self, iterator, out_dir, tag):
            import pyarrow as pa
            import pyarrow.compute as pc
            import pyarrow.parquet as _pq

            cols = [c for c, _t in self.partition_by]
            writers: dict = {}  # branch dir -> ParquetWriter
            rels: list = []
            ok = False
            try:
                for batch in iterator:
                    names = batch.schema.names
                    keep = [n for n in names if n not in cols]
                    data = batch.select(keep)
                    # VECTORIZED grouping (no per-row Python): the
                    # partition columns string-join into one key array,
                    # dictionary-encode gives each row its branch code;
                    # per DISTINCT branch (few per task) one compute
                    # filter slices the data columns out.
                    key = None
                    unsafe = False
                    for c in cols:
                        s = pc.cast(batch.column(names.index(c)), pa.string())
                        # The joined key is collision-safe only if no
                        # value contains the separator/NULL sentinel
                        # bytes; a (pathological) hit falls back to
                        # exact per-row tuple grouping.
                        unsafe = unsafe or bool(
                            pc.any(
                                pc.match_substring(pc.fill_null(s, ""), "\x1f")
                            ).as_py()
                            or pc.any(
                                pc.match_substring(pc.fill_null(s, ""), "\x00")
                            ).as_py()
                        )
                        s = pc.fill_null(s, "\x00")
                        key = (
                            s
                            if key is None
                            else pc.binary_join_element_wise(key, s, "\x1f")
                        )
                    if unsafe:
                        vals_lists = [
                            batch.column(names.index(c)).to_pylist() for c in cols
                        ]
                        tuples = list(zip(*vals_lists))
                        codes = {t: i for i, t in enumerate(dict.fromkeys(tuples))}
                        indices = pa.array(
                            [codes[t] for t in tuples], type=pa.int32()
                        )
                        n_groups = len(codes)
                    else:
                        enc = pc.dictionary_encode(key)
                        indices = enc.indices
                        n_groups = len(enc.dictionary)
                    for code in range(n_groups):
                        mask = pc.equal(indices, pa.scalar(code, indices.type))
                        # Typed partition values from the FIRST row of
                        # the group (O(distinct) driver work per batch).
                        first = pc.index(indices, pa.scalar(code, indices.type)).as_py()
                        vals = [
                            batch.column(names.index(c))[first].as_py() for c in cols
                        ]
                        branch = _os.path.join(
                            *[
                                _branch_component(c, v, t)
                                for (c, t), v in zip(self.partition_by, vals)
                            ]
                        )
                        if branch not in writers:
                            bdir = _os.path.join(out_dir, branch)
                            _os.makedirs(bdir, exist_ok=True)
                            rel = _os.path.join(branch, f"part-{tag}.parquet")
                            writers[branch] = _pq.ParquetWriter(
                                _os.path.join(out_dir, rel),
                                data.schema,
                                encryption_properties=(
                                    _encryption_properties(
                                        self.wrap_key,
                                        data.schema,
                                        self.enc_cols,
                                    )
                                    if self.wrap_key
                                    else None
                                ),
                            )
                            rels.append(rel)
                        sub = data.filter(mask)
                        if sub.num_rows:
                            writers[branch].write_batch(sub)
                ok = True
            finally:
                for w in writers.values():
                    w.close()
                if not ok:
                    for rel in rels:
                        with __import__("contextlib").suppress(OSError):
                            _os.remove(_os.path.join(out_dir, rel))
            return VersionedCommit(None, relpaths=tuple(rels) if ok else ())

        def _physical_batches(self, iterator):
            """Logical plan columns -> recorded physical names, per
            Arrow batch (zero-copy renames) — segments stay physically
            uniform across RENAMEs, the same contract as
            versioned._to_physical_frame."""
            for batch in iterator:
                yield batch.rename_columns(
                    [self.renames.get(n, n) for n in batch.schema.names]
                )

        def write(self, iterator):
            import uuid as _uuid

            from pyspark import TaskContext

            part = TaskContext.get().partitionId()
            out_dir = _os.path.join(self.path, self.staging)
            _os.makedirs(out_dir, exist_ok=True)
            tag = f"{part:05d}-{_uuid.uuid4().hex[:8]}"
            if self.renames:
                iterator = self._physical_batches(iterator)
            if self.partition_by:
                return self._write_partitioned(iterator, out_dir, tag)
            return self._write_flat(iterator, out_dir, tag)

        def commit(self, messages):
            # Serialize with native writers when the repo package is
            # importable (commit runs in the driver-side data-source
            # worker; _REPO_ROOT was captured at registration so the
            # import works there too): take the same per-table commit
            # lock + fencing versioned_write uses, so a pyds write
            # racing a native append can no longer double-allocate a
            # version. Degrades to the unlocked legacy publish only if
            # the import fails (foreign cluster layout).
            import sys as _sys

            if _REPO_ROOT not in _sys.path:
                _sys.path.insert(0, _REPO_ROOT)
            try:
                from argodb_mapreduce_spark.sources.versioned import (
                    _commit_lock as _vlock,
                    _verify_lock as _vverify,
                )
            except Exception:  # noqa: BLE001 - lock is driver-env parity
                self._publish(messages, lambda: None)
                return
            with _vlock(self.path) as tok:
                self._publish(messages, lambda: _vverify(self.path, tok))

        def _publish(self, messages, verify):
            import shutil as _shutil

            _ml = _manifest_log()

            entries = []
            manifest = _os.path.join(self.path, "_snapshots.json")
            if _os.path.exists(manifest):
                entries = _ml.read_entries(self.path)
            # Authoritative encryption-transition gate, under the lock:
            # the plan-time copy can be raced (or skipped by the
            # degraded no-lock path) — a mixed encrypted/plaintext
            # version must be impossible to COMMIT, not just to plan.
            _check_encryption_transition(
                entries[-1] if entries else None,
                self.encryption_key,
                self.overwrite,
                self.path,
                self.enc_cols,
            )
            version = entries[-1]["version"] + 1 if entries else 0
            segment = f"data-{version}"
            # Publish ONLY the files named by the winning task attempts'
            # commit messages (the reference DataSource commit protocol).
            # Retried/speculative attempts may have left extra parquet
            # files in staging; moving by-message instead of renaming the
            # whole dir keeps them out of the committed version.
            staging_dir = _os.path.join(self.path, self.staging)
            segment_dir = _os.path.join(self.path, segment)
            relpaths = []
            for msg in messages:
                if msg is None:
                    continue
                if getattr(msg, "relpaths", ()):
                    relpaths.extend(msg.relpaths)
                elif msg.filename is not None:
                    relpaths.append(msg.filename)
            # Fence BEFORE the first mutation (same order as
            # versioned._commit_entry): a holder whose lock was
            # stale-broken during a pause must abort HERE — the orphan
            # rmtree below would otherwise destroy the successor's
            # freshly committed same-name segment.
            verify()
            # Column mapping OCC (r13): re-check the plan-time snapshot
            # under the lock and identity-extend for new columns — a
            # concurrent RENAME/DROP between plan and publish must
            # abort, or the staged bytes would land under a stale
            # physical name that every logical read resolves wrongly.
            if self.mapping_snapshot:
                props_path = _os.path.join(self.path, "_properties.json")
                props = {}
                if _os.path.exists(props_path):
                    with open(props_path) as f:
                        props = _json.load(f)
                cmap = dict(props.get("column_mapping", {}) or {})
                retired = props.get("column_mapping_retired", []) or []
                live_phys = set(cmap.values())
                changed = False
                for log, phys in self.mapping_snapshot.items():
                    have = cmap.get(log)
                    if have is None and log in self.new_mappings:
                        if log in live_phys or log in retired:
                            raise RuntimeError(
                                f"concurrent DDL claimed the physical "
                                f"name {log!r} between plan and commit; "
                                "retry the write"
                            )
                        cmap[log] = log
                        changed = True
                    elif have != phys:
                        raise RuntimeError(
                            f"column mapping changed concurrently for "
                            f"{log!r} (planned physical {phys!r}, now "
                            f"{have!r}); retry the write"
                        )
                if changed:
                    import tempfile as _tf

                    props["column_mapping"] = cmap
                    fd, tmp = _tf.mkstemp(
                        dir=self.path, prefix="_properties", suffix=".tmp"
                    )
                    with _os.fdopen(fd, "w") as f:
                        _json.dump(props, f, indent=1)
                    _os.replace(tmp, props_path)
            # Orphan recovery (the versioned_write_txn contract): a
            # crash between a previous attempt's segment creation and
            # its manifest publish leaves an unreferenced dir with the
            # same computed name — clear it instead of failing forever.
            referenced = {s for e in entries for s in e["segments"]}
            if segment not in referenced and _os.path.isdir(segment_dir):
                import shutil as _sh

                _sh.rmtree(segment_dir)
            _os.makedirs(segment_dir)
            for rel in relpaths:
                dst = _os.path.join(segment_dir, rel)
                _os.makedirs(_os.path.dirname(dst), exist_ok=True)
                _os.rename(_os.path.join(staging_dir, rel), dst)
            _shutil.rmtree(staging_dir, ignore_errors=True)
            prev = entries[-1]["segments"] if (entries and not self.overwrite) else []
            # Manifest stats parity with versioned_write: harvest the new
            # segment's min/max from its parquet footers so reads through
            # snapshot_read(..., predicates=) can data-skip writer-made
            # segments too. Guarded: if the repo package is unimportable
            # in this commit context, stats are simply absent — pruning
            # degrades to scan-everything, never to wrong answers.
            stats = dict(entries[-1].get("stats", {})) if (entries and not self.overwrite) else {}
            stats = {s: stats[s] for s in prev if s in stats}
            # Encrypted segments record NO stats — by design, not just
            # because the keyless harvest can't read them: plaintext
            # min/max in the manifest would leak value ranges of
            # encrypted columns. (Touching an encrypted column's chunk
            # metadata without keys hard-ABORTS the process in
            # parquet-cpp, so this gate is also a safety wall, never a
            # swallowed exception.)
            if not self.encryption_key or self.enc_cols:
                try:
                    from argodb_mapreduce_spark.sources.versioned import (
                        _partition_stats as _ps,
                    )
                    from argodb_mapreduce_spark.sources.versioned import (
                        _segment_stats_plaintext as _ssp,
                    )
                    from argodb_mapreduce_spark.sources.versioned import (
                        collect_segment_stats as _css,
                    )

                    if self.enc_cols:
                        # COLUMN-encrypted segment: harvest min/max for
                        # the PLAINTEXT columns only — keyless-safe by
                        # construction (_segment_stats_plaintext picks
                        # indices from the plaintext footer schema
                        # before touching any column-chunk metadata),
                        # and no encrypted column's value range ever
                        # reaches the manifest.
                        stats[segment] = _ssp(
                            segment_dir, exclude=self.enc_cols
                        )
                    else:
                        stats[segment] = _css(segment_dir)
                    if self.partition_by:
                        # Partition-column min/max from the dir names, same
                        # harvest the native partitioned write records.
                        stats[segment].update(
                            _ps(
                                segment_dir,
                                [c for c, _t in self.partition_by],
                                dict(self.partition_by),
                            )
                        )
                except Exception:  # noqa: BLE001 - stats are an optimization only
                    pass
            entry = {"version": version, "segments": [*prev, segment], "stats": stats}
            if self.encryption_key:
                # Marker every native read path gates on (fail loud,
                # never a keyless scan attempt) and pyds reads use to
                # demand the key — plus the master's HMAC fingerprint
                # so a later append/read under a DIFFERENT key is
                # rejected at plan time (a mixed-master version would
                # be unreadable by any single key).
                entry["encrypted"] = True
                entry["key_fp"] = _key_fp_of(self.encryption_key)
                if self.enc_cols:
                    # COLUMN-level encryption: the protected set is
                    # part of the version contract — keyless
                    # plaintext-subset reads and the append-shape gate
                    # both key off it.
                    entry["enc_columns"] = list(self.enc_cols)
            # Manifest parity with versioned_write: an append carries the
            # previous deletion vector forward (its positions reference
            # only reused segments; dropping it would resurrect deleted
            # rows AND make a plain append look like a DV change to the
            # stream source), records the per-segment schema ledger so
            # later schema enforcement / mergeSchema gating keeps
            # working, and stamps the commit wall-clock so AS OF
            # TIMESTAMP resolution stays correct for pyds-written
            # versions.
            if entries and not self.overwrite:
                schemas = dict(entries[-1].get("schemas", {}))
                schemas = {s: schemas[s] for s in prev if s in schemas}
                if entries[-1].get("dv"):
                    entry["dv"] = entries[-1]["dv"]
            else:
                schemas = {}
            try:
                import glob as _glob

                import pyarrow.parquet as _pq2
                from pyspark.sql.pandas.types import from_arrow_schema as _fas

                seg_files = sorted(
                    _glob.glob(
                        _os.path.join(segment_dir, "**", "*.parquet"), recursive=True
                    )
                )
                if seg_files:
                    st = _fas(_us_schema(_pq2.ParquetFile(seg_files[0]).schema_arrow))
                    ledger = {f.name: f.dataType.simpleString() for f in st.fields}
                    # Partition columns live in dir names, not footers:
                    # the ledger records them too (versioned_write's
                    # ledger is the full frame schema).
                    for c, t in self.partition_by:
                        ledger[c] = t
                    schemas[segment] = ledger
            except Exception:  # noqa: BLE001 - ledger is enforcement metadata
                pass
            if schemas:
                entry["schemas"] = schemas
            if self.partition_by:
                # Layout ledger: reused segments keep theirs, the new
                # segment records its own — native reads, the pyds
                # reader, DML, and OPTIMIZE all dispatch on this.
                parts_ledger = (
                    dict(entries[-1].get("partition_by", {}))
                    if (entries and not self.overwrite)
                    else {}
                )
                parts_ledger = {s: parts_ledger[s] for s in prev if s in parts_ledger}
                parts_ledger[segment] = [c for c, _t in self.partition_by]
                entry["partition_by"] = parts_ledger
            elif entries and not self.overwrite and entries[-1].get("partition_by"):
                carried = {
                    s: v
                    for s, v in entries[-1]["partition_by"].items()
                    if s in prev
                }
                if carried:
                    entry["partition_by"] = carried
            import time as _time

            # KEK publish (r14 rotation): a key minted at plan time
            # lands in the sidecar HERE — under the lock, AFTER every
            # other abort point (transition gate, mapping OCC, stats,
            # entry build), immediately before the manifest append — so
            # an aborted commit cannot leave a sidecar that re-keys a
            # table it never wrote. A concurrent writer that published
            # a DIFFERENT KEK for the same master between our plan and
            # commit aborts this write (our staged files are wrapped
            # under OUR kek; publishing the manifest entry anyway would
            # commit files no sidecar-resolved key reads). Sidecar
            # first, manifest second: a crash between the two leaves an
            # orphan sidecar for a still-unencrypted table — harmless
            # (no committed encrypted entry references it), whereas the
            # reverse order would commit KEK-wrapped files no sidecar
            # can ever resolve.
            if self.pending_kek is not None:
                import json as _jn2

                keys_path = _os.path.join(self.path, "_keys.json")
                sc = {"keks": {}, "current_fp": None, "rotations": 0}
                if _os.path.exists(keys_path):
                    with open(keys_path) as f:
                        sc = _jn2.load(f)
                have = sc["keks"].get(self.pending_kek["fp"])
                if have is not None:
                    if have.get("kek_id") != self.pending_kek["kek_id"]:
                        raise RuntimeError(
                            "concurrent writer published a different "
                            "key-encryption key for this master between "
                            "plan and commit; retry the write"
                        )
                else:
                    sc["keks"][self.pending_kek["fp"]] = {
                        "wrapped": self.pending_kek["wrapped"],
                        "kek_id": self.pending_kek["kek_id"],
                    }
                sc["current_fp"] = self.pending_kek["fp"]
                tmpk = keys_path + f".tmp-{_os.getpid()}"
                with open(tmpk, "w") as f:
                    _jn2.dump(sc, f)
                _os.replace(tmpk, keys_path)
            entry["ts"] = _time.time()
            entries.append(entry)
            verify()  # fencing: abort if our lock was stale-broken
            # Log-structured commit: one per-commit JSON file lands
            # atomically (+ amortized checkpoint) — same layout and
            # cost model as versioned._append_manifest_entry.
            _ml.append_entry(self.path, entries)

        def abort(self, messages):
            import shutil as _shutil

            _shutil.rmtree(_os.path.join(self.path, self.staging), ignore_errors=True)

    class VersionedDataSource(DataSource):
        def __init__(self, options):
            super().__init__(options)
            # Absolute from the start: DV sidecars record absolute
            # _metadata.file_path values, and every plan-time map keyed
            # by file path (excluded positions, partition values, stats)
            # must agree with them even when the user passed a relative
            # table path.
            self._path = _os.path.abspath(options["path"])
            self._version = int(options.get("version", -1))
            # Source-level data skipping: JSON [[col, op, literal], ...]
            # triples, AND semantics — immutable for this relation.
            self._prune = [
                (c, o, v) for c, o, v in _json.loads(options.get("prune", "[]"))
            ]
            # Manifest resolved ONCE, when the DataSource instance is
            # built at load()/plan time — the file set is pinned into
            # this instance, so concurrent versioned_write calls cannot
            # change what an already-planned scan reads: the reference's
            # snapshot-renew guarantee (tested in
            # tests/test_python_datasource.py::test_plan_time_snapshot_pinning).
            # Deferred-tolerant: a write to a fresh path has no manifest
            # yet, so resolution failures surface at reader() time only.
            try:
                (
                    self._files,
                    self._file_stats,
                    self._dv_excluded,
                    self._file_parts,
                    self._part_types,
                    self._meta,
                ) = _resolve_files(self._path, self._version)
            except (FileNotFoundError, ValueError):
                self._files = None
                self._file_stats = {}
                self._dv_excluded = {}
                self._file_parts = {}
                self._part_types = {}
                self._meta = {
                    "evolved": False, "ledger": {},
                    "cmap": {}, "renames": {}, "mapping_active": False,
                    "encrypted": False,
                }
            # Parquet modular encryption (r13): one base64 master key
            # threaded through the load/write option — the reference's
            # key-in-read-options contract.
            self._enc_key = self.options.get(
                "encryptionKey"
            ) or self.options.get("encryptionkey")
            # Pushed predicates arrive in LOGICAL names; stats, footers
            # and row-group metadata are physical — translate once here.
            if self._prune and self._meta.get("cmap"):
                _cm = self._meta["cmap"]
                self._prune = [(_cm.get(c, c), o, v) for c, o, v in self._prune]

        @classmethod
        def name(cls):
            return "argodb_versioned"

        def schema(self):
            import pyarrow as pa
            import pyarrow.parquet as pq
            from pyspark.sql.pandas.types import from_arrow_schema

            if not self._files:
                raise ValueError(
                    f"no versioned table (or no data files) at {self._path!r}"
                )
            s = _us_schema(pq.ParquetFile(self._files[0]).schema_arrow)
            # ADD-column evolution: columns the schema ledger records
            # but the first file lacks (added by later appends) join
            # the plan schema, typed from the ledger's simpleStrings —
            # the native reader's mergeSchema analogue. DDL parse
            # covers every Spark type; read() NULL-backfills them for
            # pre-evolution files.
            for c, t in self._meta["ledger"].items():
                if c not in s.names and c not in self._part_types:
                    s = s.append(pa.field(c, _arrow_type_full(t)))
            # Partition columns live in directory names, not file
            # footers: append any the first file doesn't carry inline,
            # typed from the manifest schema ledger (Spark's partition
            # discovery appends them last too, so native reads and pyds
            # reads of the same table agree on column order).
            for c, t in self._part_types.items():
                if c not in s.names:
                    s = s.append(pa.field(c, _arrow_type_of(t)))
            # Column mapping: the plan schema speaks LOGICAL names —
            # mapped physicals rename, retired physicals (DROPPED
            # columns) leave the plan entirely.
            if self._meta.get("mapping_active"):
                cmap = self._meta["cmap"]
                phys_to_log = {ph: l for l, ph in cmap.items()}
                s = pa.schema(
                    [
                        pa.field(phys_to_log.get(f.name, f.name), f.type)
                        for f in s
                        if f.name in phys_to_log or f.name in cmap
                    ]
                )
            raw_cols = str(self.options.get("columns") or "").strip()
            if str(self.options.get("readChangeFeed", "false")).lower() in ("true", "1"):
                if raw_cols:
                    raise ValueError(
                        "columns cannot combine with readChangeFeed: "
                        "change rows carry the full row schema"
                    )
                s = s.append(pa.field("_change_type", pa.string())).append(
                    pa.field("_commit_version", pa.int64())
                )
            if raw_cols:
                # Projection OPTION (r14): Python data sources get no
                # projection pushdown from Spark, so the scan always
                # decodes every column — option('columns', 'k,g') is
                # the explicit escape hatch (and the only keyless way
                # into a COLUMN-encrypted table through this format).
                names = [c.strip() for c in raw_cols.split(",") if c.strip()]
                have = {f.name for f in s}
                missing = [c for c in names if c not in have]
                if missing:
                    raise ValueError(
                        f"columns {missing} not in the table schema "
                        f"{sorted(have)}"
                    )
                s = pa.schema([s.field(c) for c in names])
            return from_arrow_schema(s)

        def reader(self, schema):
            if not self._files:
                raise ValueError(
                    f"no versioned table (or no data files) at {self._path!r}"
                )
            if str(self.options.get("readChangeFeed", "false")).lower() in ("true", "1"):
                raise ValueError(
                    "readChangeFeed is a STREAMING option (spark.readStream); "
                    "for batch change queries use versioned.change_feed()"
                )
            raw_cols = str(self.options.get("columns") or "").strip()
            proj = (
                [c.strip() for c in raw_cols.split(",") if c.strip()]
                if raw_cols
                else None
            )
            if self._meta.get("encrypted") and not self._enc_key:
                enc_set = set(self._meta.get("enc_columns") or ())
                bad = sorted(set(proj or ()) & enc_set)
                badp = sorted(
                    {c for c, _o, _l in self._prune} & enc_set
                )
                if not enc_set or proj is None or bad or badp:
                    hint = ""
                    if enc_set:
                        hint = (
                            " (COLUMN-encrypted: the plaintext columns "
                            "read keyless via option('columns', ...) "
                            "or versioned.snapshot_read(..., "
                            f"columns=[...]) avoiding {sorted(enc_set)})"
                        )
                    raise ValueError(
                        "this version's segments are parquet-modular-"
                        "encrypted; pass option('encryptionKey', "
                        "<base64 master key>) to read them" + hint
                    )
            wrap_key = None
            if self._enc_key:
                _crypto(self._enc_key)  # fail loud on malformed keys at plan time
                _check_key_fp(self._meta, self._enc_key, self._path)
                # Rotation-aware (r14): read tasks decrypt with the
                # table KEK when a key sidecar exists.
                wrap_key = _resolve_wrap_key(self._path, self._enc_key)
            # col_order/col_types engage the partition-append/reorder/
            # backfill path when this version has partitioned segments
            # OR divergent per-segment schemas (ADD-column evolution);
            # uniform flat tables keep the untouched passthrough.
            col_order, col_types = None, None
            if (
                self._file_parts
                or self._meta["evolved"]
                or self._meta.get("mapping_active")
                or proj is not None
            ):
                from pyspark.sql.pandas.types import to_arrow_type

                col_order = [f.name for f in schema.fields]
                col_types = {f.name: to_arrow_type(f.dataType) for f in schema.fields}
            phys_proj = None
            if proj is not None:
                # File bytes carry PHYSICAL names; the projection
                # arrived in LOGICAL plan names.
                renames_ = self._meta.get("renames") or {}
                log_to_phys = {l: ph for ph, l in renames_.items()}
                phys_proj = [log_to_phys.get(c, c) for c in proj]
            return VersionedReader(
                self._files,
                self._file_stats,
                self._prune,
                self._dv_excluded,
                self._file_parts,
                self._part_types,
                col_order,
                col_types,
                renames=self._meta.get("renames") or None,
                encryption_key=wrap_key if self._meta.get("encrypted") else None,
                columns=phys_proj,
            )

        def _has_encrypted_history(self) -> bool:
            """True when ANY manifest entry is encrypted. With no key
            sidecar that means a pre-r14 master-direct lineage; with an
            unknown-master sidecar it distinguishes a real foreign-key
            append from an ORPHAN sidecar left by an aborted
            first-ever encrypted commit. O(versions) manifest read,
            paid only on encrypted write paths that need it."""
            try:
                entries = _manifest_log().read_entries(self._path)
            except (FileNotFoundError, ValueError):
                return False
            return any(e.get("encrypted") for e in entries)

        def writer(self, schema, overwrite):
            renames, new_logicals, snapshot = _resolve_mapping_for_write(
                self._path,
                [f.name for f in schema.fields] if schema is not None else [],
            )
            enc_key = self._enc_key
            if enc_key:
                _crypto(enc_key)  # malformed keys fail at plan time
            # COLUMN-level encryption (r14): option('encryptColumns',
            # 'c1,c2') encrypts ONLY those columns; the rest stay
            # plaintext, keyless-readable by projection, with manifest
            # stats (pruning) preserved for them.
            raw_enc_cols = str(
                self.options.get("encryptColumns")
                or self.options.get("encryptcolumns")
                or ""
            ).strip()
            enc_cols = None
            if raw_enc_cols:
                if not enc_key:
                    raise ValueError(
                        "encryptColumns requires option('encryptionKey', "
                        "<base64 master key>)"
                    )
                field_names = {f.name for f in schema.fields} if schema else set()
                enc_cols = tuple(
                    sorted({c.strip() for c in raw_enc_cols.split(",") if c.strip()})
                )
                unknown = [c for c in enc_cols if c not in field_names]
                if unknown:
                    raise ValueError(
                        f"encryptColumns {unknown} not in the write "
                        f"schema {sorted(field_names)}"
                    )
                if renames or any(k != v for k, v in snapshot.items()):
                    # Logical/physical divergence would make the
                    # encrypted-column set ambiguous across rename
                    # history — a wrong resolution silently lands a
                    # PROTECTED column in plaintext. Refuse up front.
                    raise ValueError(
                        "encryptColumns is not supported on a table "
                        "with an active column mapping; encrypt the "
                        "full table instead"
                    )
            # Appends onto an encrypted head REQUIRE the key (and a
            # plaintext head refuses a surprise encrypted append): a
            # mixed version would need per-file read options. This is
            # the FAST-FAIL copy; the authoritative re-check runs in
            # _publish under the commit lock (a raced manifest read
            # here must not become a gate bypass). FileNotFoundError =
            # genuinely fresh table; anything else propagates loud.
            try:
                head = _head_entry(self._path)
            except FileNotFoundError:
                head = None
            _check_encryption_transition(
                head, enc_key, overwrite, self._path, enc_cols
            )
            # Key sidecar resolution for the WRITE path (r14 rotation).
            # Wrap target decided at PLAN time; a freshly minted KEK is
            # published at COMMIT time under the table lock (an aborted
            # job must not leave a sidecar that re-keys a table it
            # never wrote). Rules: a sidecar that knows this master ->
            # use its KEK; retired master -> refuse; no sidecar but an
            # ENCRYPTED legacy head being appended -> keep master-direct
            # wrapping (its existing files have no KEK); otherwise
            # (fresh table, plaintext head, or overwrite) -> mint a KEK
            # so the new lineage is rotatable from birth.
            wrap_key, pending_kek = enc_key, None
            if enc_key:
                import base64 as _b64
                import uuid as _uuid2

                sidecar = _read_keys_json(self._path)
                fp = _key_fp_of(enc_key)
                rec = (sidecar or {}).get("keks", {}).get(fp)
                if rec is not None:
                    if rec.get("retired"):
                        raise ValueError(
                            "this master key was ROTATED OUT of the "
                            "table; writes require the current master "
                            "key"
                        )
                    wrap_key = _b64.b64encode(
                        _kek_unwrap(enc_key, rec["wrapped"])
                    ).decode()
                elif (
                    sidecar is not None
                    and not overwrite
                    and self._has_encrypted_history()
                ):
                    # A sidecar alone does not convict: an aborted
                    # first-ever encrypted commit can leave one behind
                    # with NO committed encrypted entry (the manifest
                    # is the authority) — mint below in that case.
                    raise ValueError(
                        "encryptionKey does not match any master key "
                        "this table's key sidecar knows (key-"
                        "fingerprint lookup failed)"
                    )
                elif sidecar is None and self._has_encrypted_history():
                    # LEGACY (pre-sidecar) lineage is TABLE-WIDE and
                    # sticky — appends AND overwrites: resolve_wrap_key
                    # is lineage-global, so minting a KEK mid-history
                    # would hand readers the KEK for versions whose
                    # file DEKs are wrapped by the master directly,
                    # breaking time travel / diff / CDF over everything
                    # before the overwrite. Legacy tables stay
                    # master-direct forever (and rotation keeps
                    # refusing them with the rewrite guidance).
                    wrap_key = enc_key
                else:
                    import os as _osr

                    kek = _osr.urandom(32)
                    pending_kek = {
                        "fp": fp,
                        "wrapped": _kek_wrap(enc_key, kek),
                        "kek_id": _uuid2.uuid4().hex[:16],
                    }
                    wrap_key = _b64.b64encode(kek).decode()
            _os.makedirs(self._path, exist_ok=True)
            # `partitionBy` write OPTION (df.write.partitionBy() does
            # not reach Python data sources): comma-separated columns,
            # Hive layout + NULL sentinel, recorded in the manifest's
            # partition ledger like versioned_write(partition_by=...).
            raw = str(
                self.options.get("partitionBy")
                or self.options.get("partitionby")
                or ""
            ).strip()
            partition_by = []
            if raw:
                by_name = {f.name: f.dataType.simpleString() for f in schema.fields}
                for c in (c.strip() for c in raw.split(",")):
                    if c not in by_name:
                        raise ValueError(
                            f"partitionBy column {c!r} not in the write "
                            f"schema {sorted(by_name)}"
                        )
                    supported = ("tinyint", "smallint", "int", "bigint",
                                 "string", "date", "boolean", "double", "float")
                    if by_name[c] not in supported:
                        raise ValueError(
                            f"partitionBy column {c!r} has type "
                            f"{by_name[c]!r}; directory-encodable types "
                            f"are {supported}"
                        )
                    partition_by.append((c, by_name[c]))
            if renames:
                # Directory names and the layout ledger are PHYSICAL,
                # like every other byte the writer lands.
                partition_by = [(renames.get(c, c), t) for c, t in partition_by]
            if enc_cols:
                leak = sorted(
                    set(enc_cols) & {c for c, _t in partition_by}
                )
                if leak:
                    # Partition values are PLAINTEXT directory names —
                    # "encrypting" a partition column would write every
                    # value of the protected column into the filesystem
                    # layout.
                    raise ValueError(
                        f"encryptColumns {leak} are partitionBy columns; "
                        "partition values appear as plaintext directory "
                        "names, so a partition column cannot be encrypted"
                    )
            return VersionedArrowWriter(
                self._path,
                overwrite,
                partition_by,
                renames=renames,
                new_mappings=new_logicals,
                mapping_snapshot=snapshot,
                encryption_key=enc_key,
                wrap_key=wrap_key,
                pending_kek=pending_kek,
                enc_cols=enc_cols,
            )

        def streamReader(self, schema):
            if self._meta.get("encrypted") and not self._enc_key:
                raise ValueError(
                    "streaming over a parquet-modular-encrypted table "
                    "requires option('encryptionKey', <base64 master "
                    "key>) — the same key batch reads pass"
                )
            wrap_key = None
            if self._enc_key:
                _crypto(self._enc_key)  # malformed keys fail at plan time
                _check_key_fp(self._meta, self._enc_key, self._path)
                # Rotation-aware (r14): the stream decrypts with the
                # table KEK; resolved once at plan (the KEK never
                # changes across rotations, so a long-lived tail
                # survives a mid-stream rotation).
                wrap_key = _resolve_wrap_key(self._path, self._enc_key)
            ignore_deletes = str(
                self.options.get("ignoreDeletes", "false")
            ).lower() in ("true", "1")
            cdf = str(
                self.options.get("readChangeFeed", "false")
            ).lower() in ("true", "1")
            if cdf and ignore_deletes:
                raise ValueError(
                    "readChangeFeed and ignoreDeletes are contradictory: "
                    "the change feed EMITS deletes, ignoreDeletes skips them"
                )
            from pyspark.sql.pandas.types import to_arrow_type

            base = [
                f for f in schema.fields
                if f.name not in ("_change_type", "_commit_version")
            ]
            base_cols = [f.name for f in base]
            base_types = {f.name: to_arrow_type(f.dataType) for f in base}
            if self._prune and cdf:
                raise ValueError(
                    "prune cannot combine with readChangeFeed: skipping "
                    "files would silently drop change rows from the feed"
                )
            max_versions = self.options.get("maxVersionsPerBatch") or self.options.get(
                "maxversionsperbatch"
            )
            if max_versions is not None:
                max_versions = int(max_versions)
                if max_versions < 1:
                    raise ValueError(
                        f"maxVersionsPerBatch must be >= 1, got {max_versions}"
                    )
            end_version = self.options.get("endVersion") or self.options.get(
                "endversion"
            )
            if end_version is not None:
                end_version = int(end_version)
            start_version = self.options.get("startingVersion") or self.options.get(
                "startingversion"
            )
            start_ts = self.options.get("startingTimestamp") or self.options.get(
                "startingtimestamp"
            )
            if start_version is not None and start_ts is not None:
                raise ValueError(
                    "pass startingVersion OR startingTimestamp, not both "
                    "(Delta raises on the same conflict)"
                )
            if start_ts is not None:
                # Delta CDF's startingTimestamp rule: resolve to the
                # FIRST commit AT OR AFTER the timestamp, its changes
                # INCLUDED (the AS-OF read rule would exclude it and
                # silently drop the anchor commit). ISO-8601 or epoch
                # seconds accepted; a timestamp past the head fails
                # loud, exactly Delta's 'timestamp after latest commit'
                # error.
                try:
                    ts = float(start_ts)
                except ValueError:
                    import datetime as _sdt

                    _dtv = _sdt.datetime.fromisoformat(str(start_ts))
                    if _dtv.tzinfo is None:
                        # Manifest ts values are UTC epochs; an
                        # offset-less ISO string must anchor in UTC too,
                        # or a non-UTC driver shifts the resolved commit
                        # by the host timezone.
                        _dtv = _dtv.replace(tzinfo=_sdt.timezone.utc)
                    ts = _dtv.timestamp()
                entries = _manifest_log().read_entries(self._path)
                eligible = [
                    e["version"]
                    for e in entries
                    if e.get("ts", float("-inf")) >= ts
                ]
                if not eligible:
                    raise ValueError(
                        f"startingTimestamp {start_ts!r} is after the last "
                        f"commit (head ts "
                        f"{entries[-1].get('ts')}); use a timestamp at or "
                        "before it"
                    )
                start_version = min(eligible)
            if start_version is not None:
                start_version = int(start_version)
                if end_version is not None and start_version > end_version:
                    raise ValueError(
                        f"startingVersion {start_version} > endVersion {end_version}"
                    )
            return VersionedStreamReader(
                self._path, ignore_deletes, cdf, base_cols, base_types,
                self._prune, max_versions, end_version, start_version,
                renames=self._meta.get("renames") or None,
                mapping_active=bool(self._meta.get("mapping_active")),
                encryption_key=(
                    wrap_key if self._meta.get("encrypted") else None
                ),
            )

    class VersionedStreamReader(DataSourceStreamReader):
        """STREAMING source over the versioned table — "subscribe to a
        table": each micro-batch consumes exactly the segments PUBLISHED
        since the last committed offset (the Delta-streaming-source
        contract). Offsets are manifest version numbers, so progress is
        exactly-once against the same manifest the batch reader pins.

        Append-only discipline: a version that REMOVES segments
        (overwrite, rollback, vacuum-rewritten history) is a non-append
        change and fails loud on a plain tail — the same default
        Delta's streaming source applies — because silently re-reading
        or skipping rewritten data corrupts downstream aggregates;
        under ``readChangeFeed`` the same transition SYNTHESIZES
        file-level delete/insert legs instead (r13, Delta RESTORE's
        CDF granularity), so a subscriber that consumes changes
        survives an overwrite or RESTORE. A DELETION-VECTOR commit
        likewise fails by default (a subscriber that only tails
        inserts would silently diverge from the table); passing
        ``option("ignoreDeletes", "true")`` opts into skipping DV-only
        commits and keeps tailing appends — exactly Delta's
        ``ignoreDeletes`` contract.

        Scale: partitions(start, end) lists only the DELTA segments'
        files (one partition per file, the batch reader's split
        contract), so a day's micro-batches each touch O(new data), and
        the offset log is O(versions)."""

        def __init__(
            self,
            path: str,
            ignore_deletes: bool = False,
            cdf: bool = False,
            base_cols=None,
            base_types=None,
            prune=(),
            max_versions=None,
            end_version=None,
            start_version=None,
            renames=None,
            mapping_active=False,
            encryption_key=None,
        ):
            # Parquet modular encryption (r13): a keyed stream tails an
            # encrypted table — per-file decryption in read()/_read_cdf.
            self._enc_key = encryption_key
            # ``option("startingVersion", N)`` — Delta's CDF option:
            # begin the subscription AT version N (its changes
            # INCLUDED) instead of the full history. Only consulted by
            # initialOffset, so an existing checkpoint always wins.
            self._start_version = start_version
            self._path = path
            self._base_types = base_types
            # Column mapping (r12): physical->logical renames applied
            # per emitted batch; base_cols are already logical (they
            # derive from the mapped plan schema).
            self._renames = renames
            self._mapping_active = mapping_active
            # ABSOLUTE subscription bound (``option("endVersion", N)``,
            # the streaming twin of the batch reader's version pin): the
            # stream never advances past manifest version N, whatever
            # the head does. Monotonic and restart-safe by construction
            # (a fixed target can never regress below a checkpoint that
            # was written while honoring it) — the primitive
            # drain_backlog() composes into a bounded backlog drain.
            self._end_version = end_version
            # ADMISSION CONTROL (``option("maxVersionsPerBatch", N)``,
            # Delta's maxFilesPerTrigger re-expressed in this source's
            # offset unit): a restarted subscriber facing a large
            # backlog drains it in bounded micro-batches of <= N
            # manifest versions instead of one batch sized O(backlog) —
            # the difference between a recovery that respects executor
            # memory and one that spills or OOMs at 100 TB. The clamp
            # lives in latestOffset (the only place the engine lets a
            # Python source bound a batch); progress is tracked from
            # initialOffset/partitions/commit, so the one case with no
            # known floor — a RESTART whose last batch committed, before
            # any partitions() call — admits a single unclamped batch
            # (documented best-effort, matching the guarantees Delta
            # itself gives for maxFilesPerTrigger on some restart paths).
            self._max_versions = max_versions
            self._last_end = None
            # Source-level data skipping for a SELECTIVE SUBSCRIBER
            # (same immutable option as the batch reader): new files
            # whose partition values or segment stats provably exclude
            # every predicate are never planned. The skip is
            # conservative-only; consumers re-apply the predicates
            # row-level, exactly the batch read_versioned contract.
            self._prune = list(prune or ())
            self._ignore_deletes = ignore_deletes
            self._cdf = cdf
            # Plan-schema order (without the CDF tag columns): batches
            # from partitioned appends get their partition values
            # appended and every batch is emitted in this order, so
            # flat and partitioned segments union cleanly downstream.
            self._base_cols = base_cols

        def _entries(self):
            return _manifest_log().read_entries(self._path)

        def initialOffset(self):
            # Version N's changes are INCLUDED (offsets are exclusive
            # lower bounds, so "start at N" means offset N-1).
            first = -1 if self._start_version is None else self._start_version - 1
            self._last_end = first
            return {"version": first}

        def latestOffset(self):
            head = self._entries()[-1]["version"]
            if self._end_version is not None:
                head = min(head, self._end_version)
            if self._max_versions is None or self._last_end is None:
                return {"version": head}
            # Never regress below the floor (offsets must be monotonic
            # even if the manifest head looks behind — non-append
            # histories fail loud in partitions(), not here).
            end = max(min(head, self._last_end + self._max_versions), self._last_end)
            self._last_end = end
            return {"version": end}

        def commit(self, end):
            # Progress floor for the rate clamp (the engine's post-batch
            # acknowledgement); partitions() below tracks it too, which
            # also recovers the floor on a replayed uncommitted batch.
            self._last_end = end["version"]

        def _dv_positions(self, dv_name):
            """(file_path, row_index) set of one DV sidecar, read with
            pyarrow at PLAN time (DVs are O(deleted rows), tiny).
            MEMOIZED by name — sidecars are immutable, and one planning
            pass may consult the same DV from the dv-delta branch, the
            restore synthesizer, and the append-leg mask."""
            import glob as _glob

            import pyarrow.parquet as pq

            cache = getattr(self, "_dv_pos_cache", None)
            if cache is None:
                cache = self._dv_pos_cache = {}
            if dv_name in cache:
                return cache[dv_name]
            out = set()
            if not dv_name:
                return out
            for f in sorted(
                _glob.glob(_os.path.join(self._path, dv_name, "*.parquet"))
            ):
                t = pq.read_table(f, columns=["file_path", "row_index"])
                for fp, ri in zip(
                    t.column("file_path").to_pylist(),
                    t.column("row_index").to_pylist(),
                ):
                    # Spark's _metadata.file_path carries a scheme and
                    # percent-encoding; normalize to the on-disk path.
                    out.add((_local_path(fp), ri))
            cache[dv_name] = out
            return out

        def partitions(self, start, end):
            entries = {e["version"]: e for e in self._entries()}
            lo, hi = start["version"], end["version"]
            if hi < lo:
                # Reachable two ways, both option misuse: fail-stop
                # beats the alternative (an empty batch would log a
                # REGRESSED offset, and the next batch would re-plan
                # already-consumed versions — duplicate ingest).
                if self._start_version is not None and lo == self._start_version - 1:
                    raise ValueError(
                        f"startingVersion {self._start_version} is beyond "
                        f"the table head (latest streamable end is v{hi}); "
                        "lower startingVersion or wait for new commits"
                    )
                raise ValueError(
                    f"endVersion clamps this stream to v{hi}, but the "
                    f"checkpoint has already consumed through v{lo}; "
                    "raise endVersion to at least the committed version "
                    "or reset the checkpoint"
                )
            if self._last_end is None or hi > self._last_end:
                self._last_end = hi  # authoritative floor for the rate clamp
            if lo >= 0 and lo not in entries:
                oldest = min(entries)
                if self._start_version is not None and lo == self._start_version - 1:
                    # Not a checkpoint problem: the option points below
                    # the retained horizon. Version N's delta is
                    # segments(N) - segments(N-1), so the oldest
                    # STREAMABLE start is one past the oldest retained
                    # entry (the same reason Delta's startingVersion
                    # must be within retention).
                    raise ValueError(
                        f"startingVersion {self._start_version} needs "
                        f"manifest entry v{lo}, which has been vacuumed; "
                        f"the oldest streamable startingVersion is "
                        f"{oldest + 1} (or batch-read v{oldest} and stream "
                        f"with startingVersion {oldest + 1})"
                    )
                raise ValueError(
                    f"checkpointed offset version {lo} is no longer in the "
                    "manifest (vacuumed/expired); resuming would re-ingest "
                    "already-consumed data — reset the checkpoint or raise "
                    "vacuum retention"
                )
            prev = set(entries[lo]["segments"]) if lo in entries else set()
            prev_dv = entries[lo].get("dv") if lo in entries else None
            prev_entry = entries.get(lo)
            parts = []
            for v in sorted(v for v in entries if lo < v <= hi):
                segs = set(entries[v]["segments"])
                if entries[v].get("data_change") is False:
                    # Maintenance rewrite (compact / bin-pack / z-order):
                    # bytes moved, live rows identical — contribute ZERO
                    # partitions and advance the diff base, Delta's
                    # OPTIMIZE-under-CDF skip. Applies to the plain
                    # append-tail stream too: re-emitting a compacted
                    # segment would duplicate every row it absorbed.
                    prev = segs
                    prev_dv = entries[v].get("dv")
                    prev_entry = entries[v]
                    continue
                removed = prev - segs
                if removed and entries[v].get("cdc") and self._cdf:
                    # UPDATE/MERGE with a CDC sidecar (CDF-enabled
                    # table): the change rows live ENTIRELY in the
                    # cdc-{v} dir the commit wrote — update_preimage /
                    # update_postimage / insert legs with the row's own
                    # _change_type column. The rewritten segment must
                    # NOT be re-emitted (its rows are mostly unchanged
                    # carry-over), and the commit never ADDS deletion-
                    # vector entries (it materializes or carries them),
                    # so the sidecar is the whole delta: O(changed
                    # rows), the same contract as the batch change_feed.
                    cdc_dir = _os.path.join(self._path, entries[v]["cdc"])
                    for f in sorted(_os.listdir(cdc_dir)):
                        if f.endswith(".parquet"):
                            parts.append(
                                CDFPartition("cdc", _os.path.join(cdc_dir, f), v)
                            )
                    prev = segs
                    prev_dv = entries[v].get("dv")
                    prev_entry = entries[v]
                    continue
                if removed and entries[v].get("deleted_where"):
                    # RETENTION DROP (r12): DELETE removed whole
                    # segments from the manifest. CDF emits each
                    # dropped file's LIVE rows (previous DV masked out)
                    # as delete legs; ignoreDeletes skips the commit;
                    # a plain tail still fails loud.
                    if self._cdf:
                        import glob as _glob2

                        excl = {}
                        for fp, ri in self._dv_positions(prev_dv):
                            excl.setdefault(fp, []).append(ri)
                        for seg in sorted(removed):
                            seg_dir = _os.path.join(self._path, seg)
                            for fp in sorted(
                                _glob2.glob(
                                    _os.path.join(seg_dir, "**", "*.parquet"),
                                    recursive=True,
                                )
                            ):
                                parts.append(
                                    CDFPartition(
                                        "drop",
                                        fp,
                                        v,
                                        tuple(sorted(excl.get(fp, ()))),
                                        parts=(
                                            self._parts_of_file(prev_entry, fp)
                                            if prev_entry
                                            else ()
                                        ),
                                    )
                                )
                    elif not self._ignore_deletes:
                        raise ValueError(
                            f"retention DROP at version {v} (segments "
                            f"removed: {sorted(removed)}); pass "
                            "option('ignoreDeletes', 'true') to skip "
                            "delete commits deliberately, or "
                            "option('readChangeFeed', 'true') to consume "
                            "the dropped rows as change rows"
                        )
                    # fall through: a drop commit may ALSO carry a new
                    # DV (partial segments) — the dv-delta block below
                    # handles it; carried-by-reference DVs are equal and
                    # contribute nothing. No new segments can appear.
                    removed = set()
                if (
                    # Removed segments, OR a SUPERSET restore (r14): a
                    # rollback past a retention delete onto a DV-carrying
                    # version re-ADDS segments with removed == ∅ but a
                    # changed DV. Without synthesis those re-added files
                    # would fall through to the plain append block as
                    # whole-file insert legs UNMASKED by the restored
                    # version's DV, while the dv-delta block emits the
                    # same positions as delete legs — with the
                    # deletes-first replay order the replica re-inserts
                    # tombstoned rows. The synthesizer's 'add' leg masks
                    # by the current DV, matching the batch path.
                    (
                        removed
                        or ((segs - prev) and entries[v].get("dv") != prev_dv)
                    )
                    and self._cdf
                ):
                    # OVERWRITE / RESTORE under readChangeFeed (r13):
                    # synthesize file-level legs from the segment diff —
                    # Delta RESTORE's CDF granularity — so the one
                    # remaining maintenance action that killed a live
                    # CDC subscriber no longer does. Removed segments'
                    # files emit their live rows (prev DV masked) as
                    # delete legs; added segments' files their live rows
                    # (the restored version's DV masked) as insert legs;
                    # segments on BOTH sides contribute only their DV
                    # delta — new tombstones as positional deletes,
                    # un-tombstoned positions (resurrection) as
                    # positional inserts. As of r14 UPDATE/MERGE
                    # committed WITHOUT a CDC sidecar synthesizes the
                    # same legs from its rewritten-segment diff
                    # (unchanged rows in rewritten files emit a net-zero
                    # drop+add pair under keyed replay; updated rows
                    # emit (-old, +new)) — the sidecar branch above
                    # stays the O(changed rows) fast path when CDF was
                    # enabled before the DML.
                    import glob as _glob3

                    prev_pos = self._dv_positions(prev_dv)
                    cur_pos = self._dv_positions(entries[v].get("dv"))

                    def _by_file(positions):
                        d: dict = {}
                        for fp, ri in positions:
                            d.setdefault(fp, []).append(ri)
                        return d

                    prev_by, cur_by = _by_file(prev_pos), _by_file(cur_pos)
                    for kind, seg_set, entry_of, excl in (
                        ("drop", removed, prev_entry, prev_by),
                        ("add", segs - prev, entries[v], cur_by),
                    ):
                        for seg in sorted(seg_set):
                            seg_dir = _os.path.join(self._path, seg)
                            for fp in sorted(
                                _glob3.glob(
                                    _os.path.join(seg_dir, "**", "*.parquet"),
                                    recursive=True,
                                )
                            ):
                                parts.append(
                                    CDFPartition(
                                        kind,
                                        fp,
                                        v,
                                        tuple(sorted(excl.get(fp, ()))),
                                        parts=(
                                            self._parts_of_file(entry_of, fp)
                                            if entry_of
                                            else ()
                                        ),
                                    )
                                )
                    shared_roots = tuple(
                        _os.path.join(_os.path.abspath(self._path), s) + _os.sep
                        for s in (segs & prev)
                    )
                    for kind, delta, entry_of in (
                        ("delete", cur_pos - prev_pos, entries[v]),
                        ("revive", prev_pos - cur_pos, prev_entry),
                    ):
                        per: dict = {}
                        for fp, ri in delta:
                            # Removed/added files were fully accounted
                            # above — only SHARED-segment positions are
                            # a genuine delta.
                            if fp.startswith(shared_roots):
                                per.setdefault(fp, []).append(ri)
                        for fp in sorted(per):
                            parts.append(
                                CDFPartition(
                                    kind,
                                    fp,
                                    v,
                                    tuple(sorted(per[fp])),
                                    parts=(
                                        self._parts_of_file(entry_of, fp)
                                        if entry_of
                                        else ()
                                    ),
                                )
                            )
                    prev = segs
                    prev_dv = entries[v].get("dv")
                    prev_entry = entries[v]
                    continue
                if removed:
                    raise ValueError(
                        f"non-append change at version {v} (segments removed: "
                        f"{sorted(removed)}); the versioned stream supports "
                        "append-only history — every transition (UPDATE/"
                        "MERGE/DELETE/RESTORE) is streamable via "
                        "option('readChangeFeed', 'true')"
                    )
                if entries[v].get("dv") != prev_dv:
                    if self._cdf:
                        # CDF: the DV DELTA becomes delete rows — one
                        # partition per touched file with its positions.
                        old = self._dv_positions(prev_dv)
                        new = self._dv_positions(entries[v].get("dv"))
                        per_file: dict = {}
                        for fp, ri in new - old:
                            per_file.setdefault(fp, []).append(ri)
                        for fp in sorted(per_file):
                            parts.append(
                                CDFPartition(
                                    "delete",
                                    fp,
                                    v,
                                    tuple(sorted(per_file[fp])),
                                    parts=self._parts_of_file(entries[v], fp),
                                )
                            )
                        # RESURRECTION (r13): a same-segment-list RESTORE
                        # past a DELETE retracts tombstones — positions in
                        # the OLD DV but not the new one re-emit as insert
                        # legs, bounded to files the new version still
                        # references (a retention drop's vanished files
                        # were already emitted as drop legs).
                        live_roots = tuple(
                            _os.path.join(_os.path.abspath(self._path), s)
                            + _os.sep
                            for s in segs
                        )
                        revived: dict = {}
                        for fp, ri in old - new:
                            if fp.startswith(live_roots):
                                revived.setdefault(fp, []).append(ri)
                        for fp in sorted(revived):
                            parts.append(
                                CDFPartition(
                                    "revive",
                                    fp,
                                    v,
                                    tuple(sorted(revived[fp])),
                                    parts=self._parts_of_file(entries[v], fp),
                                )
                            )
                    elif not self._ignore_deletes:
                        raise ValueError(
                            f"deletion-vector change at version {v}; an "
                            "insert-tailing subscriber would diverge from the "
                            "table — pass option('ignoreDeletes', 'true') to "
                            "skip delete commits deliberately, or "
                            "option('readChangeFeed', 'true') to consume "
                            "them as change rows"
                        )
                # Lazily-grouped current-DV positions for the CDF insert
                # mask below: a SUPERSET restore whose DV is carried BY
                # NAME (pure retention drop, then rollback past it)
                # re-adds segments whose files still hold tombstones in
                # the unchanged DV — their insert legs must be masked or
                # the replica re-inserts dead rows. A plain append's
                # fresh files can never appear in a pre-existing DV, so
                # its mask is always empty (and the DV read memoizes).
                cur_dv_by = None
                for seg in sorted(segs - prev):
                    seg_dir = _os.path.join(self._path, seg)
                    part_cols = entries[v].get("partition_by", {}).get(seg) or ()
                    ledger = entries[v].get("schemas", {}).get(seg, {})
                    seg_stats = (
                        _decoded_stats(entries[v].get("stats", {}).get(seg))
                        if self._prune
                        else None
                    )
                    if self._prune and not _stats_may_match(seg_stats, self._prune):
                        continue  # whole new segment provably excluded
                    if part_cols:
                        # Partitioned append: walk the col=value branches
                        # and attach the decoded values + ledger types to
                        # each file split (NULL sentinel -> None).
                        listed = [
                            (
                                fp,
                                tuple(
                                    (c, raw, ledger.get(c, "string"))
                                    for c, raw in pp
                                ),
                            )
                            for fp, pp in _walk_partition_files(seg_dir, part_cols)
                        ]
                    else:
                        listed = [
                            (_os.path.join(seg_dir, f), ())
                            for f in sorted(_os.listdir(seg_dir))
                            if f.endswith(".parquet")
                        ]
                    for fp, pp in listed:
                        if self._prune and pp:
                            # File-precise partition-value skip.
                            if not _stats_may_match(
                                _tighten_with_parts(seg_stats, pp), self._prune
                            ):
                                continue
                        if not self._cdf:
                            parts.append(SegmentFilePartition(fp, parts=pp))
                            continue
                        excl = ()
                        if entries[v].get("dv"):
                            if cur_dv_by is None:
                                cur_dv_by = {}
                                for dfp, ri in self._dv_positions(
                                    entries[v]["dv"]
                                ):
                                    cur_dv_by.setdefault(dfp, []).append(ri)
                            excl = tuple(sorted(cur_dv_by.get(fp, ())))
                        parts.append(
                            # 'add' = live rows only (tombstones masked);
                            # surfaces as _change_type 'insert' either way.
                            CDFPartition("add", fp, v, excl, parts=pp)
                            if excl
                            else CDFPartition("insert", fp, v, parts=pp)
                        )
                prev = segs
                prev_dv = entries[v].get("dv")
                prev_entry = entries[v]
            return parts

        def _parts_of_file(self, entry, fp):
            """((col, raw, type), ...) for a DV-referenced file: resolve
            its owning segment by directory ancestry, then decode the
            partition branch between segment root and file (NULL
            sentinel -> None). Flat segments return ()."""

            for seg in entry["segments"]:
                # DV file paths are absolute; the table path may be
                # relative — compare on the absolute form.
                seg_root = _os.path.join(_os.path.abspath(self._path), seg)
                if not fp.startswith(seg_root + _os.sep):
                    continue
                part_cols = entry.get("partition_by", {}).get(seg) or ()
                if not part_cols:
                    return ()
                ledger = entry.get("schemas", {}).get(seg, {})
                pairs = _decode_branch(_os.path.relpath(_os.path.dirname(fp), seg_root))
                return tuple(
                    (c, pairs.get(c), ledger.get(c, "string")) for c in part_cols
                )
            return ()

        def read(self, partition):
            if not isinstance(partition, CDFPartition):
                # Same Arrow-batch file reader as the batch path; the
                # plan-order emit appends partition values for splits
                # from partitioned segments (no-op for flat files
                # already in plan order).
                return VersionedReader(
                    [], {}, self._prune, {},
                    col_order=(
                        self._base_cols
                        if (self._base_cols or not self._mapping_active)
                        else None
                    ),
                    col_types=self._base_types,
                    renames=self._renames,
                    encryption_key=self._enc_key,
                ).read(partition)
            return self._read_cdf(partition)

        def _read_cdf(self, partition):
            import pyarrow as pa
            import pyarrow.parquet as pq

            def tag(batch):
                # Partition append + plan ordering BEFORE the CDF tag
                # columns, so flat and partitioned change rows align.
                # kind 'drop' (a retention-dropped/restore-removed
                # file's live rows) surfaces as Delta's 'delete' row
                # type; 'add' (a restore-readded file's live rows) and
                # 'revive' (un-tombstoned positions) as 'insert'.
                ct = {"drop": "delete", "add": "insert", "revive": "insert"}.get(
                    partition.kind, partition.kind
                )
                batch = _emit_batch(
                    batch, partition.parts, self._base_cols, self._base_types,
                    self._renames,
                )
                n = batch.num_rows
                cols = list(batch.columns) + [
                    pa.array([ct] * n, type=pa.string()),
                    pa.array([partition.version] * n, type=pa.int64()),
                ]
                names = list(batch.schema.names) + ["_change_type", "_commit_version"]
                return pa.RecordBatch.from_arrays(cols, names=names)

            if self._enc_key:
                dec, _factory = _decryption_properties(self._enc_key)
                pf = pq.ParquetFile(partition.path, decryption_properties=dec)
            else:
                dec = None
                pf = pq.ParquetFile(partition.path)
            target = _us_schema(pf.schema_arrow)
            if partition.kind == "cdc":
                # Sidecar rows carry their OWN _change_type (a cdc file
                # mixes preimage/postimage/insert legs); split it off,
                # align the base columns to plan order, re-attach.
                for batch in _cast_batches_to_us(pf):
                    idx = batch.schema.get_field_index("_change_type")
                    ct = batch.column(idx)
                    base = batch.select(
                        [n for n in batch.schema.names if n != "_change_type"]
                    )
                    emitted = _emit_batch(
                        base, partition.parts, self._base_cols, self._base_types,
                        self._renames,
                    )
                    cols = list(emitted.columns) + [
                        ct,
                        pa.array(
                            [partition.version] * emitted.num_rows, type=pa.int64()
                        ),
                    ]
                    names = list(emitted.schema.names) + [
                        "_change_type",
                        "_commit_version",
                    ]
                    yield pa.RecordBatch.from_arrays(cols, names=names)
                return
            if partition.kind in ("drop", "add"):
                # Whole-file legs: every LIVE row of a retention-dropped
                # / restore-removed file ('drop' → delete legs, the
                # PREVIOUS version's DV positions mask out — they were
                # already emitted as delete legs by their own commit) or
                # of a restore-READDED file ('add' → insert legs, the
                # restored version's own DV masks out).
                import numpy as np

                excl = np.asarray(partition.positions or (), dtype=np.int64)
                off = 0
                for batch in _cast_batches_to_us(pf):
                    n = batch.num_rows
                    b = batch
                    if excl.size:
                        lo_i = np.searchsorted(excl, off, side="left")
                        hi_i = np.searchsorted(excl, off + n, side="left")
                        if hi_i > lo_i:
                            mask = np.ones(n, dtype=bool)
                            mask[excl[lo_i:hi_i] - off] = False
                            b = batch.filter(pa.array(mask)) if mask.any() else None
                    off += n
                    if b is not None and b.num_rows:
                        yield tag(b)
                return
            if partition.kind == "insert":
                for batch in _cast_batches_to_us(pf):
                    yield tag(batch)
            else:  # delete/revive: materialize the listed positions
                t = pq.read_table(
                    partition.path, decryption_properties=dec
                ).cast(target, safe=False)
                t = t.take(pa.array(list(partition.positions), type=pa.int64()))
                for batch in t.combine_chunks().to_batches():
                    yield tag(batch)

        # NOTE: commit(end) is defined next to latestOffset above — it
        # feeds the rate-clamp floor; offsets themselves live in the
        # query's checkpoint, nothing to GC here.

    # Closure internals exposed for property tests (the classes pickle
    # by value, so these can't live at module level).
    VersionedDataSource._test_hooks = {
        "branch_component": _branch_component,
        "decode_branch": _decode_branch,
        "arrow_type_full": _arrow_type_full,
        "decode_part_value": _decode_part_value,
        "select_row_groups": _select_row_groups,
    }
    return VersionedDataSource


def register_datasource(spark: SparkSession) -> None:
    """Idempotent per-session registration of the custom format."""
    key = "argodb_mapreduce_spark._pyds_registered"
    if spark.conf.get(key, None) != "1":
        spark.dataSource.register(make_versioned_datasource())
        spark.conf.set(key, "1")


def read_versioned(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    predicates=(),
    encryption_key: str | None = None,
) -> DataFrame:
    """Read a versioned table through the custom format. ``predicates``
    — (column, op, literal) triples, op in ``< <= > >= =`` — ride the
    ``prune`` load option so the SOURCE skips provably-unmatched files
    at plan time, and are re-applied row-level on the returned frame
    (the same conservative prune+refilter split as snapshot_read);
    datetime literals are passed as ISO strings and re-typed against
    the stat values. ``encryption_key`` (base64 master key) decrypts
    parquet-modular-encrypted versions — the reference's
    keys-through-read-options contract."""
    import datetime as _dt
    import json as _json

    register_datasource(spark)
    r = spark.read.format(FORMAT_NAME)
    if version is not None:
        r = r.option("version", str(version))
    if encryption_key is not None:
        r = r.option("encryptionKey", encryption_key)
    if predicates:
        enc = [
            [c, o, v.isoformat() if isinstance(v, (_dt.datetime, _dt.date)) else v]
            for c, o, v in predicates
        ]
        r = r.option("prune", _json.dumps(enc))
    df = r.load(path)
    for col, op, lit in predicates:
        c = F.col(col)
        df = df.filter(
            {"<": c < lit, "<=": c <= lit, ">": c > lit, ">=": c >= lit, "=": c == lit}[op]
        )
    return df


def _checkpoint_committed_version(checkpoint: str) -> int | None:
    """Last COMMITTED source offset version in a structured-streaming
    checkpoint for this source, or None for a fresh checkpoint.

    Reads the engine's own WAL layout: ``offsets/<batchId>`` holds one
    serialized offset line per source for the batch that was *planned*;
    ``commits/<batchId>`` exists only once the batch fully committed.
    The committed version is the offset of the newest batch id present
    in BOTH — exactly the resume point the engine itself would use.
    O(1) metadata reads (two dir listings + one small file)."""
    import json as _json

    odir = os.path.join(checkpoint, "offsets")
    cdir = os.path.join(checkpoint, "commits")
    if not (os.path.isdir(odir) and os.path.isdir(cdir)):
        return None
    committed = [f for f in os.listdir(cdir) if f.isdigit()]
    if not committed:
        return None
    latest = max(int(f) for f in committed)
    with open(os.path.join(odir, str(latest))) as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    # v1 WAL: line 0 = "v1", line 1 = batch metadata JSON, then one
    # offset line per source (this source is the only one in a
    # drain_backlog query).
    return _json.loads(lines[-1])["version"]


def drain_backlog(
    spark: SparkSession,
    path: str,
    checkpoint: str,
    configure,
    max_versions_per_run: int = 10,
    reader_options: dict | None = None,
):
    """Drain a versioned table's streaming backlog in BOUNDED runs —
    admission control at the orchestration layer.

    The Python DataSource streaming API has no admission-control hook
    (the engine snapshots ``latestOffset()`` before the source learns
    the checkpointed start, so a source-side clamp cannot bound the
    first micro-batch — see VersionedStreamReader.maxVersionsPerBatch).
    This helper gets the same guarantee safely from the OUTSIDE: each
    iteration reads the checkpoint's committed version, starts an
    ``availableNow`` run with ``endVersion = committed +
    max_versions_per_run`` (an absolute, restart-safe bound), waits for
    it, and repeats until the head version at call time is consumed.
    Exactly-once holds run to run because progress lives in the one
    checkpoint, and the endVersion floor is re-derived from it — never
    guessed.

    ``configure(stream_df) -> DataStreamWriter`` attaches the caller's
    sink (format/path/foreachBatch/outputMode); the helper owns the
    checkpoint and trigger. Returns ``{"runs", "from_version",
    "to_version"}``.

    At 100 TB: a new subscriber to a table with years of history drains
    it in ``ceil(versions / max_versions_per_run)`` bounded batches,
    each sized to executor memory, instead of one batch sized
    O(backlog) — the difference between a recovery and an OOM."""
    register_datasource(spark)
    from argodb_mapreduce_spark.sources.versioned import _read_manifest

    head = _read_manifest(path)[-1]["version"]
    start = _checkpoint_committed_version(checkpoint)
    start = -1 if start is None else start
    runs = 0
    committed = start
    # endVersion / startingVersion are the loop's own control channel —
    # a caller-supplied value would silently override the computed
    # per-run bound and wedge the drain in the no-progress check.
    bad_opts = {"endVersion", "endversion", "startingVersion", "startingversion"} & {
        str(k) for k in (reader_options or {})
    }
    if bad_opts:
        raise ValueError(
            f"reader_options {sorted(bad_opts)} conflict with drain_backlog's "
            "own offset management; bound the drain with "
            "max_versions_per_run instead"
        )
    while committed < head:
        end = min(head, committed + max_versions_per_run)
        r = spark.readStream.format(FORMAT_NAME)
        for k, v in (reader_options or {}).items():
            r = r.option(k, str(v))
        r = r.option("endVersion", str(end))
        from argodb_mapreduce_spark.streaming.windows import run_stream_resilient

        run_stream_resilient(
            lambda: configure(r.load(path))
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        runs += 1
        new_committed = _checkpoint_committed_version(checkpoint)
        if new_committed is None or new_committed <= committed:
            raise RuntimeError(
                f"drain_backlog made no progress (committed "
                f"{committed} -> {new_committed}); aborting instead of "
                "looping forever"
            )
        committed = new_committed
    return {"runs": runs, "from_version": start, "to_version": committed}


@register(
    "pyds_versioned_scan",
    oracle="""
    SELECT 0 AS version, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(o_orderkey) AS BIGINT) AS sum_key
    FROM orders WHERE o_orderkey % 3 = 0
    UNION ALL
    SELECT 1, CAST(COUNT(*) AS BIGINT), CAST(SUM(o_orderkey) AS BIGINT)
    FROM orders WHERE o_orderkey % 3 IN (0, 1)
    """,
    tags=("source", "datasource", "snapshot"),
    doc=(
        "Custom Python DataSource scan (format 'argodb_versioned'): the "
        "reference's InputFormat contract — snapshot-pinned splits + "
        "per-split batch reader — re-expressed in Spark 4's DataSource "
        "API, reading two versions of a versioned table through "
        "spark.read.format(...). Arrow-batch read path, one partition "
        "per file (file-aligned splits)."
    ),
)
def pyds_versioned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from argodb_mapreduce_spark.sources.versioned import _build_fixture_versions

    path = _build_fixture_versions(spark, sf_dir)
    frames = [
        read_versioned(spark, path, v)
        .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("o_orderkey").cast("long").alias("sum_key"))
        .select(F.lit(v).alias("version"), "n_rows", "sum_key")
        for v in (0, 1)
    ]
    return frames[0].unionAll(frames[1])


def write_versioned(df: DataFrame, path: str, mode: str = "append") -> None:
    """Write ``df`` as a new version through the custom format's Arrow
    writer (``df.write.format('argodb_versioned')``): staged per-task
    parquet → driver-side manifest publish on commit."""
    register_datasource(df.sparkSession)
    df.write.format(FORMAT_NAME).mode(mode).save(path)


@register(
    "pyds_versioned_write",
    oracle="""
    SELECT 0 AS version, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(o_orderkey) AS BIGINT) AS sum_key
    FROM orders WHERE o_orderkey % 3 = 0
    UNION ALL
    SELECT 1, CAST(COUNT(*) AS BIGINT), CAST(SUM(o_orderkey) AS BIGINT)
    FROM orders WHERE o_orderkey % 3 = 1
    UNION ALL
    SELECT 2, CAST(COUNT(*) AS BIGINT), CAST(SUM(o_orderkey) AS BIGINT)
    FROM orders WHERE o_orderkey % 3 IN (1, 2)
    """,
    tags=("sink", "datasource", "snapshot"),
    doc=(
        "Custom Python DataSource WRITE path (Arrow writer): three write "
        "jobs through spark.write.format('argodb_versioned') — append, "
        "overwrite, append — staged per-task parquet files published by "
        "a driver-side manifest commit (all-tasks-or-nothing, the write "
        "twin of the reader's snapshot pin). Each version is then read "
        "back THROUGH THE READER and aggregated; v0 proves overwritten "
        "history stays readable (time travel across a write made by the "
        "custom sink). Scale: tasks stream Arrow batches straight to "
        "parquet (no per-row Python), commit is O(#segments) metadata."
    ),
)
def pyds_versioned_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from argodb_mapreduce_spark.catalog import load_table

    tag = sf_dir.strip("/").replace("/", "_")
    path = os.path.join(
        tempfile.gettempdir(), "argodb_mapreduce_spark", tag, "pyds_written"
    )
    # Rebuild from scratch every run: the query must be deterministic
    # under re-execution (driver + tests both run it).
    shutil.rmtree(path, ignore_errors=True)
    o = load_table(spark, sf_dir, "orders")
    write_versioned(o.filter(F.col("o_orderkey") % 3 == 0), path, mode="append")
    write_versioned(o.filter(F.col("o_orderkey") % 3 == 1), path, mode="overwrite")
    write_versioned(o.filter(F.col("o_orderkey") % 3 == 2), path, mode="append")
    frames = [
        read_versioned(spark, path, v)
        .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("o_orderkey").cast("long").alias("sum_key"))
        .select(F.lit(v).alias("version"), "n_rows", "sum_key")
        for v in (0, 1, 2)
    ]
    out = frames[0]
    for fdf in frames[1:]:
        out = out.unionAll(fdf)
    return out


@register(
    "pyds_write_after_rename",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
           CAST(SUM(CASE WHEN o_orderkey % 3 = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_pyds,
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_prios,
           TRUE AS physical_name_stable,
           TRUE AS mapping_extended,
           TRUE AS pyds_read_matches
    FROM orders WHERE o_orderkey % 3 IN (0, 1)
    """,
    tags=("sink", "datasource", "column-mapping"),
    doc=(
        "PYDS WRITE AFTER RENAME (r13, VERDICT r12 #4 — the r12 writer "
        "was fail-loud gated on ANY column mapping, so streaming/pyds "
        "writes stopped the day a table got its first RENAME): the "
        "table renames o_orderpriority->prio (O(1) metadata), then the "
        "Python DataSource APPENDS rows under the logical schema plus "
        "a brand-new src column. The writer maps logical->physical per "
        "Arrow batch (the new segment's parquet footers carry "
        "o_orderpriority, pinned by physical_name_stable), identity-"
        "extends the mapping for src UNDER THE COMMIT LOCK with a "
        "plan-vs-commit OCC re-check (mapping_extended pinned), and "
        "the result reads back identically through the native snapshot "
        "read and the pyds reader (pyds_read_matches, exceptAll both "
        "ways). Values hash-checked against DuckDB."
    ),
)
def pyds_write_after_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the mapping resolve is O(columns) at plan time and one
    O(columns) properties rewrite under the already-held commit lock;
    batch renames are zero-copy Arrow metadata — the write itself moves
    the same bytes as an unmapped append."""
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from argodb_mapreduce_spark.catalog import load_table
    from argodb_mapreduce_spark.sources.versioned import (
        _read_properties,
        rename_column,
        snapshot_read,
        versioned_write,
    )

    register_datasource(spark)
    tag = sf_dir.strip("/").replace("/", "_")
    out = os.path.join(
        tempfile.gettempdir(), "argodb_mapreduce_spark", tag, "pyds_rename_write"
    )
    shutil.rmtree(out, ignore_errors=True)
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    versioned_write(o.filter(F.col("o_orderkey") % 3 == 0), out)  # v0
    rename_column(out, "o_orderpriority", "prio")
    incoming = o.filter(F.col("o_orderkey") % 3 == 1).select(
        "o_orderkey",
        F.col("o_orderpriority").alias("prio"),
        F.lit("pyds").alias("src"),
    )
    write_versioned(incoming, out)  # v1: append through the Arrow writer
    import glob as _g

    names: set = set()
    for f in sorted(_g.glob(os.path.join(out, "data-1", "*.parquet"))):
        names |= set(pq.ParquetFile(f).schema_arrow.names)
    physical_ok = "o_orderpriority" in names and "prio" not in names
    mapping = _read_properties(out).get("column_mapping", {})
    mapping_ok = (
        mapping.get("src") == "src" and mapping.get("prio") == "o_orderpriority"
    )
    native = snapshot_read(spark, out)
    pyds = read_versioned(spark, out)
    # Proof folded lazily into the result plan (r15, guide §1.2/§2.4):
    # the eager multiset_equal collect cost a separate job evaluating
    # both the native and the pyds read before the final aggregate ran.
    cols_match = sorted(native.columns) == sorted(pyds.columns)
    from argodb_mapreduce_spark.functions.oracle_safe import multiset_equal_frame

    same = (
        multiset_equal_frame(native, pyds.select(*native.columns), "__same")
        if cols_match
        else spark.range(1).select(F.lit(False).alias("__same"))
    )
    return (
        native.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("o_orderkey").cast("long").alias("sum_key"),
            F.sum((F.col("src") == "pyds").cast("long")).alias("n_pyds"),
            F.countDistinct("prio").alias("n_prios"),
            F.lit(physical_ok).alias("physical_name_stable"),
            F.lit(mapping_ok).alias("mapping_extended"),
        )
        .crossJoin(F.broadcast(same))
        .withColumnRenamed("__same", "pyds_read_matches")
    )


@register(
    "pyds_encrypted_roundtrip",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_prios,
           TRUE AS data_unreadable_without_key,
           TRUE AS wrong_key_rejected,
           TRUE AS native_read_refused
    FROM orders WHERE o_orderkey % 3 = 0
    """,
    tags=("sink", "datasource", "encryption", "security"),
    doc=(
        "PARQUET MODULAR ENCRYPTION through the pyds path (r13 — the "
        "reference threads decryption keys through read options, "
        "ArgodbMapreduceInputFormat.java:295; previously declared out "
        "of scope, now closed): a write with option('encryptionKey', "
        "<base64 master key>) lands AES-GCM-encrypted column data "
        "(parquet-cpp modular encryption, fresh data key per file, "
        "HMAC-wrapped by the master key) in PLAINTEXT-FOOTER mode — "
        "schema and row counts stay keyless-readable for planning, "
        "column data AND column stats do not (the manifest records no "
        "stats: no value-range leak). Pinned in the oracle hash: a "
        "keyless pyarrow data read raises; a WRONG key fails the HMAC "
        "unwrap loud; the native JVM snapshot read refuses with a "
        "pointer to read_versioned(..., encryption_key=...); and the "
        "keyed read round-trips values hash-equal to DuckDB over the "
        "plaintext source."
    ),
)
def pyds_encrypted_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: encryption is per-file stream work inside the same Arrow
    write/read tasks (AES-GCM at memory bandwidth, no extra pass); key
    unwrap is O(1) per file at plan/read time. The trade is manifest
    stats (no skipping on encrypted columns) — documented, and exactly
    the trade Parquet modular encryption makes everywhere."""
    import base64
    import glob as _g
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from argodb_mapreduce_spark.catalog import load_table
    from argodb_mapreduce_spark.sources.versioned import snapshot_read

    register_datasource(spark)
    key = base64.b64encode(bytes(range(32))).decode()  # deterministic demo key
    tag = sf_dir.strip("/").replace("/", "_")
    out = os.path.join(
        tempfile.gettempdir(), "argodb_mapreduce_spark", tag, "pyds_encrypted"
    )
    shutil.rmtree(out, ignore_errors=True)
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    (
        o.filter(F.col("o_orderkey") % 3 == 0)
        .write.format(FORMAT_NAME)
        .option("encryptionKey", key)
        .mode("append")
        .save(out)
    )
    f0 = sorted(_g.glob(os.path.join(out, "data-0", "*.parquet")))[0]
    unreadable = False
    try:
        pq.ParquetFile(f0).read()
    except OSError:
        unreadable = True
    wrong = base64.b64encode(bytes(range(1, 33))).decode()
    wrong_rejected = False
    try:
        read_versioned(spark, out, encryption_key=wrong).count()
    except Exception:  # noqa: BLE001 - executor unwrap error surfaces wrapped
        wrong_rejected = True
    native_refused = False
    try:
        snapshot_read(spark, out)
    except ValueError:
        native_refused = True
    df = read_versioned(spark, out, encryption_key=key)
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("o_orderkey").cast("long").alias("sum_key"),
        F.countDistinct("o_orderpriority").alias("n_prios"),
        F.lit(unreadable).alias("data_unreadable_without_key"),
        F.lit(wrong_rejected).alias("wrong_key_rejected"),
        F.lit(native_refused).alias("native_read_refused"),
    )


@register(
    "stream_encrypted_tail_live",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_f
    FROM orders WHERE o_orderkey % 3 IN (0, 1)
    """,
    tags=("streaming", "datasource", "encryption", "live"),
    doc=(
        "STREAMING TAIL OF AN ENCRYPTED TABLE (r13): two encrypted pyds "
        "appends, then one readStream with option('encryptionKey', ...) "
        "drains them — per-file AES-GCM decryption inside the same "
        "Arrow stream tasks, offsets and planning untouched (the "
        "manifest and plaintext footers carry everything planning "
        "needs; no data key is used until read()). A keyless stream "
        "fails loud at start (tested). The drained row count, key sum "
        "and a value-bearing status aggregate are oracle-pinned against "
        "the plaintext source — encrypted ingestion pipelines keep "
        "their incremental consumers."
    ),
)
def stream_encrypted_tail_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: identical partition planning to the plaintext stream
    (O(new files) per micro-batch); decryption adds stream-cipher work
    inside each read task and one O(1) key unwrap per file."""
    register_datasource(spark)
    # Shares the cached 2-col %3-split encrypted base with the
    # change-feed fixture (r14, guide §1.2): same columns, same slices,
    # built once per source fixture; the head-clone fork is O(manifest)
    # with zero Spark jobs (the plain tail carries no version column,
    # so the fold-to-one-entry head clone drains identically). The
    # keyed drain + aggregate are the timed computation.
    out, key = _encrypted_clone_fixture(
        spark,
        sf_dir,
        "pyds_enc_tail",
        "pyds_enc_cdf_base",
        ("o_orderkey", "o_orderstatus"),
        mod=3,
    )
    s = (
        spark.readStream.format(FORMAT_NAME)
        .option("encryptionKey", key)
        .load(out)
    )
    agg = s.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("o_orderkey").cast("long").alias("sum_key"),
        F.sum((F.col("o_orderstatus") == "F").cast("long")).alias("n_f"),
    )
    sink = "stream_encrypted_tail_live_sink"
    # Input-derived state width (r14, guide §2.2) — see stream_versioned_ingest.
    from argodb_mapreduce_spark.catalog import table_rowcount
    from argodb_mapreduce_spark.streaming.windows import _run_to_memory

    _run_to_memory(agg, sink, "complete", input_rows=table_rowcount(sf_dir, "orders"))
    return spark.table(sink)


def _encrypted_demo_key() -> str:
    """The deterministic demo master key shared by the encrypted-table
    fixtures (base64 of bytes 0..31 — a DEMO key, not key management)."""
    import base64

    return base64.b64encode(bytes(range(32))).decode()


def _encrypted_clone_fixture(
    spark: SparkSession,
    sf_dir: str,
    out_name: str,
    base_name: str,
    cols,
    mod: int = 2,
    options: dict | None = None,
    clone_version: int | None = None,
) -> tuple[str, str]:
    """Cached pristine encrypted base + per-call SHALLOW-CLONE fork
    (r14, guide §1.2): two keyed pyds appends of the orders slices
    ``o_orderkey % mod == 0 / == 1`` build ONCE per source fixture
    (mtime-keyed, the staging contract every derived-layout fixture
    uses); each caller receives a `clone_table` fork — O(manifest)
    metadata, zero Spark jobs, encryption marker + KEK sidecar carried
    — and mutates it freely (keyed erase/MERGE/rotation land DVs,
    local segments, or a rewritten sidecar in the CLONE only). The
    timed DML, probes and keyed scans each query declares still run
    per invocation. ``clone_version`` pins the fork (a change-feed
    consumer forks at v0 so later appends commit on the clone's OWN
    history). Returns (clone_path, demo_key)."""
    import shutil
    import tempfile

    from argodb_mapreduce_spark.catalog import fixture_stale, load_table, table_path
    from argodb_mapreduce_spark.sources.versioned import (
        MANIFEST,
        clone_table,
        versions,
    )

    key = _encrypted_demo_key()
    tag = sf_dir.strip("/").replace("/", "_")
    root = os.path.join(tempfile.gettempdir(), "argodb_mapreduce_spark", tag)
    base = os.path.join(root, base_name)
    out = os.path.join(root, out_name)
    src = table_path(sf_dir, "orders")
    if (
        fixture_stale(src, os.path.join(base, MANIFEST))
        or versions(base) != [0, 1]
    ):
        shutil.rmtree(base, ignore_errors=True)
        o = load_table(spark, sf_dir, "orders").select(*cols)
        for m in (0, 1):
            w = (
                o.filter(F.col("o_orderkey") % mod == m)
                .write.format(FORMAT_NAME)
                .option("encryptionKey", key)
            )
            for opt_k, opt_v in (options or {}).items():
                w = w.option(opt_k, opt_v)
            w.mode("append").save(base)
    shutil.rmtree(out, ignore_errors=True)
    clone_table(base, out, version=clone_version)
    return out, key


@register(
    "snapshot_encrypted_gdpr_purge",
    oracle="""
    WITH live AS (
      SELECT * FROM orders WHERE o_orderkey % 10 <> 7
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
           CAST((SELECT COUNT(*) FROM orders WHERE o_orderkey % 10 = 7)
                AS BIGINT) AS rows_erased,
           TRUE AS native_read_refused,
           TRUE AS wrong_key_rejected_at_plan,
           TRUE AS purged_file_keyless_unreadable,
           TRUE AS dv_absorbed,
           TRUE AS key_fp_carried
    FROM live
    """,
    tags=("source", "snapshot", "encryption", "delete", "gdpr", "compaction"),
    doc=(
        "DML ON AN ENCRYPTED TABLE (r14, VERDICT r13 ask #1 — "
        "encryption protects exactly the data GDPR-erase must reach): "
        "a parquet-modular-encrypted table takes a set-based key DELETE "
        "(delete_keys with encryption_key= — the keyed pyarrow scan "
        "replaces the JVM reader, DV commit unchanged) and an OPTIMIZE "
        "purge (compact with encryption_key= — the rewrite re-encrypts "
        "with fresh AES-GCM data keys and ABSORBS the deletion vector, "
        "so erased bytes physically leave disk). Pinned in the oracle "
        "hash: keyless native reads still refuse, a WRONG key is "
        "rejected at PLAN time by the manifest's key fingerprint "
        "(ADVICE r13 — never N tasks deep at HMAC unwrap), the "
        "compacted file is keyless-unreadable, the DV is gone, and the "
        "fingerprint survives the DML chain."
    ),
)
def snapshot_encrypted_gdpr_purge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the keyed scan is one task per encrypted file (the same
    granularity Spark's file-source planning lands on splittable-but-
    encrypted files), file list ships as a DataFrame never a closure,
    and AES-GCM decode runs at memory bandwidth inside the Arrow
    stream. The purge rewrite is the plaintext compact's cost plus
    cipher work; driver traffic stays O(files)."""
    import base64
    import glob as _g
    import shutil
    import tempfile

    import pyarrow.parquet as _pq

    from argodb_mapreduce_spark.catalog import load_table
    from argodb_mapreduce_spark.sources import manifest_log as _ml
    from argodb_mapreduce_spark.sources.versioned import (
        compact,
        delete_keys,
        key_fingerprint,
        snapshot_read,
    )

    register_datasource(spark)
    out, key = _encrypted_clone_fixture(
        spark,
        sf_dir,
        "pyds_enc_gdpr",
        "pyds_enc_gdpr_base",
        ("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"),
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    )
    erase = o.filter(F.col("o_orderkey") % 10 == 7).select("o_orderkey")
    _v, n_erased = delete_keys(
        spark, out, erase, "o_orderkey", encryption_key=key
    )
    compact(spark, out, flatten=True, encryption_key=key)
    head = _ml.head_entry(out)
    native_refused = False
    try:
        snapshot_read(spark, out)
    except ValueError:
        native_refused = True
    wrong = base64.b64encode(bytes(range(1, 33))).decode()
    wrong_at_plan = False
    try:
        snapshot_read(spark, out, encryption_key=wrong)
    except ValueError as e:
        wrong_at_plan = "fingerprint" in str(e)
    seg_files = sorted(
        _g.glob(os.path.join(out, head["segments"][-1], "*.parquet"))
    )
    keyless_unreadable = False
    try:
        _pq.ParquetFile(seg_files[0]).read()
    except OSError:
        keyless_unreadable = True
    df = snapshot_read(spark, out, encryption_key=key)
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("o_orderkey").cast("long").alias("sum_key"),
        F.lit(n_erased).cast("long").alias("rows_erased"),
        F.lit(native_refused).alias("native_read_refused"),
        F.lit(wrong_at_plan).alias("wrong_key_rejected_at_plan"),
        F.lit(keyless_unreadable).alias("purged_file_keyless_unreadable"),
        F.lit(head.get("dv") is None).alias("dv_absorbed"),
        F.lit(head.get("key_fp") == key_fingerprint(key)).alias(
            "key_fp_carried"
        ),
    )


@register(
    "snapshot_encrypted_change_feed",
    oracle="""
    SELECT CAST(SUM(CASE WHEN o_orderkey % 3 = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_insert,
           CAST(SUM(CASE WHEN o_orderkey % 3 <= 1
                          AND o_orderstatus = 'F' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_delete,
           CAST(SUM(CASE WHEN o_orderkey % 3 <= 1
                          AND o_orderstatus = 'F'
                     THEN o_orderkey ELSE 0 END) AS BIGINT)
               AS sum_deleted_key,
           TRUE AS keyless_feed_refused
    FROM orders
    """,
    tags=("source", "snapshot", "encryption", "cdf", "delete"),
    doc=(
        "BATCH CHANGE DATA FEED OVER AN ENCRYPTED TABLE (r14, VERDICT "
        "r13 ask #2): change_feed(..., encryption_key=) reads insert "
        "legs (appended segments) and DV-delta delete legs through the "
        "keyed pyarrow scan — the same O(changes) leg construction the "
        "plaintext feed uses, AES-GCM decode inside the Arrow stream. "
        "Pinned: the keyless feed still fails loud, and the keyed "
        "legs' counts and deleted-key sum hash-match DuckDB over the "
        "plaintext source."
    ),
)
def snapshot_encrypted_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: identical leg bounds to the plaintext feed — an append's
    inserts scan only the new segment, a DELETE's legs only the DV-
    delta's files; the cipher adds per-file stream work, never a
    table scan."""
    import shutil
    import tempfile

    from argodb_mapreduce_spark.catalog import load_table
    from argodb_mapreduce_spark.sources.versioned import (
        change_feed,
        delete_where,
    )

    register_datasource(spark)
    # Fork at v0: the feed needs the second append as the CLONE's own
    # v1 commit (a head clone would fold both segments into one entry).
    out, key = _encrypted_clone_fixture(
        spark,
        sf_dir,
        "pyds_enc_cdf",
        "pyds_enc_cdf_base",
        ("o_orderkey", "o_orderstatus"),
        mod=3,
        clone_version=0,
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    (
        o.filter(F.col("o_orderkey") % 3 == 1)
        .write.format(FORMAT_NAME)
        .option("encryptionKey", key)
        .mode("append")
        .save(out)
    )
    delete_where(
        spark, out, [("o_orderstatus", "=", "F")], encryption_key=key
    )
    keyless_refused = False
    try:
        change_feed(spark, out, 0, 2).count()
    except ValueError:
        keyless_refused = True
    feed = change_feed(spark, out, 0, 2, encryption_key=key)
    ct = F.col("_change_type")
    return feed.agg(
        F.sum((ct == "insert").cast("long")).alias("n_insert"),
        F.sum((ct == "delete").cast("long")).alias("n_delete"),
        F.sum(
            F.when(ct == "delete", F.col("o_orderkey")).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("sum_deleted_key"),
        F.lit(keyless_refused).alias("keyless_feed_refused"),
    )


@register(
    "snapshot_encrypted_upsert",
    oracle=f"""
    WITH final AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 10 = 3
                  THEN o_totalprice * 2 ELSE o_totalprice END AS price
      FROM orders
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
           {_sql_dsum('price', 3)} AS sum_price,
           TRUE AS rewrite_keyless_unreadable,
           TRUE AS key_fp_carried
    FROM final
    """,
    tags=("source", "snapshot", "encryption", "merge", "dml"),
    doc=(
        "MERGE (UPSERT) ON AN ENCRYPTED TABLE (r14, completes the "
        "encrypted DML trio next to the keyed GDPR erase and DELETE "
        "WHERE): merge_upsert(..., encryption_key=) discovers touched "
        "files through the keyed pyarrow scan (same O(matches) "
        "metadata bound), rewrites them through the re-encrypting "
        "Arrow writer (fresh AES-GCM data keys; no manifest "
        "stats/blooms — no value-range leak), and the CHECK-constraint "
        "gate validates the rewrite FRAME since staged encrypted bytes "
        "cannot be re-read natively. Pinned: the rewritten segment is "
        "keyless-unreadable, the key fingerprint survives the commit, "
        "and the upserted state hash-matches DuckDB's CASE-rewrite of "
        "the plaintext source."
    ),
)
def snapshot_encrypted_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: identical bounds to plaintext MERGE — touched-file
    discovery is O(matches) driver metadata, the rewrite O(touched
    segments) with cipher work at memory bandwidth; enableChangeDataFeed
    is structurally refused (plaintext sidecar) and the feed
    synthesizes keyed file-level legs instead."""
    import glob as _g
    import shutil
    import tempfile

    import pyarrow.parquet as _pq

    from argodb_mapreduce_spark.catalog import load_table
    from argodb_mapreduce_spark.functions.oracle_safe import dsum
    from argodb_mapreduce_spark.sources import manifest_log as _ml
    from argodb_mapreduce_spark.sources.versioned import (
        key_fingerprint,
        merge_upsert,
        snapshot_read,
    )

    register_datasource(spark)
    # Shares the 3-column %2-split base with the key-rotation fixture:
    # both mutate only their own clone (MERGE rewrite here, sidecar
    # rotation there), so one cached base serves both.
    out, key = _encrypted_clone_fixture(
        spark,
        sf_dir,
        "pyds_enc_mrg",
        "pyds_enc_3col_base",
        ("o_orderkey", "o_totalprice", "o_orderstatus"),
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    src = o.filter(F.col("o_orderkey") % 10 == 3).withColumn(
        "o_totalprice", F.col("o_totalprice") * 2
    )
    merge_upsert(spark, out, src, "o_orderkey", encryption_key=key)
    head = _ml.head_entry(out)
    f = sorted(
        _g.glob(os.path.join(out, head["segments"][-1], "*.parquet"))
    )[0]
    keyless_unreadable = False
    try:
        _pq.ParquetFile(f).read()
    except OSError:
        keyless_unreadable = True
    df = snapshot_read(spark, out, encryption_key=key)
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("o_orderkey").cast("long").alias("sum_key"),
        dsum("o_totalprice", 3).alias("sum_price"),
        F.lit(keyless_unreadable).alias("rewrite_keyless_unreadable"),
        F.lit(head.get("key_fp") == key_fingerprint(key)).alias(
            "key_fp_carried"
        ),
    )


@register(
    "snapshot_encrypted_key_rotation",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
           CAST(0 AS BIGINT) AS files_rewritten,
           CAST(2 AS BIGINT) AS rotations,
           TRUE AS old_key_read_refused,
           TRUE AS old_key_write_refused,
           TRUE AS time_travel_under_new_key,
           TRUE AS retired_wrap_scrubbed
    FROM orders WHERE o_orderkey % 4 <> 1
    """,
    tags=("source", "snapshot", "encryption", "rotation", "metadata"),
    doc=(
        "MASTER-KEY ROTATION on an encrypted table (r14): file data "
        "keys are wrapped under a per-table KEY-ENCRYPTION KEY "
        "(envelope encryption), itself wrapped by the master in a "
        "_keys.json sidecar — so rotating the master re-wraps ONE "
        "32-byte secret and rewrites ZERO data files, the only "
        "rotation shape that survives 100 TB. Pinned in the oracle "
        "hash: two successive rotations are O(1) (files_rewritten = "
        "0), retired masters are refused at PLAN time for reads AND "
        "writes, historical versions time-travel under the newest "
        "master (the KEK never changes), keyed DML crosses the "
        "rotation boundary to reach pre-rotation files, and the "
        "retired master's wrapped-KEK blob is SCRUBBED from the "
        "sidecar — the old key can never again recover the KEK from "
        "anything the table stores."
    ),
)
def snapshot_encrypted_key_rotation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Scale: rotation is a driver-side metadata commit under the table
    lock — O(1) regardless of table size. Reads resolve master -> KEK
    once at PLAN time (one sidecar lookup + one HMAC unwrap), so
    per-task decrypt cost is unchanged; a long-lived streaming tail
    survives a mid-stream rotation because the KEK it decrypts with
    never changes."""
    import base64

    from argodb_mapreduce_spark.catalog import load_table, table_rowcount
    from argodb_mapreduce_spark.sources.versioned import (
        _read_keys_sidecar,
        delete_keys,
        key_fingerprint,
        rotate_encryption_key,
        snapshot_read,
    )

    register_datasource(spark)
    k2 = base64.b64encode(bytes(range(100, 132))).decode()
    k3 = base64.b64encode(bytes(range(200, 232))).decode()
    # Shares the cached 3-column %2-split base with the upsert fixture;
    # rotations re-wrap the CLONE's forked KEK sidecar and the keyed
    # erase lands a DV on the clone only — the base stays pristine.
    out, k1 = _encrypted_clone_fixture(
        spark,
        sf_dir,
        "pyds_enc_rot",
        "pyds_enc_3col_base",
        ("o_orderkey", "o_totalprice", "o_orderstatus"),
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    # The clone's v0 references BOTH base segments (head clone), so the
    # time-travel pin expects the full pre-erase row count — read from
    # the catalog's parquet footers, no Spark job.
    n_v0 = table_rowcount(sf_dir, "orders")
    r1 = rotate_encryption_key(out, k1, k2)
    old_read_refused = False
    try:
        snapshot_read(spark, out, encryption_key=k1)
    except ValueError as e:
        old_read_refused = "ROTATED OUT" in str(e)
    old_write_refused = False
    try:
        (
            o.limit(1)
            .write.format(FORMAT_NAME)
            .option("encryptionKey", k1)
            .mode("append")
            .save(out)
        )
    except Exception as e:
        old_write_refused = "fingerprint" in str(e) or "ROTATED" in str(e)
    # keyed DML under the post-rotation master reaches PRE-rotation
    # files (same KEK, new wrap)
    erase = o.filter(F.col("o_orderkey") % 4 == 1).select("o_orderkey")
    delete_keys(spark, out, erase, "o_orderkey", encryption_key=k2)
    r2 = rotate_encryption_key(out, k2, k3)
    tt_ok = (
        snapshot_read(spark, out, version=0, encryption_key=k3).count()
        == n_v0
    )
    sidecar = _read_keys_sidecar(out)
    scrubbed = (
        sidecar["current_fp"] == key_fingerprint(k3)
        and all(
            "wrapped" not in rec
            for rec in sidecar["keks"].values()
            if rec.get("retired")
        )
        and sum(1 for rec in sidecar["keks"].values() if rec.get("retired"))
        == 2
    )
    df = snapshot_read(spark, out, encryption_key=k3)
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("o_orderkey").cast("long").alias("sum_key"),
        F.lit(r1["files_rewritten"] + r2["files_rewritten"])
        .cast("long")
        .alias("files_rewritten"),
        F.lit(r2["rotations"]).cast("long").alias("rotations"),
        F.lit(old_read_refused).alias("old_key_read_refused"),
        F.lit(old_write_refused).alias("old_key_write_refused"),
        F.lit(tt_ok).alias("time_travel_under_new_key"),
        F.lit(scrubbed).alias("retired_wrap_scrubbed"),
    )


@register(
    "pyds_column_encrypted_scan",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_f,
           CAST(SUM(CASE WHEN o_orderkey >= 30000 THEN 1 ELSE 0 END)
                AS BIGINT) AS pruned_rows,
           ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,3))), 3)
               AS sum_price,
           CAST(SUM(o_orderkey) AS BIGINT) AS fmt_keyless_sum_key,
           TRUE AS keyless_full_refused,
           TRUE AS keyless_enc_col_refused,
           TRUE AS stats_plaintext_only,
           TRUE AS enc_col_file_locked
    FROM orders
    """,
    tags=("source", "datasource", "encryption", "projection", "pruning"),
    doc=(
        "COLUMN-level encryption (r14): option('encryptColumns', "
        "'o_totalprice') encrypts ONLY the sensitive column — the rest "
        "of the table stays plaintext, so non-sensitive analytics read "
        "KEYLESS via snapshot_read(columns=[...]) with no key "
        "distribution at all, while the protected column needs the "
        "master. Pinned in the oracle hash: the keyless plaintext-"
        "subset read (rows/sum/status counts), manifest-stats pruning "
        "still working keyless (stats recorded for plaintext columns "
        "only — no value-range leak for the protected one), the keyed "
        "read decrypting the exact price sum, the full keyless read "
        "and keyless projection of the encrypted column both refused "
        "at PLAN time, and the on-disk file serving its plaintext "
        "columns keyless while refusing the encrypted one."
    ),
)
def pyds_column_encrypted_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the keyless subset scan is the keyed scan minus cipher
    work — one task per file, plaintext-footer schema only, encrypted
    columns' chunk metadata NEVER touched (parquet-cpp hard-aborts
    keyless access, so the projection gate fires at plan time).
    Manifest min/max pruning composes for plaintext columns, so a
    keyless dashboard query on a 100 TB column-encrypted table skips
    segments exactly like a plaintext one."""
    import glob as _g

    import pyarrow.parquet as _pq

    from argodb_mapreduce_spark.functions.oracle_safe import dsum
    from argodb_mapreduce_spark.sources import manifest_log as _ml
    from argodb_mapreduce_spark.sources.versioned import snapshot_read

    register_datasource(spark)
    # Read-only fixture: the column-encrypted base caches like every
    # other derived layout; the per-call clone is O(manifest) and keeps
    # the probes (refusal paths, file-level lock check) on a fork.
    out, key = _encrypted_clone_fixture(
        spark,
        sf_dir,
        "pyds_col_enc",
        "pyds_col_enc_base",
        ("o_orderkey", "o_orderstatus", "o_totalprice"),
        options={"encryptColumns": "o_totalprice"},
    )
    keyless_full_refused = False
    try:
        snapshot_read(spark, out)
    except ValueError as e:
        keyless_full_refused = "COLUMN-encrypted" in str(e)
    keyless_enc_refused = False
    try:
        snapshot_read(spark, out, columns=["o_orderkey", "o_totalprice"])
    except ValueError as e:
        keyless_enc_refused = "ENCRYPTED" in str(e)
    head = _ml.head_entry(out)
    statcols = {c for seg in head.get("stats", {}).values() for c in seg}
    stats_plain_only = (
        bool(statcols)
        and "o_totalprice" not in statcols
        and head.get("enc_columns") == ["o_totalprice"]
    )
    f = sorted(_g.glob(os.path.join(out, head["segments"][0], "*.parquet")))[0]
    enc_col_locked = False
    try:
        _pq.ParquetFile(f).read(columns=["o_totalprice"])
    except OSError:
        # ...while the plaintext column serves keyless from the same file
        enc_col_locked = (
            _pq.ParquetFile(f).read(columns=["o_orderkey"]).num_rows > 0
        )
    # The FORMAT-API twin of the keyless subset (r14 `columns` load
    # option — Python data sources get no Spark-side projection
    # pushdown, so the option is the explicit path): value-pinned in
    # the oracle hash, not just a boolean.
    fmt_sum = (
        spark.read.format(FORMAT_NAME)
        .option("columns", "o_orderkey")
        .load(out)
        .agg(F.sum("o_orderkey").cast("long"))
        .first()[0]
    )
    sub = snapshot_read(spark, out, columns=["o_orderkey", "o_orderstatus"])
    pruned = snapshot_read(
        spark,
        out,
        columns=["o_orderkey"],
        predicates=[("o_orderkey", ">=", 30000)],
    )
    keyed = snapshot_read(spark, out, encryption_key=key)
    return (
        sub.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("o_orderkey").cast("long").alias("sum_key"),
            F.sum((F.col("o_orderstatus") == "F").cast("long")).alias("n_f"),
        )
        .crossJoin(
            pruned.agg(F.count(F.lit(1)).cast("long").alias("pruned_rows"))
        )
        .crossJoin(keyed.agg(dsum("o_totalprice", 3).alias("sum_price")))
        .select(
            "n_rows",
            "sum_key",
            "n_f",
            "pruned_rows",
            "sum_price",
            F.lit(fmt_sum).cast("long").alias("fmt_keyless_sum_key"),
            F.lit(keyless_full_refused).alias("keyless_full_refused"),
            F.lit(keyless_enc_refused).alias("keyless_enc_col_refused"),
            F.lit(stats_plain_only).alias("stats_plaintext_only"),
            F.lit(enc_col_locked).alias("enc_col_file_locked"),
        )
    )


@register(
    "pyds_partitioned_write",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
           TRUE AS source_pruned,
           TRUE AS native_equal
    FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
    tags=("sink", "datasource", "partitioning"),
    doc=(
        "PARTITIONED WRITE through the custom Python DataSource (r11): "
        "the Arrow writer's partitionBy option splits each task's batches "
        "by partition value into Hive col=value/ branch files (NULL "
        "sentinel included) and the driver commit records the layout + "
        "partition-column stats in the manifest — the write twin of "
        "the reader's partition decode, under the same per-table "
        "commit lock native writers take. The written table is read "
        "back through BOTH paths: the pyds read plans only the "
        "predicate's branch files (source_pruned pinned) and equals "
        "the native snapshot read (native_equal pinned); values "
        "hash-checked against DuckDB."
    ),
)
def pyds_partitioned_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: per-task branch fan-out is bounded by the partition
    cardinality a task sees; the commit is O(files) renames + one
    manifest append under the lock — the same costs as the native
    partitioned write."""
    import shutil
    import tempfile

    from argodb_mapreduce_spark.catalog import load_table
    from argodb_mapreduce_spark.sources.versioned import snapshot_read

    register_datasource(spark)
    tag = sf_dir.strip("/").replace("/", "_")
    path = os.path.join(
        tempfile.gettempdir(), "argodb_mapreduce_spark", tag, "pyds_part_written"
    )
    shutil.rmtree(path, ignore_errors=True)
    o = load_table(spark, sf_dir, "orders")
    (
        o.write.format(FORMAT_NAME)
        .option("partitionBy", "o_orderpriority")
        .mode("append")
        .save(path)
    )
    preds = [("o_orderpriority", "=", "1-URGENT")]
    full = read_versioned(spark, path).rdd.getNumPartitions()
    df = read_versioned(spark, path, predicates=preds)
    planned = df.rdd.getNumPartitions()
    native_n = snapshot_read(spark, path, predicates=preds).count()
    # native_equal folds into the one aggregate pass over the pyds read
    # (the agg's own COUNT IS the pyds row count — the separate
    # df.count() action re-read the whole source; guide §1.2).
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("o_orderkey").cast("long").alias("sum_key"),
        F.lit(planned < full).alias("source_pruned"),
        (F.count(F.lit(1)) == F.lit(native_n)).alias("native_equal"),
    )


def _stream_fixture(spark: SparkSession, sf_dir: str) -> str:
    """Append-only 3-version orders history for the streaming source."""
    import tempfile

    from argodb_mapreduce_spark.catalog import fixture_stale, load_table, table_path
    from argodb_mapreduce_spark.sources.versioned import MANIFEST, versioned_write, versions

    tag = sf_dir.strip("/").replace("/", "_")
    out = os.path.join(tempfile.gettempdir(), "argodb_mapreduce_spark", tag, "orders_vstream")
    src = table_path(sf_dir, "orders")
    if not fixture_stale(src, os.path.join(out, MANIFEST)) and len(versions(out)) == 3:
        return out
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    o = load_table(spark, sf_dir, "orders")
    for r in (0, 1, 2):
        versioned_write(o.filter(F.col("o_orderkey") % 4 == r), out, mode="append")
    return out


@register(
    "stream_versioned_ingest",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key,
           CAST(SUM(o_orderkey) AS BIGINT) AS sum_key
    FROM orders WHERE o_orderkey % 4 IN (0, 1, 2)
    """,
    tags=("streaming", "source", "snapshot", "live"),
    doc=(
        "STREAMING read of the versioned store (subscribe-to-a-table): "
        "the custom Python DataSource's DataSourceStreamReader treats "
        "manifest versions as offsets — each micro-batch consumes "
        "exactly the segments published since the last committed "
        "offset, file-aligned partitions, Arrow batch reads, fail-loud "
        "on non-append history (the Delta streaming-source contract). "
        "The query drains a 3-append history under availableNow and "
        "aggregates the consumed rows; the oracle pins them to the "
        "union of the appends. Incremental continuation (a second "
        "checkpointed run reading ONLY a post-hoc append) is proven in "
        "tests/test_python_datasource.py."
    ),
)
def stream_versioned_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: a micro-batch lists only the delta segments' files (the
    O(new data) daily-ingest contract) and the offset log is
    O(versions); the aggregate itself is the usual map-side-combinable
    shape. This is the missing half of the InputFormat re-expression:
    the reference only ever scans a pinned snapshot, while a lake
    engine also TAILS the table as a stream."""
    register_datasource(spark)
    out = _stream_fixture(spark, sf_dir)
    s = spark.readStream.format(FORMAT_NAME).load(out)
    agg = s.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("o_orderkey").cast("long").alias("min_key"),
        F.max("o_orderkey").cast("long").alias("max_key"),
        F.sum("o_orderkey").cast("long").alias("sum_key"),
    )
    sink = "stream_versioned_ingest_sink"
    # State width derived from the bounded input (r14, guide §2.2): the
    # streaming agg commits one state-store delta per shuffle partition
    # per micro-batch; _run_to_memory scales the width to the source's
    # row count (catalog footer metadata, no job) and restores it.
    from argodb_mapreduce_spark.catalog import table_rowcount
    from argodb_mapreduce_spark.streaming.windows import _run_to_memory

    _run_to_memory(agg, sink, "complete", input_rows=table_rowcount(sf_dir, "orders"))
    return spark.table(sink)


@register(
    "stream_backlog_drain",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
           2 AS runs,
           TRUE AS exactly_once
    FROM orders WHERE o_orderkey % 4 IN (0, 1, 2)
    """,
    tags=("streaming", "source", "admission-control", "live"),
    doc=(
        "BOUNDED BACKLOG DRAIN (streaming admission control): a new "
        "subscriber to a 3-version history drains it in availableNow "
        "runs of at most 2 manifest versions each (drain_backlog: reads "
        "the checkpoint's committed offset, bounds the next run with "
        "the restart-safe absolute endVersion option, repeats) — 2 runs "
        "for 3 versions, run count pinned by the oracle. exactly_once "
        "is re-counted from the sink: drained rows = distinct drained "
        "rows = the union of the appends. The Python DataSource "
        "streaming API has no engine-side admission hook, so the bound "
        "lives at the orchestration layer; a stale endVersion below "
        "committed progress fails stop (tests/test_stream_ratelimit.py) "
        "instead of regressing the offset log."
    ),
)
def stream_backlog_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: each run's micro-batch is <= max_versions_per_run
    segments — a years-deep backlog on a 100 TB table drains in
    executor-memory-sized bites instead of one O(backlog) batch; the
    checkpoint introspection is two dir listings + one small file."""
    import shutil
    import tempfile

    out = _stream_fixture(spark, sf_dir)
    tag = sf_dir.strip("/").replace("/", "_")
    scratch = os.path.join(
        tempfile.gettempdir(), "argodb_mapreduce_spark", tag, "backlog_drain"
    )
    shutil.rmtree(scratch, ignore_errors=True)
    sink = os.path.join(scratch, "sink")
    ck = os.path.join(scratch, "ck")

    def conf(s):
        return (
            s.writeStream.format("parquet").option("path", sink).outputMode("append")
        )

    res = drain_backlog(spark, out, ck, conf, max_versions_per_run=2)
    drained = spark.read.parquet(sink)
    # ONE pass over the sink instead of three (count + distinct().count()
    # + final agg, guide §1.2): group by the full row, then the total is
    # sum(multiplicity), the distinct count is the group count, and
    # exactly-once is their equality — computed in the same aggregate
    # that answers the oracle columns.
    g = drained.groupBy(*drained.columns).agg(F.count(F.lit(1)).alias("__m"))
    return g.agg(
        F.sum("__m").cast("long").alias("n_rows"),
        F.sum(F.col("o_orderkey") * F.col("__m")).cast("long").alias("sum_key"),
        F.lit(res["runs"]).alias("runs"),
        (F.sum("__m") == F.count(F.lit(1))).alias("exactly_once"),
    )


def _rowgroup_fixture(spark: SparkSession, sf_dir: str) -> str:
    """ONE segment, ONE file, MANY row groups: orders sorted by
    o_orderkey written with a 64 KiB parquet block size, so each row
    group's key range is tight and a selective key predicate can skip
    most groups — the within-file layout a clustered 100 TB table has."""
    import tempfile

    from argodb_mapreduce_spark.catalog import fixture_stale, load_table, table_path
    from argodb_mapreduce_spark.sources.versioned import (
        MANIFEST,
        versioned_write,
        versions,
    )

    tag = sf_dir.strip("/").replace("/", "_")
    out = os.path.join(
        tempfile.gettempdir(), "argodb_mapreduce_spark", tag, "orders_rowgroups"
    )
    src = table_path(sf_dir, "orders")
    if not fixture_stale(src, os.path.join(out, MANIFEST)) and len(versions(out)) == 1:
        return out
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    o = load_table(spark, sf_dir, "orders").orderBy("o_orderkey").coalesce(1)
    hc = spark.sparkContext._jsc.hadoopConfiguration()
    old_block = hc.get("parquet.block.size")
    hc.set("parquet.block.size", str(64 * 1024))
    try:
        versioned_write(o, out, mode="append")
    finally:
        if old_block is None:
            hc.unset("parquet.block.size")
        else:
            hc.set("parquet.block.size", old_block)
    return out


@register(
    "pyds_rowgroup_pruned_scan",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
           TRUE AS rowgroups_skipped,
           TRUE AS file_not_skippable
    FROM orders
    WHERE o_orderkey <= (SELECT MAX(o_orderkey) FROM orders) // 10
    """,
    tags=("source", "datasource", "pushdown", "data-skipping", "rowgroup"),
    doc=(
        "ROW-GROUP skipping inside the Python DataSource — one "
        "granularity BELOW the manifest's file-level stats (the "
        "reference's rowset-level skip, splitRowSetsToFiles + per-"
        "rowset predicate evaluation, re-expressed over parquet "
        "footers): a selective key predicate on a key-sorted single-"
        "file segment cannot skip the FILE (its manifest min/max spans "
        "all keys — file_not_skippable pins that), but the reader "
        "consults each row group's footer statistics with the same "
        "conservative test and reads only the groups whose range may "
        "match (rowgroups_skipped pins kept < total). Values hash-"
        "checked against DuckDB over the same predicate; deletion-"
        "vector masking stays position-exact because skipped groups "
        "still advance the file-global row offset "
        "(tests/test_python_datasource.py)."
    ),
)
def pyds_rowgroup_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the skip decision is O(row groups) footer metadata per
    planned file, executor-side, zero data reads — on a clustered
    100 TB table a point-ish predicate reads a few MB per file instead
    of the full 128 MB-row-grouped file body."""
    import glob as _glob

    import pyarrow.parquet as _pq

    from argodb_mapreduce_spark.sources.versioned import _read_manifest, _stat_decode

    out = _rowgroup_fixture(spark, sf_dir)
    # The predicate bound comes from the MANIFEST's own max-key stat —
    # pure metadata, no Spark job (the oracle mirrors it as MAX(...)).
    k = _stat_decode(_read_manifest(out)[-1]["stats"]["data-0"]["o_orderkey"][1]) // 10
    preds = [("o_orderkey", "<=", int(k))]
    df = read_versioned(spark, out, predicates=preds)
    # Observability: the same selection helper the executor runs.
    hooks = make_versioned_datasource()._test_hooks
    fp = sorted(_glob.glob(os.path.join(out, "data-0", "*.parquet")))[0]
    pf = _pq.ParquetFile(fp)
    kept, _offs = hooks["select_row_groups"](pf, preds)
    total = pf.metadata.num_row_groups
    # File-level stats span the whole key range: the file itself is
    # not skippable (planned splits == 1 == all files).
    planned = df.rdd.getNumPartitions()
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("o_orderkey").cast("long").alias("sum_key"),
        F.lit(0 < len(kept) < total).alias("rowgroups_skipped"),
        F.lit(planned == 1).alias("file_not_skippable"),
    )


@register(
    "pyds_pruned_scan",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
           TRUE AS source_pruned_files
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1999-03-01'
      AND o_orderdate <  TIMESTAMP '2000-09-01'
    """,
    tags=("source", "datasource", "pushdown", "data-skipping"),
    doc=(
        "Predicate pushdown INSIDE the custom Python DataSource: a "
        "date-range predicate rides the immutable `prune` load option "
        "and partitions() drops every file whose manifest min/max "
        "provably excludes it — the filtered relation plans FEWER file "
        "partitions than an unpruned load (flag oracle-pinned) while "
        "the row-level residual keeps the result exact (hash-checked). "
        "This is the reference's own pushdown CHANNEL (a filter string "
        "passed beside the path, ArgodbMapreduceInputFormat.java:"
        "208-255) generalized from static partition equality to range "
        "predicates on any stats-bearing column. Catalyst's 4.1 "
        "pushFilters hook is deliberately not used: Spark's scan-reuse "
        "cache leaks a pushed-down partition list into later unfiltered "
        "plans of the same relation (empirically verified), while load "
        "options are pinned per relation — correct by construction "
        "(tests/test_python_datasource.py pins both facts)."
    ),
)
def pyds_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: option parse + stat compare are plan-time metadata over
    the O(segments) manifest; a selective predicate on a 100 TB table
    launches tasks only for the surviving files."""
    import datetime as _dt

    from argodb_mapreduce_spark.sources.versioned import (
        _PRUNE_HI,
        _PRUNE_LO,
        _build_pruned_fixture,
    )

    path = _build_pruned_fixture(spark, sf_dir)
    preds = [
        ("o_orderdate", ">=", _dt.datetime.fromisoformat(_PRUNE_LO)),
        ("o_orderdate", "<", _dt.datetime.fromisoformat(_PRUNE_HI)),
    ]
    full_parts = read_versioned(spark, path).rdd.getNumPartitions()
    pruned_df = read_versioned(spark, path, predicates=preds)
    # Partition counts ARE the pruning evidence: the python-datasource
    # scan plans one task per surviving file (metadata-only check).
    pruned = pruned_df.rdd.getNumPartitions() < full_parts
    return pruned_df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("o_orderkey").cast("long").alias("sum_key"),
        F.lit(pruned).alias("source_pruned_files"),
    )


@register(
    "pyds_partitioned_scan",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key,
           TRUE AS file_precise_prune,
           TRUE AS source_pruned_files
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1998-01-01'
      AND o_orderpriority = '1-URGENT'
    """,
    tags=("source", "datasource", "partitioning", "data-skipping"),
    doc=(
        "Partition-aware Python DataSource (VERDICT r10 #1): the pyds "
        "path now plans one split per (segment, partition-branch) file "
        "of a Hive-partitioned versioned table, decodes partition "
        "values from directory names (NULL sentinel included, the "
        "reference record reader's convention, ArgodbMapreduceRecord"
        "Reader.java:172-198), appends them as typed constant columns "
        "executor-side, and PRUNES with them: each file carries its "
        "partition value as an exact [v, v] stat, so the equality "
        "predicate plans exactly the 1-URGENT branch files of the "
        "date-surviving segment (file_precise_prune pins planned "
        "splits == that branch's file count; source_pruned_files pins "
        "planned < full). Values hash-checked against DuckDB over the "
        "same predicate."
    ),
)
def pyds_partitioned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the walk + decode is plan-time metadata over the
    surviving segments' directory tree; a selective partition predicate
    on a 100 TB daily-partitioned table launches tasks only for the one
    branch it touches — through the SAME source path a cluster without
    the native reader would use."""
    import datetime as _dt
    import glob as _glob

    from argodb_mapreduce_spark.sources.versioned import _build_partitioned_fixture

    out = _build_partitioned_fixture(spark, sf_dir)
    preds = [
        ("o_orderdate", ">=", _dt.datetime.fromisoformat("1998-01-01")),
        ("o_orderpriority", "=", "1-URGENT"),
    ]
    full = read_versioned(spark, out).rdd.getNumPartitions()
    df = read_versioned(spark, out, predicates=preds)
    planned = df.rdd.getNumPartitions()
    expected = len(
        _glob.glob(
            os.path.join(out, "data-1", "o_orderpriority=1-URGENT", "*.parquet")
        )
    )
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("o_orderkey").cast("long").alias("min_key"),
        F.max("o_orderkey").cast("long").alias("max_key"),
        F.lit(planned == expected).alias("file_precise_prune"),
        F.lit(planned < full).alias("source_pruned_files"),
    )


def _cdf_update_stream_fixture(spark: SparkSession, sf_dir: str) -> str:
    """CDF-enabled history with a rewrite commit: v0 = orders %3 in
    (0,1), then an UPDATE repricing the 'F' rows (x1.5) recorded in a
    cdc-1 sidecar."""
    import tempfile

    from argodb_mapreduce_spark.catalog import fixture_stale, load_table, table_path
    from argodb_mapreduce_spark.sources.versioned import (
        MANIFEST,
        _read_manifest,
        enable_change_data_feed,
        update_where,
        versioned_write,
        versions,
    )

    tag = sf_dir.strip("/").replace("/", "_")
    out = os.path.join(
        tempfile.gettempdir(), "argodb_mapreduce_spark", tag, "orders_vcdcu"
    )
    src = table_path(sf_dir, "orders")
    if (
        not fixture_stale(src, os.path.join(out, MANIFEST))
        and len(versions(out)) == 2
        and _read_manifest(out)[-1].get("cdc")
    ):
        return out
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    o = load_table(spark, sf_dir, "orders")
    versioned_write(o.filter(F.col("o_orderkey") % 3 <= 1), out, mode="append")
    enable_change_data_feed(out)
    update_where(
        spark,
        out,
        [("o_orderstatus", "=", "F")],
        {"o_totalprice": F.col("o_totalprice") * 1.5},
    )
    return out


@register(
    "stream_change_feed_updates_live",
    oracle=f"""
    SELECT * FROM (
      SELECT 'insert' AS change_type,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             {_sql_dsum('o_totalprice', 3)} AS sum_price
      FROM orders WHERE o_orderkey % 3 IN (0, 1)
      UNION ALL
      SELECT 'update_preimage', CAST(COUNT(*) AS BIGINT),
             {_sql_dsum('o_totalprice', 3)}
      FROM orders WHERE o_orderkey % 3 IN (0, 1) AND o_orderstatus = 'F'
      UNION ALL
      SELECT 'update_postimage', CAST(COUNT(*) AS BIGINT),
             {_sql_dsum('o_totalprice * 1.5', 3)}
      FROM orders WHERE o_orderkey % 3 IN (0, 1) AND o_orderstatus = 'F'
    ) ORDER BY change_type
    """,
    tags=("streaming", "source", "cdc", "update", "live"),
    doc=(
        "STREAMING CHANGE DATA FEED THROUGH AN UPDATE: with "
        "readChangeFeed, a rewrite commit on a CDF-enabled table is "
        "streamed from its cdc-{v} sidecar — one partition per sidecar "
        "file, each row carrying its OWN _change_type (preimage / "
        "postimage legs mixed in one file) plus the _commit_version — "
        "while the rewritten segment itself is NOT re-emitted (its rows "
        "are mostly unchanged carry-over). Without readChangeFeed the "
        "same history stays fail-loud. The drained feed is oracle-"
        "pinned: inserts = v0, pre/post legs = the 'F' rows at original "
        "and x1.5 prices. Closes streaming/batch CDF parity: both paths "
        "now span appends, DV deletes, and sidecar-recorded rewrites."
    ),
)
def stream_change_feed_updates_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: sidecar partitions are O(changed rows) — a streamed day
    of updates costs the day's change volume; plan-time work is one
    directory listing of the sidecar."""
    from argodb_mapreduce_spark.functions.oracle_safe import dsum

    register_datasource(spark)
    out = _cdf_update_stream_fixture(spark, sf_dir)
    s = (
        spark.readStream.format(FORMAT_NAME)
        .option("readChangeFeed", "true")
        .load(out)
    )
    agg = s.groupBy(F.col("_change_type").alias("change_type")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("o_totalprice", 3).alias("sum_price"),
    )
    sink = "stream_change_feed_updates_live_sink"
    # Input-derived state width (r14, guide §2.2) — see stream_versioned_ingest.
    from argodb_mapreduce_spark.catalog import table_rowcount
    from argodb_mapreduce_spark.streaming.windows import _run_to_memory

    _run_to_memory(agg, sink, "complete", input_rows=table_rowcount(sf_dir, "orders"))
    return spark.table(sink).orderBy("change_type")


_REPL_PRICE_FLOOR = 150000.0


def cdc_latest_image_apply(
    spark: SparkSession, replica: str, batch_df: DataFrame, key: str
) -> None:
    """LATEST-IMAGE CDC APPLY (r14 opt, guide §1.2/§2.4): rank each
    key's change-feed legs by commit version and apply only its FINAL
    image — the Delta-documented CDC-merge pattern ("retrieve the
    latest change per key, MERGE once"). A per-version replay commits
    O(versions) DMLs per micro-batch and rewrites hot files once per
    version; the collapse commits at most ONE delete + ONE merge and
    provably lands the same replica state: commit order is respected BY
    the ranking (a later version's image wins), update_preimage legs
    carry no final state, and within one version an insert supersedes a
    delete of the same key (a restore retracts bytes from one file and
    re-adds them in another — the deletes-first rule of the old
    per-version loop, folded into the rank tiebreak). The delete and
    upsert key sets are DISJOINT by construction, so their commit order
    is free. Retry-idempotent: a replayed micro-batch re-collapses to
    the same images (merge idempotent, delete of tombstoned keys a
    no-op); the bootstrap append fires only while the replica has no
    manifest — after a mid-batch crash the retry merges. Correct for
    any version-contiguous micro-batch split (a per-version batch
    degenerates to the old replay). Equivalence to the per-version
    replay is pinned by tests/test_r14_optimizations.py."""
    from pyspark.sql import Window as _W

    from argodb_mapreduce_spark.sources.versioned import (
        delete_keys,
        merge_upsert,
        versioned_write,
    )

    w_latest = _W.partitionBy(key).orderBy(
        F.desc("_commit_version"),
        F.desc(F.col("_change_type") != "delete"),
    )
    latest = (
        batch_df.filter(F.col("_change_type") != "update_preimage")
        .withColumn("__rn", F.row_number().over(w_latest))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "_commit_version")
        .persist()
    )
    try:
        # metadata-collect: ONE 2-row presence aggregate (delete vs
        # upsert legs survive the collapse?) gates the two DMLs.
        present = {
            r["__is_del"]: r["count"]
            for r in latest.groupBy(
                (F.col("_change_type") == "delete").alias("__is_del")
            )
            .count()
            .collect()
        }
        # Bootstrap state sampled ONCE per batch: on a replica with no
        # manifest the delete set cannot match anything (the upsert and
        # delete key sets are disjoint), so deletes are skipped and the
        # upsert lands as the bootstrap append.
        existed = os.path.exists(os.path.join(replica, "_snapshots.json"))
        if present.get(True) and existed:
            delete_keys(
                spark,
                replica,
                latest.filter(F.col("_change_type") == "delete").select(key),
                key,
            )
        if present.get(False):
            ups = latest.filter(F.col("_change_type") != "delete").drop(
                "_change_type"
            )
            if existed:
                merge_upsert(spark, replica, ups, key)
            else:
                versioned_write(ups, replica)
    finally:
        latest.unpersist()


@register(
    "stream_cdc_replicate",
    oracle="""
    WITH final AS (
      SELECT o_orderkey, o_orderstatus,
             CASE WHEN o_orderstatus = 'F' THEN '0-MOVED'
                  ELSE o_orderpriority END AS o_orderpriority,
             o_totalprice
      FROM orders
      WHERE o_orderkey % 3 IN (0, 1)
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
           CAST((SELECT COUNT(*) FROM final WHERE o_orderpriority = '0-MOVED')
                AS BIGINT) AS n_moved,
           TRUE AS replica_equals_source
    FROM final
    """,
    tags=("streaming", "cdc", "replication", "restore", "live"),
    doc=(
        "STREAMING CDC REPLICATION — the full loop: a CDF-enabled "
        "source evolves through two appends, a keyed UPDATE ('F' rows "
        "repriorified), a MID-HISTORY COMPACTION (data_change:false — "
        "skipped by the feed, zero legs), a DELETE, a MID-HISTORY "
        "RESTORE that UNDOES the delete (r13 — the feed synthesizes "
        "the retracted tombstones as resurrection insert legs instead "
        "of dying, so neither maintenance action breaks the replica); "
        "one readChangeFeed stream drains it and "
        "a foreachBatch applier lands each micro-batch with the "
        "LATEST-IMAGE CDC apply (Delta's documented 'retrieve the most "
        "recent change per key, MERGE once' recipe): legs rank by "
        "commit version per key — an insert outranking a delete of the "
        "same version, the restore retract/re-add tiebreak — and only "
        "each key's final image commits, at most ONE delete_keys + ONE "
        "MERGE per micro-batch instead of one DML per source version. "
        "The replica is multiset-proven EQUAL to the source's head "
        "snapshot (flag in the hash) and its content is oracle-pinned "
        "— end to end on this engine, surviving OPTIMIZE and RESTORE."
    ),
)
def stream_cdc_replicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the stream moves O(changes) per version (sidecars, DV
    deltas, and for a restore the segment diff — never unchanged-table
    scans); each MERGE rewrites only replica segments containing
    touched keys and each delete is an O(K) sidecar. Replicating a day
    of changes on a 100 TB table costs the day's change volume — the
    cross-region/downstream-replica pattern."""
    import shutil
    import tempfile

    from argodb_mapreduce_spark.catalog import fixture_stale, load_table, table_path
    from argodb_mapreduce_spark.sources.versioned import (
        MANIFEST,
        compact,
        delete_keys,
        delete_where,
        enable_change_data_feed,
        merge_upsert,
        rollback,
        snapshot_read,
        update_where,
        versioned_write,
        versions,
    )

    register_datasource(spark)
    tag = sf_dir.strip("/").replace("/", "_")
    root = os.path.join(
        tempfile.gettempdir(), "argodb_mapreduce_spark", tag, "cdc_replicate"
    )
    src = os.path.join(root, "src")
    replica = os.path.join(root, "replica")
    ck = os.path.join(root, "ck")
    # The REPLICA and the stream CHECKPOINT are the query's product —
    # fresh every run (the replication is the timed computation). The
    # SOURCE history is an input fixture with a deterministic terminal
    # state — six commits ending in the v5 rollback — so it caches
    # mtime-keyed like every other CDF-history fixture (r14; same
    # contract as _cdf_stream_fixture below, which likewise caches a
    # DML-bearing history).
    shutil.rmtree(replica, ignore_errors=True)
    shutil.rmtree(ck, ignore_errors=True)
    if not (
        not fixture_stale(
            table_path(sf_dir, "orders"), os.path.join(src, MANIFEST)
        )
        and versions(src) == [0, 1, 2, 3, 4, 5]
    ):
        shutil.rmtree(root, ignore_errors=True)
        o = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice"
        )
        versioned_write(o.filter(F.col("o_orderkey") % 3 == 0), src)  # v0
        enable_change_data_feed(src)
        versioned_write(
            o.filter(F.col("o_orderkey") % 3 == 1), src, mode="append"
        )  # v1
        update_where(  # v2: cdc sidecar
            spark,
            src,
            [("o_orderstatus", "=", "F")],
            {"o_orderpriority": F.lit("0-MOVED")},
        )
        compact(spark, src)  # v3: MID-HISTORY OPTIMIZE (data_change:false)
        delete_where(
            spark, src, [("o_totalprice", ">=", _REPL_PRICE_FLOOR)]
        )  # v4: DV
        # v5 (the history's head): MID-HISTORY RESTORE — undo the delete
        # (rollback to the pre-delete compacted state). The feed
        # synthesizes the retracted tombstones as RESURRECTION insert
        # legs, O(deleted rows) — the restore costs the replica the
        # change volume, never a re-bootstrap (the heavyweight
        # remove+readd restore shape is pinned separately in
        # stream_change_feed_through_restore_live).
        rollback(src, 3)

    def apply_batch(batch_df, _batch_id):
        cdc_latest_image_apply(spark, replica, batch_df, "o_orderkey")

    from argodb_mapreduce_spark.streaming.windows import run_stream_resilient

    run_stream_resilient(
        lambda: spark.readStream.format(FORMAT_NAME)
        .option("readChangeFeed", "true")
        .load(src)
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    # ONE pass over replica + head (r15, guide §1.2/§2.4 — the same
    # fold as stream_backlog_drain's 3-passes-to-1): the eager
    # multiset_equal proof job scanned rep+head, then the final agg
    # scanned rep AGAIN. Tag the union ±1, group by the full row, and
    # derive BOTH the equality flag (no group with a nonzero weight
    # sum) and every oracle column (weighted by the replica-side
    # multiplicity) from the single grouped frame — each table is
    # scanned once, one shuffle, one job. Group keys treat NULL==NULL
    # exactly as multiset_equal/exceptAll do.
    rep = snapshot_read(spark, replica)
    head = snapshot_read(spark, src)
    cols = list(rep.columns)
    tagged = rep.withColumn("__w", F.lit(1)).unionAll(
        head.select(*cols).withColumn("__w", F.lit(-1))
    )
    g = tagged.groupBy(*cols).agg(
        F.sum("__w").alias("__d"),
        F.sum(F.when(F.col("__w") == 1, F.lit(1)).otherwise(F.lit(0))).alias("__m"),
    )
    return g.agg(
        F.sum("__m").cast("long").alias("n_rows"),
        F.sum(F.col("o_orderkey") * F.col("__m")).cast("long").alias("sum_key"),
        F.sum(
            F.when(F.col("o_orderpriority") == "0-MOVED", F.col("__m")).otherwise(
                F.lit(0)
            )
        ).cast("long").alias("n_moved"),
        (
            F.coalesce(
                F.sum(F.when(F.col("__d") != 0, F.lit(1)).otherwise(F.lit(0))),
                F.lit(0),
            )
            == 0
        ).alias("replica_equals_source"),
    )


def _cdf_stream_fixture(spark: SparkSession, sf_dir: str) -> str:
    """Append-only history with a trailing DV delete: v0/v1 = orders
    %3==0 / +%3==1, v2 = DELETE WHERE o_orderstatus='F'."""
    import tempfile

    from argodb_mapreduce_spark.catalog import fixture_stale, load_table, table_path
    from argodb_mapreduce_spark.sources.versioned import (
        MANIFEST,
        delete_where,
        versioned_write,
        versions,
    )

    tag = sf_dir.strip("/").replace("/", "_")
    out = os.path.join(
        tempfile.gettempdir(), "argodb_mapreduce_spark", tag, "orders_vcdc"
    )
    src = table_path(sf_dir, "orders")
    if not fixture_stale(src, os.path.join(out, MANIFEST)) and len(versions(out)) == 3:
        return out
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    o = load_table(spark, sf_dir, "orders")
    versioned_write(o.filter(F.col("o_orderkey") % 3 == 0), out, mode="append")
    versioned_write(o.filter(F.col("o_orderkey") % 3 == 1), out, mode="append")
    delete_where(spark, out, [("o_orderstatus", "=", "F")])
    return out


@register(
    "stream_change_feed_live",
    oracle="""
    SELECT 'insert' AS _change_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(o_orderkey) AS BIGINT) AS sum_key
    FROM orders WHERE o_orderkey % 3 IN (0, 1)
    UNION ALL
    SELECT 'delete',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(o_orderkey) AS BIGINT)
    FROM orders WHERE o_orderkey % 3 IN (0, 1) AND o_orderstatus = 'F'
    """,
    tags=("streaming", "source", "cdc", "deletion-vector", "live"),
    doc=(
        "STREAMING CHANGE DATA FEED: the versioned-store stream source "
        "with option('readChangeFeed','true') emits appended segments "
        "as _change_type='insert' rows AND deletion-vector commits as "
        "'delete' rows — the tombstoned positions of each DV DELTA are "
        "resolved per file at plan time and materialized back into full "
        "rows executor-side, each tagged with its _commit_version. The "
        "drained feed is oracle-pinned: inserts equal the two appends' "
        "union, deletes equal exactly the status-'F' rows the DV "
        "removed. Completes streaming CDC over the store: the plain "
        "tail (fail-loud on deletes), ignoreDeletes (skip them), and "
        "now the Delta readChangeFeed contract (consume them)."
    ),
)
def stream_change_feed_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: insert partitions list only delta segments (O(new data));
    delete partitions carry O(deleted rows) positions resolved from the
    tiny DV sidecars — a day's CDC stream costs the day's changes,
    never a table scan."""
    register_datasource(spark)
    out = _cdf_stream_fixture(spark, sf_dir)
    s = (
        spark.readStream.format(FORMAT_NAME)
        .option("readChangeFeed", "true")
        .load(out)
    )
    agg = s.groupBy("_change_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("o_orderkey").cast("long").alias("sum_key"),
    )
    sink = "stream_change_feed_live_sink"
    # Input-derived state width (r14, guide §2.2) — see stream_versioned_ingest.
    from argodb_mapreduce_spark.catalog import table_rowcount
    from argodb_mapreduce_spark.streaming.windows import _run_to_memory

    _run_to_memory(agg, sink, "complete", input_rows=table_rowcount(sf_dir, "orders"))
    return spark.table(sink)


def _cdf_optimize_fixture(spark: SparkSession, sf_dir: str) -> str:
    """Maintenance-interleaved CDF history: append (v0: %3==0), append
    (v1: %3==1), COMPACT (v2 — ``data_change: false``), append (v3:
    %3==2), then a DV DELETE of the status-'F' rows (v4) whose delta
    spans the compacted segment and the post-compaction append."""
    import tempfile

    from argodb_mapreduce_spark.catalog import fixture_stale, load_table, table_path
    from argodb_mapreduce_spark.sources.versioned import (
        MANIFEST,
        compact,
        delete_where,
        versioned_write,
        versions,
    )

    tag = sf_dir.strip("/").replace("/", "_")
    out = os.path.join(
        tempfile.gettempdir(), "argodb_mapreduce_spark", tag, "orders_vcdc_opt"
    )
    src = table_path(sf_dir, "orders")
    if not fixture_stale(src, os.path.join(out, MANIFEST)) and len(versions(out)) == 5:
        return out
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    o = load_table(spark, sf_dir, "orders")
    versioned_write(o.filter(F.col("o_orderkey") % 3 == 0), out, mode="append")
    versioned_write(o.filter(F.col("o_orderkey") % 3 == 1), out, mode="append")
    compact(spark, out)  # v2: dataChange=false maintenance commit
    versioned_write(o.filter(F.col("o_orderkey") % 3 == 2), out, mode="append")
    delete_where(spark, out, [("o_orderstatus", "=", "F")])  # v4: DV
    return out


@register(
    "stream_change_feed_through_optimize",
    oracle="""
    SELECT 'insert' AS _change_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(o_orderkey) AS BIGINT) AS sum_key
    FROM orders
    UNION ALL
    SELECT 'delete',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(o_orderkey) AS BIGINT)
    FROM orders WHERE o_orderstatus = 'F'
    """,
    tags=("streaming", "source", "cdc", "compaction", "maintenance", "live"),
    doc=(
        "STREAMING CDF THROUGH OPTIMIZE — maintenance and incremental "
        "consumers compose: the history is append, append, COMPACT "
        "(tagged data_change:false, Delta's OPTIMIZE contract), append, "
        "DV DELETE; one readChangeFeed stream drains it GREEN. The "
        "compaction commit contributes ZERO legs (it rearranges bytes, "
        "the live rows are identical) while the appends around it emit "
        "insert legs and the post-compaction DELETE emits delete legs "
        "whose positions resolve inside the COMPACTED file — proven by "
        "the oracle pin: inserts equal the full table exactly once "
        "(a re-emitted compacted segment would double-count), deletes "
        "equal the status-'F' rows. Before r12 this history KILLED the "
        "stream (non-append raise); now OPTIMIZE never breaks a CDC "
        "subscriber."
    ),
)
def stream_change_feed_through_optimize(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Scale: the skip is O(1) per maintenance commit (a manifest-entry
    tag check at plan time); the feed still moves only O(changes) — a
    nightly OPTIMIZE on a 100 TB table costs its CDC subscribers
    nothing."""
    register_datasource(spark)
    out = _cdf_optimize_fixture(spark, sf_dir)
    s = (
        spark.readStream.format(FORMAT_NAME)
        .option("readChangeFeed", "true")
        .load(out)
    )
    agg = s.groupBy("_change_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("o_orderkey").cast("long").alias("sum_key"),
    )
    sink = "stream_change_feed_through_optimize_sink"
    # Input-derived state width (r14, guide §2.2) — see stream_versioned_ingest.
    from argodb_mapreduce_spark.catalog import table_rowcount
    from argodb_mapreduce_spark.streaming.windows import _run_to_memory

    _run_to_memory(agg, sink, "complete", input_rows=table_rowcount(sf_dir, "orders"))
    return spark.table(sink)


@register(
    "stream_change_feed_through_restore_live",
    oracle="""
    SELECT 'insert' AS _change_type, CAST(0 AS BIGINT) AS _commit_version,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(o_orderkey) AS BIGINT) AS sum_key
    FROM orders WHERE o_orderkey % 3 = 0
    UNION ALL
    SELECT 'insert', 1, CAST(COUNT(*) AS BIGINT), CAST(SUM(o_orderkey) AS BIGINT)
    FROM orders WHERE o_orderkey % 3 = 1
    UNION ALL
    SELECT 'delete', 2, CAST(COUNT(*) AS BIGINT), CAST(SUM(o_orderkey) AS BIGINT)
    FROM orders WHERE o_orderkey % 30 = 0
    UNION ALL
    SELECT 'delete', 3, CAST(COUNT(*) AS BIGINT), CAST(SUM(o_orderkey) AS BIGINT)
    FROM orders WHERE o_orderkey % 3 = 1
    UNION ALL
    SELECT 'insert', 3, CAST(COUNT(*) AS BIGINT), CAST(SUM(o_orderkey) AS BIGINT)
    FROM orders WHERE o_orderkey % 30 = 0
    UNION ALL
    SELECT 'insert', 4, CAST(COUNT(*) AS BIGINT), CAST(SUM(o_orderkey) AS BIGINT)
    FROM orders WHERE o_orderkey % 3 = 2
    """,
    tags=("streaming", "source", "cdc", "rollback", "restore", "live"),
    doc=(
        "STREAMING CDF THROUGH RESTORE (r13, VERDICT r12 #1's streaming "
        "half): the history is append, append, keyed DELETE (DV), "
        "RESTORE to v0 — which both REMOVES the second segment and "
        "RETRACTS the delete's tombstones — then a post-restore append. "
        "One readChangeFeed stream drains it green: the restore commit "
        "synthesizes the removed segment's live rows as delete legs AND "
        "the un-tombstoned positions as RESURRECTION insert legs (both "
        "tagged _commit_version 3), and the stream keeps consuming the "
        "append after it. Every (change_type, version) cell is "
        "oracle-pinned separately — before r13 this history KILLED the "
        "subscriber at the restore (non-append raise)."
    ),
)
def stream_change_feed_through_restore_live(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Scale: the synthesized legs are O(changed files + DV delta) per
    restore — removed/readded files plus position-joined touched files;
    shared segments are never rescanned. A RESTORE on a 100 TB table
    costs its CDC subscribers the segment diff, not a re-bootstrap."""
    import shutil
    import tempfile

    from argodb_mapreduce_spark.catalog import fixture_stale, load_table, table_path
    from argodb_mapreduce_spark.sources.versioned import (
        MANIFEST,
        delete_keys,
        rollback,
        versioned_write,
        versions,
    )

    register_datasource(spark)
    tag = sf_dir.strip("/").replace("/", "_")
    out = os.path.join(
        tempfile.gettempdir(), "argodb_mapreduce_spark", tag, "orders_vcdc_restore"
    )
    # The 5-commit restore history is a deterministic terminal state the
    # stream only READS — it caches mtime-keyed like every other
    # CDF-history fixture (r14; the _cdf_stream_fixture contract). The
    # drain + the aggregate are the timed computation, not the history.
    if not (
        not fixture_stale(table_path(sf_dir, "orders"), os.path.join(out, MANIFEST))
        and versions(out) == [0, 1, 2, 3, 4]
    ):
        shutil.rmtree(out, ignore_errors=True)
        o = load_table(spark, sf_dir, "orders")
        k = F.col("o_orderkey")
        versioned_write(o.filter(k % 3 == 0), out)  # v0
        versioned_write(o.filter(k % 3 == 1), out, mode="append")  # v1
        delete_keys(
            spark, out, o.filter(k % 30 == 0).select("o_orderkey"), "o_orderkey"
        )  # v2: DV
        rollback(out, 0)  # v3: RESTORE — drops a segment AND retracts the DV
        versioned_write(o.filter(k % 3 == 2), out, mode="append")  # v4
    s = (
        spark.readStream.format(FORMAT_NAME)
        .option("readChangeFeed", "true")
        .load(out)
    )
    agg = s.groupBy("_change_type", "_commit_version").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("o_orderkey").cast("long").alias("sum_key"),
    )
    sink = "stream_change_feed_through_restore_live_sink"
    # Input-derived state width (r14, guide §2.2) — see stream_versioned_ingest.
    from argodb_mapreduce_spark.catalog import table_rowcount
    from argodb_mapreduce_spark.streaming.windows import _run_to_memory

    _run_to_memory(agg, sink, "complete", input_rows=table_rowcount(sf_dir, "orders"))
    return spark.table(sink)
