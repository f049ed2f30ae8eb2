"""SnapLog: a from-scratch snapshot-log table format over immutable parquet.

Why this exists: the production target (BASELINE.json north_star) is an
Iceberg `transcripts` table — `days(ts), bucket(conv_id)` partitioning,
snapshot-id lineage, `overwritePartitions` sink commits — but no Iceberg
runtime jar can enter this container (CATALOG.md logs every attempted
avenue: no bundled jar, no ivy/m2 cache, no DNS/egress, no pip). Rather
than leave the catalog semantics permanently simulated, this module
implements the log-structured core of such a format from scratch, following
the publicly documented design shared by Iceberg's spec and Delta's
transaction log: a table is an immutable pile of data files plus an
append-only log of snapshots, and a commit is ONE atomic small-file
operation.

Layout::

    table/
      data/<commit-uuid>/[p=v/...]part-*.parquet   immutable; one dir per commit
      _snaplog/v{N}.json                           snapshot N (the log)

A snapshot JSON carries the FULL live-file listing (path, partition tuple,
size), the parent snapshot id, the logical schema, and an operation summary.
Readers never list data directories: they resolve the newest ``v{N}.json``
(or any pinned snapshot id — time travel) and hand Spark the explicit file
list, so

  * partition pruning happens at the MANIFEST level — a partition filter
    drops files before Spark opens a single footer (Iceberg's
    manifest-pruning benefit, which plain Hive-layout listing can't give on
    an object store where LIST is the slow call);
  * a crash between data-file write and manifest commit leaves orphan files
    and the PREVIOUS snapshot live — never a partial table (write-ahead
    ordering: data first, log last);
  * concurrent writers race on ``create(v{N+1}.json, overwrite=false)``;
    exactly one wins, the loser re-reads the new head and retries with its
    still-valid immutable data files (optimistic concurrency, the same
    protocol Iceberg runs against its catalog pointer).

Operations: ``append``, ``overwrite_partitions`` (replaces exactly the
partitions present in the incoming frame — the idempotent sink commit the
north rule's resume depends on), ``read`` (latest / by snapshot id / by
version, with manifest-level partition pruning), ``history``, ``rollback``
(a NEW snapshot pointing at an old file set — the log stays append-only),
and ``expire_snapshots`` (physically deletes files unreachable from the
retained log suffix).

Partition values live in the metadata, not the data files (files are
written ``partitionBy(...)`` so the values come from the directory names,
exactly once, at commit time); ``read`` re-attaches them as typed literal
columns per file group, so round-trips preserve the logical schema.

Scale notes (10^12-turn table): the log is O(days x files-per-day) small
JSON on the driver-side control plane — the data plane stays entirely in
executors. Snapshot JSONs carry full listings, so resolving a snapshot is
one small read (no log replay as in Delta); at petabyte file counts the
next step is Iceberg's split of listing into reusable manifest files, which
changes the constant, not the protocol. All I/O goes through the Hadoop
FileSystem API, so ``file://``, ``hdfs://`` and ``s3a://`` behave alike
(on S3A, ``create(overwrite=false)`` maps to a conditional PUT under
recent Hadoop; older stacks would commit through a catalog service — the
same caveat checkpoint.py documents for its manifest).

Reference tie-in: the reference pipeline persists run artifacts by
overwriting whole JSON result files (/root/reference/factcheck/__init__.py:131
``save_to_file`` / webservice ``api_*.json``); SnapLog is that persistence
recast as a table format with atomic, versioned, partition-granular commits.
"""

from __future__ import annotations

import hashlib
import json
import posixpath
import uuid
from urllib.parse import unquote

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

LOG_DIR = "_snaplog"
DATA_DIR = "data"
FORMAT_VERSION = 1
_COMMIT_RETRIES = 10
# Schemes with no atomic namespace rename: publish via create(overwrite=false)
# — a conditional PUT — instead of tmp+rename (see create_exclusive).
_OBJECT_STORE_SCHEMES = frozenset(
    {"s3a", "s3", "s3n", "gs", "abfs", "abfss", "wasb", "wasbs", "oss", "cos"}
)


class CommitConflict(RuntimeError):
    """All optimistic-commit retries lost the race for the next version."""


def _publish_strategy(scheme: str) -> str:
    """How create_exclusive publishes the log entry for a filesystem scheme:
    'link' (POSIX hard-link, atomic no-overwrite), 'put' (direct
    create(overwrite=false) = conditional PUT — object stores have no atomic
    rename), or 'rename' (HDFS-style atomic namespace rename)."""
    if scheme == "file":
        return "link"
    if scheme in _OBJECT_STORE_SCHEMES:
        return "put"
    return "rename"


class _Fs:
    """Thin Hadoop FileSystem wrapper (same rationale as checkpoint._ManifestIO:
    driver-local open() would break on hdfs:// / s3a:// table roots)."""

    def __init__(self, spark: SparkSession, root: str):
        jvm = spark._jvm
        self._jvm = jvm
        self.path_cls = jvm.org.apache.hadoop.fs.Path
        self.root = root.rstrip("/")
        self._root_path = self.path_cls(self.root)
        self.fs = self._root_path.getFileSystem(spark._jsc.hadoopConfiguration())

    def path(self, *segments: str) -> "object":
        return self.path_cls(posixpath.join(self.root, *segments))

    def exists(self, p) -> bool:
        return self.fs.exists(p)

    def read_json(self, p) -> dict:
        stream = self.fs.open(p)
        try:
            raw = self._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        finally:
            stream.close()
        return json.loads(bytes(raw).decode("utf-8"))

    def create_exclusive(self, p, payload: dict) -> bool:
        """Atomic create-no-overwrite; False when another writer won the race.

        The payload is fully written to a TEMP name first and then published
        whole, so a crash or I/O error mid-payload leaves only an ignorable
        ``.tmp`` file — never a truncated ``v{N}.json`` that every later read
        would choke on (the same tmp+rename discipline as
        checkpoint._ManifestIO). The publish step must BOTH be atomic and
        refuse an existing destination (POSIX rename(2) silently REPLACES the
        destination — publishing via plain rename would let a race loser
        overwrite the winner's committed head):

        * ``file://`` — hard-link the tmp into place (``link(2)`` fails with
          EEXIST atomically; the one POSIX primitive with exactly these
          semantics), then unlink the tmp;
        * object stores (s3a/s3/gs/abfs/...) — write the payload DIRECTLY via
          ``create(p, overwrite=false)``: on these there is no atomic rename
          (S3A rename is a non-atomic copy) and exists()+rename is
          check-then-act, so two racing committers could both publish and one
          would silently overwrite the other's head. ``create(overwrite=false)``
          maps to a conditional PUT (the object materializes whole at close,
          so no torn state is readable on a real object store);
        * other filesystems (HDFS etc.) — rename-without-overwrite, which is
          an atomic namespace operation there, behind an exists() recheck."""
        if self.fs.exists(p):
            # non-authoritative fast path: skip serializing the full file
            # listing to a doomed tmp when the slot is visibly taken (the
            # link/rename below stays the real arbiter)
            return False
        body = bytearray(json.dumps(payload).encode("utf-8"))
        strategy = _publish_strategy(self.fs.getUri().getScheme())
        if strategy == "put":
            try:
                out = self.fs.create(p, False)  # conditional PUT
            except Exception as e:
                if "FileAlreadyExists" in str(e) or self.fs.exists(p):
                    return False
                raise
            try:
                out.write(body)
            finally:
                out.close()
            return True
        tmp = self.path_cls(
            p.getParent(), f".{p.getName()}.{uuid.uuid4().hex[:8]}.tmp"
        )
        out = self.fs.create(tmp, False)
        try:
            out.write(body)
        finally:
            out.close()
        if strategy == "link":
            jvm = self._jvm
            try:
                # java.io.File(...).toPath() because Paths.get is varargs,
                # which py4j cannot dispatch
                jvm.java.nio.file.Files.createLink(
                    jvm.java.io.File(p.toUri().getPath()).toPath(),
                    jvm.java.io.File(tmp.toUri().getPath()).toPath(),
                )
            except Exception as e:  # FileAlreadyExistsException = lost race
                self.fs.delete(tmp, False)
                if "FileAlreadyExists" in str(e) or self.fs.exists(p):
                    return False
                raise
            self.fs.delete(tmp, False)
            return True
        if self.fs.exists(p) or not self.fs.rename(tmp, p):
            self.fs.delete(tmp, False)
            return False
        return True

    def list_names(self, p) -> list[str]:
        if not self.fs.exists(p):
            return []
        return [s.getPath().getName() for s in self.fs.listStatus(p)]

    def list_files_recursive(self, p) -> list[tuple[str, int]]:
        """[(path-relative-to-table-root, bytes)] for every file under p."""
        out: list[tuple[str, int]] = []
        if not self.fs.exists(p):
            return out
        it = self.fs.listFiles(p, True)
        prefix = self.fs.makeQualified(self._root_path).toString().rstrip("/") + "/"
        while it.hasNext():
            status = it.next()
            full = status.getPath().toString()
            rel = full[len(prefix):] if full.startswith(prefix) else full
            out.append((rel, int(status.getLen())))
        return out

    def delete(self, p, recursive: bool) -> bool:
        return bool(self.fs.delete(p, recursive))


def _snapshot_id(parent: str | None, files: list[dict]) -> str:
    """Deterministic content-derived id: committing the same file set on the
    same parent from two racing retries yields the same id (and a different
    one the moment lineage differs)."""
    h = hashlib.sha256()
    h.update((parent or "root").encode())
    for f in sorted(e["path"] for e in files):
        h.update(f.encode())
        h.update(b"\x00")
    return h.hexdigest()[:16]


def _hive_value(value: object, dtype: "T.DataType | None") -> str:
    """A filter value -> the hive directory-name string Spark's partitionBy
    writer produced for it, typed by the table schema. str(True) is 'True'
    but the writer emits 'true'; without this a Python bool filter silently
    pruned every file."""
    if value is None:
        return "__HIVE_DEFAULT_PARTITION__"
    if isinstance(dtype, T.BooleanType) or isinstance(value, bool):
        if isinstance(value, str):
            return value.lower()
        return "true" if value else "false"
    return str(value)  # date/datetime/int/str: str() is the hive form


def _parse_partition(rel_path: str, partition_cols: list[str]) -> dict[str, str]:
    """Hive-style `col=value` segments of a data-file path -> {col: value}."""
    vals: dict[str, str] = {}
    for seg in rel_path.split("/"):
        if "=" in seg:
            k, _, v = seg.partition("=")
            if k in partition_cols:
                vals[k] = unquote(v)
    return vals


def _versions(fs: _Fs) -> list[int]:
    out = []
    for name in fs.list_names(fs.path(LOG_DIR)):
        if name.startswith("v") and name.endswith(".json"):
            try:
                out.append(int(name[1:-5]))
            except ValueError:
                continue
    return sorted(out)


def _load_snapshot(fs: _Fs, version: int) -> dict:
    return fs.read_json(fs.path(LOG_DIR, f"v{version}.json"))


def _is_not_found(e: Exception) -> bool:
    """True when a Hadoop read failed because the file vanished between the
    directory LIST and the open() — the signature of a concurrent
    expire_snapshots sweeping an old log entry. Py4J wraps the Java
    exception, so classification is by exception class name."""
    je = getattr(e, "java_exception", None)
    text = str(je) if je is not None else str(e)
    return "FileNotFoundException" in text or "PathNotFoundException" in text


def _load_snapshot_or_debris(fs: _Fs, version: int) -> dict | None:
    """One log entry -> committed snapshot dict, or None when the entry is
    unreadable for one of exactly two TOLERABLE reasons: torn debris from a
    crashed writer (unparseable JSON — committed snapshots publish whole via
    link/create-exclusive, so a partial body cannot be a committed state) or
    vanished mid-read (a concurrent expire deleted it after we listed it).
    Any OTHER exception — transient IO error, permission failure — re-raises:
    treating those as "skip to an older snapshot" would let _commit build the
    next version against a stale parent and silently drop the true head's
    files (a lost update), so they must fail the operation instead."""
    try:
        return _load_snapshot(fs, version)
    except ValueError:  # json.JSONDecodeError subclasses ValueError
        return None
    except Exception as e:
        if _is_not_found(e):
            return None
        raise


def _head(fs: _Fs) -> tuple[dict | None, list[int]]:
    """(newest PARSEABLE snapshot, full version list). An unparseable log file
    can only be a crashed writer's torn debris (committed snapshots publish
    whole via link/rename in create_exclusive): it is SKIPPED, never renamed
    or deleted — the next commit claims the next version number ABOVE it
    (``vs[-1] + 1`` counts the torn slot), so the debris is inert dead weight
    in the log. Skipping is the only race-free recovery: any destructive
    quarantine is check-then-act against peers re-using the slot and can
    delete a committed head; a skip cannot destroy anything. A file that
    vanishes mid-read (concurrent expire) is treated the same as torn; any
    other read error re-raises (see _load_snapshot_or_debris — falling back
    to an older snapshot on a transient IO error inside _commit would be a
    silent lost update)."""
    vs = _versions(fs)
    for v in reversed(vs):
        snap = _load_snapshot_or_debris(fs, v)
        if snap is not None:
            return snap, vs
    return None, vs


def current_snapshot(spark: SparkSession, table: str) -> dict | None:
    """The newest committed snapshot (None for a not-yet-created table)."""
    fs = _Fs(spark, table)
    return _head(fs)[0]


def current_snapshot_id(spark: SparkSession, table: str) -> str | None:
    snap = current_snapshot(spark, table)
    return snap["snapshot_id"] if snap else None


def history(spark: SparkSession, table: str) -> list[dict]:
    """All committed snapshots, oldest first: (version, snapshot_id,
    parent_id, operation, summary) — the audit trail resume lineage points
    into. Torn debris files (crashed writers) are skipped, matching _head."""
    fs = _Fs(spark, table)
    out = []
    for v in _versions(fs):
        s = _load_snapshot_or_debris(fs, v)
        if s is None:
            continue
        out.append(
            {k: s[k] for k in ("version", "snapshot_id", "parent_id", "operation", "summary")}
        )
    return out


def snapshots_newest_first(spark: SparkSession, table: str):
    """Lazily yield committed snapshots newest-first, skipping torn debris —
    the O(1)-reads-in-the-common-case walk for callers that usually only need
    the head (e.g. the streaming ingest-dedup pre-epoch pin)."""
    fs = _Fs(spark, table)
    for v in reversed(_versions(fs)):
        snap = _load_snapshot_or_debris(fs, v)
        if snap is not None:
            yield snap


def _write_data_files(
    df: DataFrame, fs: _Fs, partition_cols: list[str]
) -> tuple[list[dict], str]:
    """Write df's rows as immutable parquet under a fresh commit dir; return
    (file entries, commit dir). Partition values are read back from the
    directory names — one recursive LIST of the just-written commit dir, no
    extra Spark job."""
    commit = uuid.uuid4().hex[:12]
    target = posixpath.join(fs.root, DATA_DIR, commit)
    writer = df.write.mode("error")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(target)
    entries = []
    for rel, nbytes in fs.list_files_recursive(fs.path(DATA_DIR, commit)):
        name = posixpath.basename(rel)
        if not name.endswith(".parquet"):
            continue  # _SUCCESS and friends
        entries.append(
            {
                "path": rel,
                "bytes": nbytes,
                "partition": _parse_partition(rel, partition_cols),
            }
        )
    return entries, commit


def _commit(
    fs: _Fs,
    *,
    operation: str,
    new_files: list[dict],
    schema_json: str,
    partition_cols: list[str],
    surviving: "callable",
    summary_extra: dict | None = None,
    require_parent: str | None = None,
) -> dict:
    """Optimistic-concurrency commit loop: read head, build the next snapshot,
    atomically create v{N+1}.json; on loss re-read and retry (the new data
    files stay valid — only the listing is rebuilt against the new head).
    ``require_parent`` pins the commit to a specific head snapshot: if any
    other commit lands first, raise instead of retrying — needed by
    operations (compaction) whose surviving-file computation was derived
    from that exact head and would silently drop a concurrent writer's
    files if replayed against a newer one."""
    for _ in range(_COMMIT_RETRIES):
        head, vs = _head(fs)
        if require_parent is not None and (
            head is None or head["snapshot_id"] != require_parent
        ):
            raise CommitConflict(
                f"head moved past required parent {require_parent} on {fs.root}"
            )
        if head is not None and head["partition_cols"] != partition_cols:
            raise ValueError(
                f"partition spec mismatch: table has {head['partition_cols']}, "
                f"commit supplies {partition_cols}"
            )
        base = surviving(head["files"] if head else [])
        files = base + new_files
        snap = {
            "format_version": FORMAT_VERSION,
            "version": (vs[-1] + 1) if vs else 1,
            "snapshot_id": _snapshot_id(head["snapshot_id"] if head else None, files),
            "parent_id": head["snapshot_id"] if head else None,
            "operation": operation,
            "partition_cols": partition_cols,
            "schema": schema_json,
            "files": files,
            "summary": {
                "added_files": len(new_files),
                "removed_files": len((head["files"] if head else [])) - len(base),
                "total_files": len(files),
                "total_bytes": sum(f["bytes"] for f in files),
                **(summary_extra or {}),
            },
        }
        if fs.create_exclusive(fs.path(LOG_DIR, f"v{snap['version']}.json"), snap):
            return snap
    raise CommitConflict(f"lost {_COMMIT_RETRIES} commit races on {fs.root}")


def _logical_schema(df: DataFrame) -> str:
    return df.schema.json()


def _evolved_schema(head: dict | None, df: DataFrame) -> str:
    """Additive schema evolution at the MANIFEST level (the Iceberg-spec
    model: schema lives in table metadata, data files stay immutable).

    Rules: new columns append to the logical schema as nullable; existing
    columns keep their position and type (a type change raises — that's a
    rewrite, not an append); a frame MISSING existing columns does not drop
    them — its files simply lack the column, and the explicit-schema parquet
    read null-fills it (pinned by test). So every snapshot's schema is a
    superset of all earlier ones and old snapshots stay time-travelable with
    their own schema."""
    if head is None:
        return _logical_schema(df)
    old = T.StructType.fromJson(json.loads(head["schema"]))
    by_name = {f.name: f for f in old.fields}
    fields = list(old.fields)
    for f in df.schema.fields:
        have = by_name.get(f.name)
        if have is None:
            fields.append(T.StructField(f.name, f.dataType, True))
        elif have.dataType != f.dataType:
            raise ValueError(
                f"type change for column {f.name}: {have.dataType.simpleString()}"
                f" -> {f.dataType.simpleString()} (evolution is additive;"
                " changing a type is a table rewrite)"
            )
    return T.StructType(fields).json()


def _data_schema(df: DataFrame, partition_cols: list[str]) -> None:
    missing = [c for c in partition_cols if c not in df.columns]
    if missing:
        raise ValueError(f"partition columns absent from frame: {missing}")


def append(
    spark: SparkSession,
    table: str,
    df: DataFrame,
    partition_cols: list[str] | None = None,
    summary_extra: dict | None = None,
) -> dict:
    """Append df as a new snapshot (parent files + new files). First append
    creates the table and fixes its partition spec. ``summary_extra`` lands
    in the snapshot summary — e.g. a streaming sink's batch id, which makes
    the log itself the transaction table for exactly-once replay skips."""
    partition_cols = list(partition_cols or [])
    _data_schema(df, partition_cols)
    fs = _Fs(spark, table)
    head = current_snapshot(spark, table)
    if head is not None:
        partition_cols = head["partition_cols"]
    new_files, _ = _write_data_files(df, fs, partition_cols)
    return _commit(
        fs,
        operation="append",
        new_files=new_files,
        schema_json=_evolved_schema(head, df),
        partition_cols=partition_cols,
        surviving=lambda files: list(files),
        summary_extra=summary_extra,
    )


def overwrite_partitions(spark: SparkSession, table: str, df: DataFrame) -> dict:
    """Dynamic partition overwrite: replace exactly the partitions PRESENT in
    df, leave every other partition untouched — the Iceberg
    ``writeTo(t).overwritePartitions()`` semantics the north star names, as
    one atomic snapshot (readers see old-everything or new-everything, never
    a half-swapped day). Idempotent: re-running the same commit after a crash
    converges to the same live file set."""
    head = current_snapshot(spark, table)
    if head is None:
        raise ValueError(f"overwrite_partitions on non-existent table {table}")
    partition_cols = head["partition_cols"]
    if not partition_cols:
        raise ValueError("table is unpartitioned; use append/overwrite")
    _data_schema(df, partition_cols)
    fs = _Fs(spark, table)
    new_files, _ = _write_data_files(df, fs, partition_cols)
    touched = {tuple(sorted(f["partition"].items())) for f in new_files}

    def surviving(files: list[dict]) -> list[dict]:
        return [
            f for f in files if tuple(sorted(f["partition"].items())) not in touched
        ]

    return _commit(
        fs,
        operation="overwrite_partitions",
        new_files=new_files,
        schema_json=_evolved_schema(head, df),
        partition_cols=partition_cols,
        surviving=surviving,
        summary_extra={"replaced_partitions": len(touched)},
    )


def rollback(spark: SparkSession, table: str, snapshot_id: str) -> dict:
    """Make an OLD snapshot's file set current again via a NEW snapshot (the
    log stays append-only; nothing is deleted, so the rolled-back-over state
    remains time-travelable until expire_snapshots)."""
    fs = _Fs(spark, table)
    target = None
    for v in _versions(fs):
        s = _load_snapshot_or_debris(fs, v)
        if s is None:
            continue  # torn debris / expired mid-walk
        if s["snapshot_id"] == snapshot_id:
            target = s
    if target is None:
        raise ValueError(f"unknown snapshot_id {snapshot_id}")
    return _commit(
        fs,
        operation="rollback",
        new_files=[],
        schema_json=target["schema"],
        partition_cols=target["partition_cols"],
        surviving=lambda _files: list(target["files"]),
        summary_extra={"rolled_back_to": snapshot_id},
    )


def _resolve(fs: _Fs, snapshot_id: str | None, version: int | None) -> dict:
    head, vs = _head(fs)
    if head is None:
        raise ValueError(f"no snapshots at {fs.root}")
    if version is not None:
        if version not in vs:
            raise ValueError(f"unknown version {version}")
        snap = _load_snapshot_or_debris(fs, version)
        if snap is None:
            raise ValueError(
                f"version {version} is torn debris from a crashed writer, "
                "not a committed snapshot"
            )
        return snap
    if snapshot_id is None:
        return head
    for v in reversed(vs):
        s = _load_snapshot_or_debris(fs, v)
        if s is None:
            continue  # torn debris / expired mid-walk — not the requested one
        if s["snapshot_id"] == snapshot_id:
            return s
    raise ValueError(f"unknown snapshot_id {snapshot_id}")


def read(
    spark: SparkSession,
    table: str,
    snapshot_id: str | None = None,
    version: int | None = None,
    partition_filter: dict[str, object] | None = None,
) -> DataFrame:
    """Read a snapshot (latest by default; pin ``snapshot_id``/``version`` for
    time travel) as a DataFrame with the table's full logical schema.

    ``partition_filter`` maps partition column -> value or collection of
    values and prunes at the MANIFEST: filtered-out files are never given to
    Spark (verifiable via ``df.inputFiles()``). Each value is normalized to
    the hive-encoded string the writer produced, typed by the table schema's
    partition column (bool -> ``true``/``false``, None -> the hive default
    partition, date/int/str via their canonical str form), so Python-typed
    filters behave naturally.

    Plan shape: one parquet scan per live partition value group (columnar,
    codegen'd), partition columns re-attached as typed literals — foldable
    constants, so downstream filters on them are constant-folded by Catalyst
    rather than evaluated per row."""
    fs = _Fs(spark, table)
    snap = _resolve(fs, snapshot_id, version)
    schema = T.StructType.fromJson(json.loads(snap["schema"]))
    pcols = snap["partition_cols"]

    files = snap["files"]
    if partition_filter:
        dtypes = {f.name: f.dataType for f in schema.fields}
        norm: dict[str, set[str]] = {}
        for col, wanted in partition_filter.items():
            if col not in pcols:
                raise ValueError(f"{col} is not a partition column of {table}")
            if isinstance(wanted, (str, bytes)) or not hasattr(wanted, "__iter__"):
                wanted = [wanted]
            norm[col] = {_hive_value(w, dtypes.get(col)) for w in wanted}
        files = [
            f
            for f in files
            if all(f["partition"].get(c) in vs for c, vs in norm.items())
        ]

    return _frame_for_files(spark, fs, schema, pcols, files)


def _frame_for_files(
    spark: SparkSession, fs: _Fs, schema, pcols, files: list[dict]
) -> DataFrame:
    """Explicit file list -> DataFrame with typed partition columns.

    One scan per COMMIT directory (each is a self-consistent hive tree, so
    ``basePath`` + the explicit file subset gives Spark a single relation per
    commit with the partition columns resolved from the directory names and
    typed by the snapshot's logical schema). Snapshot isolation holds — only
    the listed files enter the file index — and partition predicates still
    prune inside each relation as native PartitionFilters. Plan size is
    O(live commits), not O(partition values) (the earlier per-partition-group
    union made a 30-day read 30 scans); compaction collapses commits, so the
    relation count stays small on a maintained table."""
    if not files:
        return spark.createDataFrame([], schema)

    groups: dict[str, list[str]] = {}
    for f in files:
        rel = f["path"]
        commit = rel.split("/")[1] if rel.startswith(DATA_DIR + "/") else ""
        groups.setdefault(commit, []).append(posixpath.join(fs.root, rel))

    cols = [fld.name for fld in schema.fields]
    parts = []
    for commit, paths in sorted(groups.items()):
        reader = spark.read.schema(schema)
        if pcols:
            reader = reader.option(
                "basePath", posixpath.join(fs.root, DATA_DIR, commit)
            )
        parts.append(reader.parquet(*paths).select(*cols))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def compact(spark: SparkSession, table: str, min_files: int = 2) -> dict | None:
    """Small-file compaction as a snapshot: rewrite every partition holding
    >= min_files files into one file, committed as a single atomic
    ``rewrite`` snapshot (same rows, fewer files — streaming appends and
    per-epoch commits accrete small files; readers of the head see the old
    layout or the new one, never a mix, and the pre-compaction state stays
    time-travelable until expire_snapshots). Untouched partitions keep their
    existing immutable files. Returns the new snapshot, or None if nothing
    qualified.

    Scale shape: the rewrite reads only the affected partitions' files and
    repartitions BY the partition columns, so each output partition is
    produced by one task writing one file — compaction work is proportional
    to the small-file data, not the table."""
    head = current_snapshot(spark, table)
    if head is None:
        raise ValueError(f"compact on non-existent table {table}")
    pcols = head["partition_cols"]
    schema = T.StructType.fromJson(json.loads(head["schema"]))

    groups: dict[tuple, list[dict]] = {}
    for f in head["files"]:
        groups.setdefault(tuple(sorted(f["partition"].items())), []).append(f)
    todo = {k: v for k, v in groups.items() if len(v) >= min_files}
    if not todo:
        return None

    fs = _Fs(spark, table)
    victims = [f for fl in todo.values() for f in fl]
    df = _frame_for_files(spark, fs, schema, pcols, victims)
    if pcols:
        df = df.repartition(*[F.col(c) for c in pcols])
    new_files, _ = _write_data_files(df, fs, pcols)
    touched = set(todo)

    def surviving(files: list[dict]) -> list[dict]:
        return [
            f for f in files if tuple(sorted(f["partition"].items())) not in touched
        ]

    return _commit(
        fs,
        operation="rewrite",
        new_files=new_files,
        schema_json=head["schema"],
        partition_cols=pcols,
        surviving=surviving,
        summary_extra={
            "compacted_partitions": len(todo),
            "compacted_files_in": len(victims),
        },
        require_parent=head["snapshot_id"],
    )


def expire_snapshots(spark: SparkSession, table: str, keep_last: int = 1) -> dict:
    """Physically delete data files unreachable from the newest ``keep_last``
    snapshots and drop the expired log entries — the GC half of the format
    (Iceberg ``expireSnapshots`` / Delta ``VACUUM``). Only paths named by
    expired manifests are touched, and only within this table's root."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    fs = _Fs(spark, table)
    # The keep window counts COMMITTED (parseable) snapshots only. Counting
    # raw version numbers would let torn debris occupy keep slots: with
    # committed v1 and a crashed writer's torn v2 at the log tail,
    # keep_last=1 would keep only the debris (which names no files), delete
    # v1's data files and log entry, and destroy the table. Debris is
    # classified exactly as every read path does (_load_snapshot_or_debris).
    committed: list[tuple[int, dict]] = []
    debris: list[int] = []
    for v in _versions(fs):
        snap = _load_snapshot_or_debris(fs, v)
        if snap is None:
            debris.append(v)
        else:
            committed.append((v, snap))
    keep, drop = committed[-keep_last:], committed[:-keep_last]
    live: set[str] = set()
    for _v, snap in keep:
        live.update(f["path"] for f in snap["files"])
    removed_files = 0
    for v, snap in drop:
        for f in snap["files"]:
            if f["path"] not in live:
                if fs.delete(fs.path(f["path"]), False):
                    removed_files += 1
                live.add(f["path"])  # only attempt each path once
        fs.delete(fs.path(LOG_DIR, f"v{v}.json"), False)
    # Debris log files are swept only when they sit strictly BELOW the oldest
    # kept committed version: a torn slot above it could be a peer writer
    # mid-publish on a filesystem where the payload materializes before the
    # exclusive-create wins (and deleting it would be check-then-act against
    # that peer); a torn slot below the kept range can never be claimed again
    # (_commit always allocates above vs[-1]) so it is safely dead.
    oldest_kept = keep[0][0] if keep else None
    swept_debris = 0
    for v in debris:
        if oldest_kept is not None and v < oldest_kept:
            if fs.delete(fs.path(LOG_DIR, f"v{v}.json"), False):
                swept_debris += 1
    return {
        "expired_snapshots": len(drop),
        "deleted_files": removed_files,
        "swept_debris": swept_debris,
    }


def is_snaplog_table(spark: SparkSession, target: str) -> bool:
    try:
        fs = _Fs(spark, target)
        return fs.exists(fs.path(LOG_DIR))
    except Exception:
        return False
