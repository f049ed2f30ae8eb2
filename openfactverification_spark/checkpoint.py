"""Checkpointed, resumable pipeline runs with per-partition lineage + metrics.

North-rule obligation (SURVEY.md §4 custom-work items 2-3): the pipeline must be
resumable from per-partition checkpoints that record source lineage and
parse/route/agg metrics, with exactly-once per-sink counts across resume.

Design (batch analog of streaming state, SURVEY.md §2.9 note):

  * The run is split into **epochs** = the sink partition key ``p_day``
    (``date(ts)`` — the days(ts) part of the Iceberg partition spec in
    BASELINE.json's north_star; parquet `partitionBy` is the sandbox stand-in,
    `overwritePartitions` on Iceberg is the production path).
  * A **manifest** directory holds one JSON file per committed epoch:
    ``{epoch, lineage, metrics{parsed_records, routed_per_sink}, schema_version}``.
    The file is written ONLY after the epoch's sink write fully commits, so the
    manifest is the commit log. One file per epoch = no read-modify-write races.
  * **Resume** = ``left_anti`` join of the input's epochs against the manifest's
    committed epochs (SURVEY.md §2.4 note: anti join as resumability primitive).
  * **Idempotence**: sinks are written with dynamic partition overwrite keyed by
    (route, p_day); re-processing a crashed epoch overwrites its partial output
    instead of duplicating it, so per-sink counts are exact across resume.
  * **Metrics** come from the same pass that writes the sinks (a per-epoch
    count aggregate over the routed frame — the A5 usage-accounting analog,
    /root/reference/factcheck/utils/llmclient/gpt_client.py:36-41).

At cluster scale each epoch's write is a partition-pruned scan (the ``p_day``
filter reaches the source) and the manifest stays tiny (one small JSON per day).
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import route as route_ops
from .plans.pipeline import build_pipeline
from .rulepack import DEFAULT_PACK, RulePack

SCHEMA_VERSION = 1


@dataclass
class EpochResult:
    epoch: str
    parsed_records: int
    routed_per_sink: dict[str, int]


def _manifest_dir(out_dir: str) -> str:
    return out_dir.rstrip("/") + "/_manifest"


class _ManifestIO:
    """Manifest I/O through the Hadoop FileSystem API, so ``--out`` works on
    any Hadoop-supported filesystem (file://, hdfs://, s3a://, ...) — a
    driver-local ``open()`` would silently write an object-store URI to a
    literal local directory and resume state would not survive driver
    replacement. All files are tiny per-epoch JSONs, driver-side only.

    Commit protocol: write a temp file, then rename over the final name —
    atomic on HDFS and local FS; on S3A rename is copy+delete (non-atomic),
    which is safe under the single-writer assumption the epoch loop already
    makes (production multi-writer would commit through the Iceberg catalog
    instead, sources/catalog.py)."""

    def __init__(self, spark: SparkSession, out_dir: str):
        jvm = spark._jvm
        self._jvm = jvm
        self._path_cls = jvm.org.apache.hadoop.fs.Path
        self._dir = self._path_cls(_manifest_dir(out_dir))
        self._fs = self._dir.getFileSystem(spark._jsc.hadoopConfiguration())

    def list_entries(self) -> list[dict]:
        if not self._fs.exists(self._dir):
            return []
        entries: list[dict] = []
        for status in self._fs.listStatus(self._dir):
            p = status.getPath()
            if not p.getName().endswith(".json"):
                continue
            stream = self._fs.open(p)
            try:
                raw = self._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
            finally:
                stream.close()
            entries.append(json.loads(bytes(raw).decode("utf-8")))
        return entries

    def write_entry(self, entry: dict) -> None:
        self._fs.mkdirs(self._dir)
        final = self._path_cls(self._dir, f"{entry['epoch']}.json")
        tmp = self._path_cls(
            self._dir, f".{entry['epoch']}.json.tmp-{uuid.uuid4().hex[:8]}"
        )
        out = self._fs.create(tmp, True)
        try:
            out.write(bytearray(json.dumps(entry).encode("utf-8")))
        finally:
            out.close()
        if self._fs.exists(final):
            self._fs.delete(final, False)
        self._fs.rename(tmp, final)


def _manifest_io(out_dir: str, spark: SparkSession | None) -> _ManifestIO | None:
    spark = spark or SparkSession.getActiveSession()
    return _ManifestIO(spark, out_dir) if spark is not None else None


def committed_epochs(out_dir: str, spark: SparkSession | None = None) -> dict[str, dict]:
    """Read the manifest: epoch -> committed entry. Uses the Hadoop FS of the
    (active) session; falls back to local os I/O only when no session exists."""
    io = _manifest_io(out_dir, spark)
    if io is not None:
        return {e["epoch"]: e for e in io.list_entries()}
    mdir = _manifest_dir(out_dir)
    if not os.path.isdir(mdir):
        return {}
    out: dict[str, dict] = {}
    for name in sorted(os.listdir(mdir)):
        if not name.endswith(".json"):
            continue
        with open(os.path.join(mdir, name)) as f:
            entry = json.load(f)
        out[entry["epoch"]] = entry
    return out


def _commit_epoch(out_dir: str, entry: dict, spark: SparkSession | None = None) -> None:
    """Atomic single-file commit: write tmp, rename (Hadoop FS when a session
    is available, local fsync-rename otherwise)."""
    io = _manifest_io(out_dir, spark)
    if io is not None:
        io.write_entry(entry)
        return
    mdir = _manifest_dir(out_dir)
    os.makedirs(mdir, exist_ok=True)
    path = os.path.join(mdir, f"{entry['epoch']}.json")
    tmp = path + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump(entry, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def pending_epochs(spark: SparkSession, transcripts: DataFrame, out_dir: str) -> list[str]:
    """Epochs present in the input but absent from the manifest (left_anti)."""
    input_epochs = transcripts.select(
        F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("epoch")
    ).distinct()
    done = list(committed_epochs(out_dir, spark))
    if done:
        done_df = spark.createDataFrame([(e,) for e in done], "epoch string")
        input_epochs = input_epochs.join(done_df, "epoch", "left_anti")
    return sorted(r["epoch"] for r in input_epochs.collect())


def run_resumable(
    spark: SparkSession,
    transcripts: DataFrame,
    out_dir: str,
    lineage: str = "",
    fail_after_epochs: int | None = None,
    fail_mid_epoch: bool = False,
    pack: RulePack = DEFAULT_PACK,
    sink_format: str = "parquet",
) -> list[EpochResult]:
    """Process all not-yet-committed epochs; safe to re-invoke after a crash.

    ``fail_after_epochs`` injects a crash after N epoch commits, before the
    next epoch starts; ``fail_mid_epoch`` crashes AFTER the sink write but
    BEFORE the manifest commit of the (fail_after_epochs+1)-th epoch — the
    partial-state case resume must repair idempotently (tests only).
    ``lineage`` identifies the input version (Iceberg snapshot-id in
    production; a SnapLog snapshot-id via catalog.current_lineage; any
    caller-supplied fingerprint here). The parser rule-pack identity
    (``name@version``) is recorded in every epoch's manifest entry, so a run
    is auditable down to the segmentation rules it used.

    ``sink_format="snaplog"`` commits each epoch's routed rows to a SnapLog
    table at ``{out_dir}/sinks`` via ``overwrite_partitions`` — the atomic,
    versioned partition commit the north star names (Iceberg
    ``overwritePartitions``), implemented from scratch in sources/snaplog.py
    because the Iceberg jar cannot enter this container. Each manifest entry
    then records the SINK snapshot id it produced, so lineage is end-to-end:
    input snapshot -> epoch -> output snapshot. Replaying a crashed epoch
    re-overwrites exactly its (route, p_day) partitions — same idempotence
    as the parquet dynamic-overwrite path, but the swap is one atomic log
    append instead of a directory mutation.
    """
    if sink_format not in ("parquet", "snaplog"):
        raise ValueError(f"unknown sink_format {sink_format!r}")
    todo = pending_epochs(spark, transcripts, out_dir)
    results: list[EpochResult] = []

    for i, epoch in enumerate(todo):
        if fail_after_epochs is not None and not fail_mid_epoch and i >= fail_after_epochs:
            raise RuntimeError(f"injected failure before epoch {epoch}")

        # Partition-pruned slice: at cluster scale this filter reaches the
        # Iceberg scan as days(ts) partition pruning.
        day_slice = transcripts.filter(
            F.date_format(F.to_date("ts"), "yyyy-MM-dd") == epoch
        )
        result = build_pipeline(spark, day_slice, pack=pack)
        routed = result.routed.withColumn("p_day", F.lit(epoch)).persist()

        # Sink write first (idempotent dynamic overwrite of (route, p_day) —
        # writer-scoped option, not a session-global conf), metrics from the
        # same cached pass, manifest commit last.
        sink_snapshot = ""
        if sink_format == "snaplog":
            from .sources import snaplog

            table = os.path.join(out_dir, "sinks")
            if snaplog.current_snapshot(spark, table) is None:
                snap = snaplog.append(spark, table, routed, ["route", "p_day"])
            else:
                snap = snaplog.overwrite_partitions(spark, table, routed)
            sink_snapshot = snap["snapshot_id"]
        else:
            (
                routed.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("route", "p_day")
                .parquet(os.path.join(out_dir, "sinks"))
            )
        if fail_mid_epoch and fail_after_epochs is not None and i >= fail_after_epochs:
            routed.unpersist()
            raise RuntimeError(f"injected mid-epoch failure after sink write of {epoch}")
        per_sink = {
            r["route"]: r["n"]
            for r in routed.groupBy("route").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        parsed = sum(per_sink.values())
        routed.unpersist()

        entry = {
            "epoch": epoch,
            "lineage": lineage,
            "schema_version": SCHEMA_VERSION,
            "rulepack": pack.identity,
            "metrics": {"parsed_records": parsed, "routed_per_sink": per_sink},
        }
        if sink_snapshot:
            entry["sink_snapshot"] = sink_snapshot
        _commit_epoch(out_dir, entry, spark=spark)
        results.append(EpochResult(epoch, parsed, per_sink))
    return results


def sink_counts(spark: SparkSession, out_dir: str) -> dict[str, int]:
    """Per-route row counts of the committed sink data (for exactness checks).
    Reads through the snapshot log when the sink is a SnapLog table, so the
    count reflects exactly the committed head — in-flight files are
    invisible by construction."""
    from .sources import snaplog

    sinks = os.path.join(out_dir, "sinks")
    if snaplog.is_snaplog_table(spark, sinks):
        df = snaplog.read(spark, sinks)
    else:
        df = spark.read.parquet(sinks)
    return {
        r["route"]: r["n"]
        for r in df.groupBy("route").agg(F.count(F.lit(1)).alias("n")).collect()
    }
