"""SnapLog snapshot-log table format (sources/snaplog.py): append /
overwrite_partitions / time travel / rollback / crash-safety / concurrent
commit race / manifest-level pruning / expire GC / lineage wiring."""

from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from openfactverification_spark.sources import catalog, snaplog


def _events(spark, n=300, day_mod=3, tag=""):
    """Deterministic little frame: n rows over `day_mod` distinct days."""
    return (
        spark.range(n)
        .select(
            F.col("id").alias("event_id"),
            F.date_add(F.lit("2024-01-01").cast("date"), (F.col("id") % day_mod).cast("int")).alias("day"),
            (F.col("id") * 7 % 100).cast("double").alias("value"),
            F.concat(F.lit(tag), F.lit("e"), F.col("id")).alias("payload"),
        )
    )


def _counts(df):
    return {
        str(r["day"]): r["n"]
        for r in df.groupBy("day").agg(F.count(F.lit(1)).alias("n")).collect()
    }


def test_append_roundtrip_and_time_travel(spark, tmp_path):
    t = str(tmp_path / "tbl")
    df1 = _events(spark, 300, tag="a")
    s1 = snaplog.append(spark, t, df1, partition_cols=["day"])
    df2 = _events(spark, 90, tag="b")
    s2 = snaplog.append(spark, t, df2)

    # latest = union; schema (incl. typed partition col) round-trips
    back = snaplog.read(spark, t)
    assert back.count() == 390
    assert dict(back.dtypes)["day"] == "date"
    assert _counts(back) == _counts(df1.unionByName(df2))

    # time travel by snapshot id and by version
    old = snaplog.read(spark, t, snapshot_id=s1["snapshot_id"])
    assert old.count() == 300
    assert {r["payload"][0] for r in old.select(F.substring("payload", 1, 1).alias("payload")).distinct().collect()} == {"a"}
    assert snaplog.read(spark, t, version=2).count() == 390
    assert s2["parent_id"] == s1["snapshot_id"]

    hist = snaplog.history(spark, t)
    assert [h["version"] for h in hist] == [1, 2]
    assert hist[-1]["operation"] == "append"


def test_overwrite_partitions_exact_semantics(spark, tmp_path):
    """Replaces exactly the partitions present in the frame; equality is
    checked against the plain-DataFrame recomputation of the same semantics
    (the dynamic-overwrite oracle)."""
    t = str(tmp_path / "tbl")
    base = _events(spark, 300, tag="a")  # days 01..03, 100 rows each
    snaplog.append(spark, t, base, partition_cols=["day"])

    # new data only for day 2024-01-02 (58 rows) — other days must survive
    patch = _events(spark, 58, day_mod=1, tag="p").withColumn(
        "day", F.lit("2024-01-02").cast("date")
    )
    s = snaplog.overwrite_partitions(spark, t, patch)
    assert s["summary"]["replaced_partitions"] == 1

    expected = base.filter(F.col("day") != "2024-01-02").unionByName(patch)
    got = snaplog.read(spark, t)
    assert _counts(got) == _counts(expected)
    got_d2 = got.filter(F.col("day") == "2024-01-02")
    assert got_d2.count() == 58
    assert {r["p"] for r in got_d2.select(F.substring("payload", 1, 1).alias("p")).distinct().collect()} == {"p"}

    # idempotent re-run converges (crash-replay of the same commit)
    snaplog.overwrite_partitions(spark, t, patch)
    assert _counts(snaplog.read(spark, t)) == _counts(expected)


def test_crash_before_log_commit_leaves_previous_snapshot_live(spark, tmp_path):
    """Write-ahead ordering: data files land before the log entry, so a crash
    between the two leaves orphan files and an intact previous snapshot."""
    t = str(tmp_path / "tbl")
    snaplog.append(spark, t, _events(spark, 100), partition_cols=["day"])

    # simulate the crash: write data files but never commit the manifest
    fs = snaplog._Fs(spark, t)
    snaplog._write_data_files(_events(spark, 999, tag="orphan"), fs, ["day"])

    assert len(snaplog.history(spark, t)) == 1
    assert snaplog.read(spark, t).count() == 100  # orphans invisible

    # and the table still accepts new commits afterwards
    snaplog.append(spark, t, _events(spark, 50, tag="c"))
    assert snaplog.read(spark, t).count() == 150


def test_concurrent_commit_race_retries_and_keeps_both(spark, tmp_path):
    """Losing the create(v{N}.json) race must re-read the new head and retry:
    both writers' rows end up live, lineage is a chain (optimistic
    concurrency). The race is forced by grabbing the loser's version number
    first via a monkeypatched create_exclusive."""
    t = str(tmp_path / "tbl")
    snaplog.append(spark, t, _events(spark, 100), partition_cols=["day"])

    real_create = snaplog._Fs.create_exclusive
    state = {"intruded": False}

    def create_with_intruder(self, p, payload):
        if not state["intruded"]:
            state["intruded"] = True
            # another writer lands v2 first, with its own files
            snaplog.append(spark, t, _events(spark, 40, tag="w2"))
        return real_create(self, p, payload)

    try:
        snaplog._Fs.create_exclusive = create_with_intruder
        snaplog.append(spark, t, _events(spark, 60, tag="w1"))
    finally:
        snaplog._Fs.create_exclusive = real_create

    hist = snaplog.history(spark, t)
    assert [h["version"] for h in hist] == [1, 2, 3]
    # chain: each parent is the previous snapshot id
    assert hist[1]["parent_id"] == hist[0]["snapshot_id"]
    assert hist[2]["parent_id"] == hist[1]["snapshot_id"]
    assert snaplog.read(spark, t).count() == 200


def test_manifest_level_partition_pruning(spark, tmp_path):
    """A partition filter prunes at the manifest: Spark's inputFiles must only
    name files of the selected day."""
    t = str(tmp_path / "tbl")
    snaplog.append(spark, t, _events(spark, 300), partition_cols=["day"])

    pruned = snaplog.read(spark, t, partition_filter={"day": "2024-01-02"})
    assert pruned.count() == 100
    files = pruned.inputFiles()
    assert files and all("day=2024-01-02" in f for f in files)

    full_files = snaplog.read(spark, t).inputFiles()
    assert len(files) < len(full_files)

    with pytest.raises(ValueError):
        snaplog.read(spark, t, partition_filter={"value": 1.0})


def test_rollback_and_expire(spark, tmp_path):
    t = str(tmp_path / "tbl")
    s1 = snaplog.append(spark, t, _events(spark, 100, tag="a"), partition_cols=["day"])
    snaplog.append(spark, t, _events(spark, 50, tag="b"))
    s3 = snaplog.rollback(spark, t, s1["snapshot_id"])
    assert s3["operation"] == "rollback"
    assert snaplog.read(spark, t).count() == 100  # b's rows gone from head
    # ...but still time-travelable until expiry
    assert snaplog.read(spark, t, version=2).count() == 150

    gone = snaplog.expire_snapshots(spark, t, keep_last=1)
    assert gone["expired_snapshots"] == 2
    assert gone["deleted_files"] > 0  # b's files were unreachable from head
    assert snaplog.read(spark, t).count() == 100  # head intact after GC
    with pytest.raises(ValueError):
        snaplog.read(spark, t, version=2)


def test_lineage_wiring_and_detection(spark, tmp_path):
    t = str(tmp_path / "tbl")
    plain = str(tmp_path / "plain")
    os.makedirs(plain)
    assert catalog.current_lineage(spark, plain, fallback="fp") == "fp"

    s = snaplog.append(spark, t, _events(spark, 30), partition_cols=["day"])
    assert snaplog.is_snaplog_table(spark, t)
    assert not snaplog.is_snaplog_table(spark, plain)
    lin = catalog.current_lineage(spark, t, fallback="fp")
    assert lin == f"snaplog-snapshot:{s['snapshot_id']}"

    # deterministic content-derived ids: same parent + same file set -> same id
    fs = snaplog._Fs(spark, t)
    snap = snaplog._load_snapshot(fs, 1)
    assert snaplog._snapshot_id(None, snap["files"]) == snap["snapshot_id"]


def test_snapshot_json_is_self_describing(spark, tmp_path):
    """The log entry carries everything a reader needs: schema, partition
    spec, full file listing with hive partition values."""
    t = str(tmp_path / "tbl")
    snaplog.append(spark, t, _events(spark, 90), partition_cols=["day"])
    with open(os.path.join(t, "_snaplog", "v1.json")) as f:
        snap = json.load(f)
    assert snap["partition_cols"] == ["day"]
    assert snap["summary"]["total_files"] == len(snap["files"])
    days = {f["partition"]["day"] for f in snap["files"]}
    assert days == {"2024-01-01", "2024-01-02", "2024-01-03"}
    schema = json.loads(snap["schema"])
    assert {f["name"] for f in schema["fields"]} == {"event_id", "day", "value", "payload"}


def test_compact_small_files(spark, tmp_path):
    """Three appends -> partitions hold 3 files each; compact rewrites them to
    one file per partition in ONE atomic rewrite snapshot, rows identical,
    pre-compaction state still time-travelable."""
    t = str(tmp_path / "tbl")
    for i in range(3):
        snaplog.append(spark, t, _events(spark, 90, tag=f"c{i}"), partition_cols=["day"])
    before = snaplog.read(spark, t)
    n_before_files = len(before.inputFiles())
    assert n_before_files >= 9  # 3 days x 3 commits

    snap = snaplog.compact(spark, t)
    assert snap["operation"] == "rewrite"
    assert snap["summary"]["compacted_partitions"] == 3
    after = snaplog.read(spark, t)
    assert len(after.inputFiles()) == 3  # one file per day
    assert _counts(after) == _counts(before)
    assert after.count() == 270
    # old layout still reachable by version
    assert len(snaplog.read(spark, t, version=3).inputFiles()) == n_before_files
    # nothing left to compact
    assert snaplog.compact(spark, t) is None


def test_compact_aborts_if_head_moves(spark, tmp_path):
    """Compaction derived from head H must refuse to commit once another
    writer lands H+1 (a retry would silently drop the concurrent files)."""
    t = str(tmp_path / "tbl")
    snaplog.append(spark, t, _events(spark, 90, tag="a"), partition_cols=["day"])
    snaplog.append(spark, t, _events(spark, 90, tag="b"))

    real_create = snaplog._Fs.create_exclusive
    state = {"intruded": False}

    def create_with_intruder(self, p, payload):
        if not state["intruded"] and payload.get("operation") == "rewrite":
            state["intruded"] = True
            snaplog.append(spark, t, _events(spark, 30, tag="late"))
        return real_create(self, p, payload)

    try:
        snaplog._Fs.create_exclusive = create_with_intruder
        with pytest.raises(snaplog.CommitConflict):
            snaplog.compact(spark, t)
    finally:
        snaplog._Fs.create_exclusive = real_create
    # the loser's data is intact: late append present, no duplicates
    assert snaplog.read(spark, t).count() == 210


def test_streaming_snaplog_sink_exactly_once(spark, tmp_path):
    """run_to_sinks_stream_snaplog: stream counts == batch counts, every
    micro-batch is one snapshot carrying its batch id, and a full re-run with
    a FRESH checkpoint (same batch ids replayed from scratch) commits
    nothing new."""
    from openfactverification_spark.plans.pipeline import build_pipeline
    from openfactverification_spark.sources.transcripts import transcripts_df
    from openfactverification_spark.streaming import pipeline as spipe

    src = str(tmp_path / "src")
    transcripts_df(spark, 1500).write.parquet(src)
    schema = spark.read.parquet(src).schema
    out = str(tmp_path / "out")

    stream = spark.readStream.schema(schema).parquet(src)
    q = spipe.run_to_sinks_stream_snaplog(spark, stream, out, str(tmp_path / "ck1"))
    q.awaitTermination(300)

    table = f"{out}/sinks"
    got = {
        r["route"]: r["n"]
        for r in snaplog.read(spark, table).groupBy("route").count()
        .withColumnRenamed("count", "n").collect()
    }
    batch = build_pipeline(spark, spark.read.parquet(src)).routed
    want = {
        r["route"]: r["n"]
        for r in batch.groupBy("route").count().withColumnRenamed("count", "n").collect()
    }
    assert got == want

    hist = snaplog.history(spark, table)
    batch_ids = [h["summary"].get("stream_batch_id") for h in hist]
    assert all(b is not None for b in batch_ids)
    assert len(set(batch_ids)) == len(batch_ids)

    # replay from scratch: fresh checkpoint, same source -> same batch ids ->
    # every batch skips; the log must not grow and counts must not change
    stream2 = spark.readStream.schema(schema).parquet(src)
    q2 = spipe.run_to_sinks_stream_snaplog(spark, stream2, out, str(tmp_path / "ck2"))
    q2.awaitTermination(300)
    assert len(snaplog.history(spark, table)) == len(hist)
    got2 = {
        r["route"]: r["n"]
        for r in snaplog.read(spark, table).groupBy("route").count()
        .withColumnRenamed("count", "n").collect()
    }
    assert got2 == want


def test_schema_evolution_add_column(spark, tmp_path):
    """Additive evolution: a later append with an extra column evolves the
    manifest schema; old files null-fill the new column on read (partitioned
    table, so the basePath scan branch is the one exercised), and time travel
    to the pre-evolution snapshot keeps the original schema."""
    t = str(tmp_path / "evo")
    s1 = snaplog.append(spark, t, _events(spark, 60), partition_cols=["day"])
    evolved = _events(spark, 40, tag="n").withColumn(
        "quality", (F.col("event_id") % 5).cast("int")
    )
    snaplog.append(spark, t, evolved)

    head = snaplog.read(spark, t)
    assert "quality" in head.columns
    assert head.count() == 100
    old_rows = head.filter(~F.col("payload").startswith("n"))
    assert old_rows.count() == 60
    assert old_rows.filter(F.col("quality").isNotNull()).count() == 0
    assert head.filter(F.col("quality").isNotNull()).count() == 40

    pinned = snaplog.read(spark, t, snapshot_id=s1["snapshot_id"])
    assert "quality" not in pinned.columns
    assert pinned.count() == 60


def test_schema_evolution_missing_column_kept(spark, tmp_path):
    """A frame missing an existing column does NOT drop it from the table:
    the logical schema stays a superset and the new file reads as NULL."""
    t = str(tmp_path / "evo2")
    snaplog.append(spark, t, _events(spark, 30), partition_cols=["day"])
    snaplog.append(spark, t, _events(spark, 20, tag="m").drop("value"))
    head = snaplog.read(spark, t)
    assert "value" in head.columns
    assert head.count() == 50
    assert head.filter(F.col("value").isNull()).count() == 20


def test_schema_evolution_type_change_rejected(spark, tmp_path):
    t = str(tmp_path / "evo3")
    snaplog.append(spark, t, _events(spark, 10), partition_cols=["day"])
    bad = _events(spark, 5).withColumn("value", F.col("value").cast("string"))
    with pytest.raises(ValueError, match="type change"):
        snaplog.append(spark, t, bad)


def test_torn_head_is_skipped_not_bricking(spark, tmp_path):
    """A truncated v{N}.json (crashed writer mid-payload) must not brick the
    table: every read path SKIPS it (no rename/delete — a destructive
    quarantine could race a peer re-using the slot and destroy a committed
    head), the head falls back to the previous snapshot, the next commit
    claims the version ABOVE the debris, and history/expire tolerate it."""
    t = str(tmp_path / "tbl")
    snaplog.append(spark, t, _events(spark, 30, tag="a"), partition_cols=["day"])
    log = tmp_path / "tbl" / "_snaplog"
    (log / "v2.json").write_text('{"version": 2, "files": [{"trunc')

    head = snaplog.current_snapshot(spark, t)
    assert head["version"] == 1
    assert snaplog.read(spark, t).count() == 30
    # the torn slot is never reclaimed: the next commit takes v3, the debris
    # stays inert on disk and is invisible to history()
    s2 = snaplog.append(spark, t, _events(spark, 12, tag="b"))
    assert s2["version"] == 3
    assert snaplog.read(spark, t).count() == 42
    assert [h["version"] for h in snaplog.history(spark, t)] == [1, 3]
    assert (log / "v2.json").exists()  # untouched — nothing was destroyed
    # expiry sweeps the debris' log file along with expired snapshots
    snaplog.expire_snapshots(spark, t, keep_last=1)
    assert not (log / "v2.json").exists()
    assert snaplog.read(spark, t).count() == 42


def test_commit_payload_lands_via_tmp_rename(spark, tmp_path):
    """create_exclusive writes through a temp name: no committed log file may
    coexist with leftover tmp debris being mistaken for a snapshot, and a
    stray tmp file never enters the version listing."""
    t = str(tmp_path / "tbl")
    snaplog.append(spark, t, _events(spark, 10), partition_cols=["day"])
    log = tmp_path / "tbl" / "_snaplog"
    (log / ".v9.json.deadbeef.tmp").write_text("{}")
    assert snaplog.current_snapshot(spark, t)["version"] == 1
    s2 = snaplog.append(spark, t, _events(spark, 10))
    assert s2["version"] == 2  # tmp file did not claim v9


def test_partition_filter_normalizes_python_types(spark, tmp_path):
    """A Python bool filter must match the writer's lowercase hive encoding
    (str(True) == 'True' used to prune every file silently)."""
    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(1, True), (2, False), (3, True)], "id long, flag boolean"
    )
    snaplog.append(spark, t, df, partition_cols=["flag"])
    hits = snaplog.read(spark, t, partition_filter={"flag": True})
    assert sorted(r["id"] for r in hits.collect()) == [1, 3]
    misses = snaplog.read(spark, t, partition_filter={"flag": False})
    assert sorted(r["id"] for r in misses.collect()) == [2]
    # string form still accepted, any case
    assert snaplog.read(spark, t, partition_filter={"flag": "True"}).count() == 2


def test_crash_mid_commit_leaves_no_torn_snapshot(spark, tmp_path, monkeypatch):
    """Kill the writer at the _commit boundary — tmp payload written, rename
    not reached (r3 verdict #5): the previous snapshot stays live, reads keep
    working, and the retried commit converges to the same end state with no
    torn v{N}.json ever visible."""
    t = str(tmp_path / "tbl")
    snaplog.append(spark, t, _events(spark, 90), partition_cols=["day"])
    head = snaplog.current_snapshot(spark, t)
    orig = snaplog._Fs.create_exclusive

    def dying(self, p, payload):
        tmp = self.path_cls(p.getParent(), f".{p.getName()}.dying.tmp")
        out = self.fs.create(tmp, False)
        try:
            out.write(bytearray(b'{"torn": '))
        finally:
            out.close()
        raise RuntimeError("killed mid-commit")

    monkeypatch.setattr(snaplog._Fs, "create_exclusive", dying)
    replacement = _events(spark, 30, day_mod=1, tag="n")
    with pytest.raises(RuntimeError, match="killed mid-commit"):
        snaplog.overwrite_partitions(spark, t, replacement)
    monkeypatch.setattr(snaplog._Fs, "create_exclusive", orig)

    # nothing torn: head unchanged, table fully readable
    assert snaplog.current_snapshot(spark, t)["snapshot_id"] == head["snapshot_id"]
    assert snaplog.read(spark, t).count() == 90
    log = tmp_path / "tbl" / "_snaplog"
    assert not (log / "v2.json").exists()

    # the retry converges: day 2024-01-01 replaced atomically, others intact
    snap = snaplog.overwrite_partitions(spark, t, replacement)
    assert snap["version"] == 2
    assert _counts(snaplog.read(spark, t)) == {
        "2024-01-01": 30, "2024-01-02": 30, "2024-01-03": 30,
    }
    day1 = snaplog.read(spark, t, partition_filter={"day": "2024-01-01"})
    assert all(r["payload"].startswith("ne") for r in day1.collect())


def test_expire_with_debris_at_tail_keeps_committed_head(spark, tmp_path):
    """The r4-advice crash state: committed v1 + torn debris v2 at the log
    TAIL, keep_last=1. The keep window must count committed snapshots only —
    counting raw versions would keep only the debris (which names no files),
    delete v1's data files and log entry, and destroy the table."""
    t = str(tmp_path / "tbl")
    snaplog.append(spark, t, _events(spark, 30, tag="a"), partition_cols=["day"])
    log = tmp_path / "tbl" / "_snaplog"
    (log / "v2.json").write_text('{"version": 2, "files": [{"trunc')

    res = snaplog.expire_snapshots(spark, t, keep_last=1)
    assert res["expired_snapshots"] == 0
    assert res["deleted_files"] == 0
    # debris sits ABOVE the oldest kept committed version (could be a peer
    # mid-publish) so it is NOT swept
    assert res["swept_debris"] == 0
    assert (log / "v1.json").exists()
    assert (log / "v2.json").exists()
    assert snaplog.read(spark, t).count() == 30  # table alive, not destroyed

    # once a newer committed snapshot exists above it, the debris is dead
    # weight below the keep window and IS swept
    snaplog.append(spark, t, _events(spark, 12, tag="b"))
    res2 = snaplog.expire_snapshots(spark, t, keep_last=1)
    assert res2["expired_snapshots"] == 1  # v1
    assert res2["swept_debris"] == 1  # v2 debris, now below kept v3
    assert not (log / "v2.json").exists()
    assert snaplog.read(spark, t).count() == 42


def test_head_reraises_non_tolerable_read_errors(spark, tmp_path, monkeypatch):
    """_head must tolerate ONLY torn JSON and vanished-mid-read: any other
    error (transient IO, permissions) re-raises instead of silently falling
    back to an older snapshot — inside _commit that fallback would build the
    next version on a stale parent and silently drop the true head's files."""
    t = str(tmp_path / "tbl")
    snaplog.append(spark, t, _events(spark, 10, tag="a"), partition_cols=["day"])
    snaplog.append(spark, t, _events(spark, 5, tag="b"))

    orig = snaplog._Fs.read_json

    def flaky(self, p):
        if p.getName() == "v2.json":
            raise OSError("transient I/O hiccup on true head")
        return orig(self, p)

    monkeypatch.setattr(snaplog._Fs, "read_json", flaky)
    with pytest.raises(OSError, match="transient"):
        snaplog.current_snapshot(spark, t)
    # the commit path fails loudly too instead of committing data loss
    with pytest.raises(OSError, match="transient"):
        snaplog.append(spark, t, _events(spark, 3, tag="c"))
    monkeypatch.setattr(snaplog._Fs, "read_json", orig)
    assert snaplog.current_snapshot(spark, t)["version"] == 2
    assert snaplog.read(spark, t).count() == 15


def test_publish_strategy_per_scheme():
    """Object stores (no atomic rename; exists()+rename is check-then-act and
    S3A rename is a non-atomic copy) publish via create(overwrite=false) —
    the conditional PUT — never via rename."""
    assert snaplog._publish_strategy("file") == "link"
    for s in ("s3a", "s3", "gs", "abfs", "abfss", "wasbs", "oss"):
        assert snaplog._publish_strategy(s) == "put", s
    assert snaplog._publish_strategy("hdfs") == "rename"
    assert snaplog._publish_strategy("viewfs") == "rename"
