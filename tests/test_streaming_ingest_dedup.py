"""Streaming ingest dedup ≡ batch dedup_incremental, and exactly-once replay.

The stream seeds the store with the corpus stratum (doc_id % 3 == 0), then
processes the two increment strata as two availableNow runs (second file
added after the first run completes, so micro-batch order is guaranteed and
the second run exercises checkpoint restart). Statuses must equal the batch
operator's exactly."""

from __future__ import annotations

from openfactverification_spark import testdata_queries as tq
from openfactverification_spark.sources import snaplog
from openfactverification_spark.sources.tables import table_path
from openfactverification_spark.streaming import ingest_dedup

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(table_path(SF, "documents")).select("doc_id", "text")


def _run_stream(spark, tmp_path):
    docs = _docs(spark)
    store = str(tmp_path / "store")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    src = str(tmp_path / "src")
    ingest_dedup.seed_store(spark, docs.filter("doc_id % 3 = 0"), store)
    schema = docs.schema

    for stratum in (1, 2):
        docs.filter(f"doc_id % 3 = {stratum}").coalesce(1).write.mode(
            "append"
        ).parquet(src)
        stream = spark.readStream.schema(schema).parquet(src)
        q = ingest_dedup.run_ingest_dedup_stream(spark, stream, store, out, ck)
        q.awaitTermination(300)
    return store, out, ck, src, schema


def test_stream_statuses_equal_batch(spark, tmp_path):
    _, out, _, _, _ = _run_stream(spark, tmp_path)
    got = {
        (r["doc_id"], r["batch_id"], r["status"], r["dup_of"])
        for r in snaplog.read(spark, f"{out}/status").collect()
    }
    spark.conf.set("spark.ofv.registered_sf", "")
    want = {
        (r["doc_id"], r["batch_id"], r["status"], r["dup_of"])
        for r in tq.q_dedup_incremental_runner(spark, SF).collect()
    }
    assert got == want
    assert any(s == "dup_of_seen" for _, _, s, _ in got) or len(got) > 0


def test_maintained_stream_same_results_bounded_log(spark, tmp_path):
    """maintain_every=1 (compact + expire after every batch) must not change
    any status or store row, and must bound the snapshot log."""
    docs = _docs(spark)
    store = str(tmp_path / "store")
    out = str(tmp_path / "out")
    src = str(tmp_path / "src")
    ingest_dedup.seed_store(spark, docs.filter("doc_id % 3 = 0"), store)
    for stratum in (1, 2):
        docs.filter(f"doc_id % 3 = {stratum}").coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q = ingest_dedup.run_ingest_dedup_stream(
            spark,
            spark.readStream.schema(docs.schema).parquet(src),
            store,
            out,
            str(tmp_path / "ck"),
            maintain_every=1,
        )
        q.awaitTermination(300)

    got = {
        (r["doc_id"], r["batch_id"], r["status"], r["dup_of"])
        for r in snaplog.read(spark, f"{out}/status").collect()
    }
    spark.conf.set("spark.ofv.registered_sf", "")
    want = {
        (r["doc_id"], r["batch_id"], r["status"], r["dup_of"])
        for r in tq.q_dedup_incremental_runner(spark, SF).collect()
    }
    assert got == want
    # log bounded by expiry: at most keep_last retained snapshots per table
    assert len(snaplog.history(spark, f"{store}/sh")) <= 3
    assert len(snaplog.history(spark, f"{out}/status")) <= 3


def test_replay_is_exactly_once(spark, tmp_path):
    store, out, ck, src, schema = _run_stream(spark, tmp_path)
    before = sorted(
        tuple(r) for r in snaplog.read(spark, f"{out}/status").collect()
    )
    n_store = snaplog.read(spark, f"{store}/sh").count()
    # fresh checkpoint dir -> the whole source replays from scratch; every
    # epoch is already committed in the three logs, so nothing may change
    stream = spark.readStream.option("maxFilesPerTrigger", 1).schema(schema).parquet(src)
    q = ingest_dedup.run_ingest_dedup_stream(
        spark, stream, store, out, str(tmp_path / "ck2")
    )
    q.awaitTermination(300)
    after = sorted(tuple(r) for r in snaplog.read(spark, f"{out}/status").collect())
    assert after == before
    assert snaplog.read(spark, f"{store}/sh").count() == n_store


def test_crash_between_store_and_status_replays_identically(spark, tmp_path, monkeypatch):
    """ADVICE r3 (high): a crash AFTER the store appends but BEFORE the status
    append used to corrupt the replay — process_batch recomputed `seen`
    against a store already holding this epoch's accepted signatures, so
    every accepted doc self-matched at jaccard 1.0 and was committed as
    dup_of_seen of itself. The fix pins store reads to the pre-epoch
    snapshot; this kills the process at exactly that boundary and asserts the
    replayed statuses equal an uncrashed run's."""
    docs = _docs(spark)
    runs = {}
    for mode in ("clean", "crashy"):
        store = str(tmp_path / mode / "store")
        out = str(tmp_path / mode / "out")
        ingest_dedup.seed_store(spark, docs.filter("doc_id % 3 = 0"), store)
        batches = [
            docs.filter("doc_id % 3 = 1").localCheckpoint(eager=True),
            docs.filter("doc_id % 3 = 2").localCheckpoint(eager=True),
        ]
        ingest_dedup.process_batch(spark, batches[0], 0, store, out)
        if mode == "crashy":
            real_append = snaplog.append

            def boom(s, table, df, *a, **kw):
                if table.endswith("/status"):
                    raise RuntimeError("killed before status commit")
                return real_append(s, table, df, *a, **kw)

            monkeypatch.setattr(ingest_dedup.snaplog, "append", boom)
            try:
                ingest_dedup.process_batch(spark, batches[1], 1, store, out)
                raise AssertionError("crash hook did not fire")
            except RuntimeError:
                pass
            monkeypatch.setattr(ingest_dedup.snaplog, "append", real_append)
            # the store tables DID commit epoch 1; status did not
            assert 1 not in ingest_dedup._committed_epochs(spark, f"{out}/status")
            assert 1 in ingest_dedup._committed_epochs(spark, f"{store}/sh")
        # replay (crashy) / first run (clean) of epoch 1
        ingest_dedup.process_batch(spark, batches[1], 1, store, out)
        runs[mode] = {
            tuple(r)
            for r in snaplog.read(spark, f"{out}/status")
            .select("doc_id", "batch_id", "status", "dup_of")
            .collect()
        }
        assert not any(
            s == "dup_of_seen" and d == i for i, _, s, d in runs[mode]
        ), "self-match: replay judged a doc against its own signatures"
    assert runs["crashy"] == runs["clean"]
