"""Multi-process SnapLog commit race: two SEPARATE OS processes (fresh
interpreters, fresh JVMs) append to the same table concurrently through the
optimistic-retry commit loop (sources/snaplog.py:_commit), while this process
reads the table live. Asserts the whole commit-protocol contract at once:

- both writers' every batch lands (no lost update under real process races),
- the version log is dense 1..N with no duplicates (create_exclusive is the
  only publish primitive, so two committers can never claim the same slot),
- no data file named by the final head is missing,
- a concurrent reader NEVER observes a partial batch: every (writer, seq)
  group it sees is either absent or complete, because data files are fully
  written before the log entry publishes and the log entry publish is atomic.

This is the in-process race test (tests/test_snaplog.py) promoted to the real
thing — separate JVMs, no shared py4j gateway, genuine filesystem-level races.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N_BATCHES = 4
BATCH_ROWS = 50

_WRITER_SRC = """
import json, os, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession

table, writer, barrier = sys.argv[1], sys.argv[2], sys.argv[3]
spark = (
    SparkSession.builder.master("local[2]")
    .appName("snaplog-race-" + writer)
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "1g")
    .config("spark.sql.adaptive.enabled", "true")
    .getOrCreate()
)
from openfactverification_spark.sources import snaplog

open(barrier + ".ready-" + writer, "w").close()
deadline = time.time() + 120
while not os.path.exists(barrier + ".go"):
    if time.time() > deadline:
        raise SystemExit("barrier timeout")
    time.sleep(0.02)

for seq in range({n_batches}):
    df = spark.range({batch_rows}).selectExpr(
        "'" + writer + "' AS writer", str(seq) + " AS seq", "id"
    )
    snap = snaplog.append(spark, table, df)
    print(json.dumps({{"writer": writer, "seq": seq,
                       "version": snap["version"]}}), flush=True)
spark.stop()
"""


def test_two_process_commit_race(spark, tmp_path):
    from openfactverification_spark.sources import snaplog

    table = str(tmp_path / "race_table")
    barrier = str(tmp_path / "barrier")
    script = tmp_path / "writer.py"
    script.write_text(
        _WRITER_SRC.format(repo=REPO, n_batches=N_BATCHES, batch_rows=BATCH_ROWS)
    )
    env = dict(os.environ, PYTHONPATH=REPO)

    procs = [
        subprocess.Popen(
            [sys.executable, str(script), table, w, barrier],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
            cwd=REPO,
        )
        for w in ("a", "b")
    ]
    try:
        deadline = time.time() + 120
        while not all(
            os.path.exists(f"{barrier}.ready-{w}") for w in ("a", "b")
        ):
            assert time.time() < deadline, "writers never reached the barrier"
            for p in procs:
                assert p.poll() is None, p.communicate()[1][-2000:]
            time.sleep(0.1)
        open(f"{barrier}.go", "w").close()

        # Concurrent reader: while the two writers race, every (writer, seq)
        # group visible through a committed snapshot must be COMPLETE.
        partial_seen = []
        while any(p.poll() is None for p in procs):
            if snaplog.current_snapshot(spark, table) is not None:
                counts = (
                    snaplog.read(spark, table)
                    .groupBy("writer", "seq")
                    .count()
                    .collect()
                )
                partial_seen.extend(
                    (r["writer"], r["seq"], r["count"])
                    for r in counts
                    if r["count"] != BATCH_ROWS
                )
            time.sleep(0.2)
        outs = [p.communicate(timeout=240) for p in procs]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    for p, (_, err) in zip(procs, outs):
        assert p.returncode == 0, err[-3000:]
    assert not partial_seen, f"reader saw partial batches: {partial_seen}"

    # Both writers' every commit landed, and the version log is dense with
    # no duplicate slots — 2 writers x N_BATCHES commits -> versions 1..2N.
    committed = [json.loads(ln) for _, (out, _) in zip(procs, outs) for ln in out.splitlines() if ln.startswith("{")]
    assert len(committed) == 2 * N_BATCHES
    versions = sorted(c["version"] for c in committed)
    assert versions == list(range(1, 2 * N_BATCHES + 1)), versions
    # Under a real race at least one commit must have lost a slot and
    # retried (version > its local commit index + 1 for some writer) — not
    # asserted (scheduling-dependent), but the dense log above proves any
    # retries that happened rebuilt against the new head without loss.

    # Final state: all rows exactly once, head names only existing files.
    final = snaplog.read(spark, table).groupBy("writer", "seq").count().collect()
    assert len(final) == 2 * N_BATCHES
    assert all(r["count"] == BATCH_ROWS for r in final)
    head = snaplog.current_snapshot(spark, table)
    assert head["version"] == 2 * N_BATCHES
    for f in head["files"]:
        assert os.path.exists(os.path.join(table, f["path"])), f["path"]

    # History chains parent ids without gaps (dense, acyclic lineage).
    hist = snaplog.history(spark, table)
    by_version = {h["version"]: h for h in hist}
    assert sorted(by_version) == list(range(1, 2 * N_BATCHES + 1))
    for v in range(2, 2 * N_BATCHES + 1):
        assert by_version[v]["parent_id"] == by_version[v - 1]["snapshot_id"]
