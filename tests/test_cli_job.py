"""S2 CLI surface: scripts/job.py driven exactly as a user would, via
subprocess (fresh interpreter, fresh JVM) — batch mode and checkpointed
resume mode on a tmpdir (SURVEY.md §2.1 S2; reference CLI at
/root/reference/factcheck/__main__.py:10-39)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
JOB = os.path.join(REPO, "scripts", "job.py")
N_TURNS = "64"


def _run(*args: str) -> subprocess.CompletedProcess:
    env = dict(os.environ, PYTHONPATH=REPO)
    return subprocess.run(
        [sys.executable, JOB, *args],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
        cwd=REPO,
    )


def test_cli_batch_mode(tmp_path):
    out = str(tmp_path / "batch")
    proc = _run("--out", out, "--n-turns", N_TURNS)
    assert proc.returncode == 0, proc.stderr[-2000:]
    # summary rows printed, sinks + summary written
    assert "Row(" in proc.stdout
    assert os.path.isdir(os.path.join(out, "sinks"))
    assert os.path.isdir(os.path.join(out, "summary"))
    routes = {
        d.split("=", 1)[1]
        for d in os.listdir(os.path.join(out, "sinks"))
        if d.startswith("route=")
    }
    assert routes <= {"checkworthy", "non_factual", "tool_trace", "verdict"}
    assert routes, "expected at least one routed sink partition"


def test_cli_resume_mode_idempotent(tmp_path):
    out = str(tmp_path / "resume")
    first = _run("--out", out, "--resume", "--n-turns", N_TURNS)
    assert first.returncode == 0, first.stderr[-2000:]
    epochs_first = [ln for ln in first.stdout.splitlines() if ln.startswith("epoch ")]
    assert epochs_first, first.stdout

    # manifest entries committed, one JSON per epoch, rulepack recorded
    # (the Hadoop local FS adds .crc sidecars — only visible *.json files count)
    mdir = os.path.join(out, "_manifest")
    entries = sorted(
        e for e in os.listdir(mdir) if e.endswith(".json") and not e.startswith(".")
    )
    assert len(entries) == len(epochs_first)
    with open(os.path.join(mdir, entries[0])) as f:
        entry = json.load(f)
    assert entry["rulepack"] == "default@2"
    assert entry["metrics"]["parsed_records"] > 0

    # second invocation: everything committed -> zero new epochs, sinks intact
    second = _run("--out", out, "--resume", "--n-turns", N_TURNS)
    assert second.returncode == 0, second.stderr[-2000:]
    epochs_second = [ln for ln in second.stdout.splitlines() if ln.startswith("epoch ")]
    assert epochs_second == [], second.stdout
    entries_after = sorted(
        e for e in os.listdir(mdir) if e.endswith(".json") and not e.startswith(".")
    )
    assert entries_after == entries


def test_cli_ingest_dedup_mode(tmp_path, spark):
    """--ingest-dedup end-to-end in a fresh interpreter: empty store, one
    micro-batch with a planted exact pair -> keeper new, twin dup_in_batch."""
    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e f"), (4, "x y z w v u")],
        ["doc_id", "text"],
    )
    src = str(tmp_path / "docs")
    docs.coalesce(1).write.parquet(src)
    out = str(tmp_path / "out")
    proc = _run("--ingest-dedup", "--input-parquet", src, "--out", out)
    assert proc.returncode == 0, proc.stderr[-2000:]

    from openfactverification_spark.sources import snaplog

    st = snaplog.read(spark, os.path.join(out, "status"))
    rows = {(r["doc_id"], r["batch_id"], r["status"], r["dup_of"]) for r in st.collect()}
    assert rows == {(1, 1, "new", None), (2, 1, "dup_in_batch", 1), (4, 1, "new", None)}
    # accepted docs' signatures entered the store; the dropped twin's did not
    store_ids = {
        r["doc_id"]
        for r in snaplog.read(spark, os.path.join(out, "store", "sh")).collect()
    }
    assert store_ids == {1, 4}


def test_cli_resume_snaplog_sink(tmp_path, spark):
    """--resume --snaplog-sink: the sink is a versioned SnapLog table with one
    snapshot per epoch, and a re-invocation commits nothing new (r3 verdict
    #5 — the SnapLog<->checkpoint<->CLI triangle driven end-to-end)."""
    from openfactverification_spark.sources import snaplog

    out = str(tmp_path / "rs")
    first = _run("--out", out, "--resume", "--snaplog-sink", "--n-turns", N_TURNS)
    assert first.returncode == 0, first.stderr[-2000:]
    epochs = [ln for ln in first.stdout.splitlines() if ln.startswith("epoch ")]
    assert epochs

    table = os.path.join(out, "sinks")
    assert snaplog.is_snaplog_table(spark, table)
    hist = snaplog.history(spark, table)
    assert len(hist) == len(epochs)  # one atomic snapshot per epoch
    n_rows = snaplog.read(spark, table).count()
    assert n_rows > 0
    # every manifest entry records the sink snapshot it produced
    mdir = os.path.join(out, "_manifest")
    for e in os.listdir(mdir):
        if e.endswith(".json") and not e.startswith("."):
            with open(os.path.join(mdir, e)) as f:
                assert json.load(f)["sink_snapshot"]

    second = _run("--out", out, "--resume", "--snaplog-sink", "--n-turns", N_TURNS)
    assert second.returncode == 0, second.stderr[-2000:]
    assert not [ln for ln in second.stdout.splitlines() if ln.startswith("epoch ")]
    assert len(snaplog.history(spark, table)) == len(hist)
    assert snaplog.read(spark, table).count() == n_rows


def test_cli_snaplog_sink_requires_supporting_mode(tmp_path):
    """Plain batch mode writes parquet sinks directly; --snaplog-sink there
    used to be silently ignored (ADVICE r3) — now it must error."""
    proc = _run("--out", str(tmp_path / "b"), "--snaplog-sink", "--n-turns", N_TURNS)
    assert proc.returncode != 0
    assert "--snaplog-sink requires" in proc.stderr


def test_cli_streaming_snaplog_sink(tmp_path, spark):
    """--streaming --snaplog-sink drives run_to_sinks_stream_snaplog (was
    unreachable from the CLI): exactly-once micro-batch commits with the
    batch id in each snapshot summary."""
    from openfactverification_spark.sources import snaplog
    from openfactverification_spark.sources.transcripts import transcripts_df

    src = str(tmp_path / "src")
    transcripts_df(spark, int(N_TURNS)).write.parquet(src)
    out = str(tmp_path / "out")
    proc = _run("--streaming", "--snaplog-sink", "--input-parquet", src, "--out", out)
    assert proc.returncode == 0, proc.stderr[-2000:]
    table = os.path.join(out, "sinks")
    assert snaplog.read(spark, table).count() > 0
    assert all(
        "stream_batch_id" in h["summary"] for h in snaplog.history(spark, table)
    )
