"""Scaling-efficiency benchmark (north rule: throughput efficiency >=0.8 from N to 4N).

No real cluster exists in this sandbox, so the two cluster sizes are evidenced by
running the IDENTICAL job at two parallelism levels, each in a FRESH JVM
(subprocess), same input formula, and comparing:

  * turns/sec at each level (best of N rounds, levels alternated per round),
  * scaling efficiency = (throughput_hi / throughput_lo) / (hi / lo),
  * exact per-sink aggregate equality across levels (hashes must match).

Usage:  python scripts/bench_scaling.py [n_turns] [runs_per_level] [lo] [hi]
Defaults: 8M turns, 3 rounds, local[2] vs local[8] — the N-vs-4N pair inside
this VM's memory-bandwidth envelope (see BENCH.md §2 for why not 8-vs-32 here).
Emits one JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import hashlib, json, sys, time
sys.path.insert(0, {repo!r})
from openfactverification_spark.plans.pipeline import build_pipeline
from openfactverification_spark.session import get_spark
from openfactverification_spark.sources.transcripts import transcripts_df

cpus, n_turns = int(sys.argv[1]), int(sys.argv[2])
spark = get_spark("bench-scaling", master=f"local[{{cpus}}]")
# warm the JVM/codegen paths once with a tiny run so the timed run measures
# steady-state throughput, not first-query class loading
build_pipeline(spark, transcripts_df(spark, 1000)).summary.collect()

# The north-rule job: parse -> enrich -> route -> per-sink aggregate, one pass.
# summary carries the per-sink counts whose exact cross-level equality the rule
# demands (hash below); per-conv/verdict projections are separate analyses.
t0 = time.perf_counter()
res = build_pipeline(spark, transcripts_df(spark, n_turns))
summary = sorted(map(str, res.summary.collect()))
sec = time.perf_counter() - t0

digest = hashlib.sha256("\n".join(summary).encode()).hexdigest()[:16]
print(json.dumps({{
    "cpus": cpus, "sec": sec, "turns_per_sec": n_turns / sec,
    "summary_hash": digest,
}}))
spark.stop()
"""


def run_level(cpus: int, n_turns: int) -> dict:
    code = WORKER.format(repo=REPO)
    out = subprocess.run(
        [sys.executable, "-c", code, str(cpus), str(n_turns)],
        capture_output=True, text=True, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    lo = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    hi = int(sys.argv[4]) if len(sys.argv) > 4 else 8

    results: dict[int, list[dict]] = {lo: [], hi: []}
    for _ in range(runs):
        for cpus in (lo, hi):  # alternate levels so machine drift hits both
            r = run_level(cpus, n_turns)
            results[cpus].append(r)
            print(f"  local[{cpus}]: {r['sec']:.2f}s  {r['turns_per_sec']:.0f} turns/s  "
                  f"hash={r['summary_hash']}", file=sys.stderr)

    # max-throughput per level: robust to the sandbox VM's multi-minute slow
    # phases (medians mix slow-phase and fast-phase runs of identical work)
    best_lo = max(r["turns_per_sec"] for r in results[lo])
    best_hi = max(r["turns_per_sec"] for r in results[hi])
    hashes = {r["summary_hash"] for rs in results.values() for r in rs}
    eff = (best_hi / best_lo) / (hi / lo)
    out = {
        "n_turns": n_turns,
        "runs_per_level": runs,
        f"turns_per_sec_local{lo}": round(best_lo, 1),
        f"turns_per_sec_local{hi}": round(best_hi, 1),
        "scaling_efficiency": round(eff, 3),
        "per_sink_counts_identical": len(hashes) == 1,
        "summary_hash": hashes.pop() if len(hashes) == 1 else sorted(hashes),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
