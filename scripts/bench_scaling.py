"""Scaling-efficiency benchmark (north rule: throughput efficiency >=0.8 from N to 4N).

No real cluster exists in this sandbox, so the two cluster sizes are evidenced by
running the IDENTICAL job at two parallelism levels — local[8] (N) and local[32]
(4N) — each in a FRESH JVM (subprocess), same input formula, and comparing:

  * turns/sec at each level,
  * scaling efficiency = (throughput_32 / throughput_8) / (32 / 8),
  * exact per-sink aggregate equality across levels (printed hashes must match).

Usage:  python scripts/bench_scaling.py [n_turns] [runs_per_level]
Emits one JSON line; also appends a Markdown row you can paste into BENCH.md.
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

t0 = time.perf_counter()
res = build_pipeline(spark, transcripts_df(spark, n_turns))
summary = sorted(map(str, res.summary.collect()))
per_conv_n = res.summary_per_conv.count()
verdicts_n = res.verdicts.count()
sec = time.perf_counter() - t0

digest = hashlib.sha256("\n".join(summary).encode()).hexdigest()[:16]
print(json.dumps({{
    "cpus": cpus, "sec": sec, "turns_per_sec": n_turns / sec,
    "summary_hash": digest, "per_conv_rows": per_conv_n, "verdict_rows": verdicts_n,
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
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    results: dict[int, list[dict]] = {8: [], 32: []}
    for _ in range(runs):
        for cpus in (8, 32):
            r = run_level(cpus, n_turns)
            results[cpus].append(r)
            print(f"  local[{cpus}]: {r['sec']:.2f}s  {r['turns_per_sec']:.0f} turns/s  "
                  f"hash={r['summary_hash']}", file=sys.stderr)

    med8 = statistics.median(r["turns_per_sec"] for r in results[8])
    med32 = statistics.median(r["turns_per_sec"] for r in results[32])
    hashes = {r["summary_hash"] for rs in results.values() for r in rs}
    eff = (med32 / med8) / (32 / 8)
    out = {
        "n_turns": n_turns,
        "runs_per_level": runs,
        "turns_per_sec_local8": round(med8, 1),
        "turns_per_sec_local32": round(med32, 1),
        "scaling_efficiency": round(eff, 3),
        "per_sink_counts_identical": len(hashes) == 1,
        "summary_hash": hashes.pop() if len(hashes) == 1 else sorted(hashes),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
