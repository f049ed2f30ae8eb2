"""Mega-conversation skew benchmark (r3 verdict #6).

Plants skew_pct% of all turns into ONE conv_id (`conv-mega`, the
transcripts-generator fixture) and measures the running-claim-count window
(operators/skew.py) in both formulations at two parallelism levels, each in a
fresh JVM:

  * naive  — Window.partitionBy(conv_id): the mega conversation is one task,
    so extra cores cannot shorten the stage (straggler by construction);
  * salted — the two-phase (conv_id, block) scan: bounded per-task state.

The north-rule criterion applies per variant: scaling efficiency
(throughput_hi/throughput_lo)/(hi/lo) must hold >= 0.8 for the salted path;
the naive path's collapse on the same input is the measured straggler
evidence, alongside max_task_rows (the largest row count any single window
task must hold: naive = the whole mega conversation, salted = one block).
Result digests (count + order-free bit_xor of xxhash64 + sum) must be
identical across variants AND levels — the salted rewrite is bit-equal.

Usage: python scripts/bench_skew.py [n_turns] [runs_per_level] [lo] [hi] [skew_pct]
Defaults: 8M turns, 2 rounds, local[2] vs local[8], skew 1%.
Emits one JSON line (recorded in BENCH.md §2).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from openfactverification_spark.operators import parse as parse_ops
from openfactverification_spark.operators import skew as skew_ops
from openfactverification_spark.session import get_spark
from openfactverification_spark.sources.transcripts import transcripts_df

cpus, n_turns, skew_pct, variant = (
    int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
)
spark = get_spark("bench-skew", master=f"local[{{cpus}}]")

# Stage the parsed records once, untimed: both variants window the same
# persisted input, so the timing isolates the window formulation itself.
records = parse_ops.parse_turns(
    transcripts_df(spark, n_turns, skew_pct=skew_pct)
).select("conv_id", "turn_idx", "record_kind").persist()
records.count()

fn = (
    skew_ops.running_claim_count_naive
    if variant == "naive"
    else skew_ops.running_claim_count_salted
)
# tiny warm-up for codegen/classloading
fn(records.limit(1000)).collect()

t0 = time.perf_counter()
out = fn(records)
row = out.selectExpr(
    "count(*) AS n",
    "bit_xor(xxhash64(conv_id, turn_idx, running_claims)) AS dig",
    "sum(running_claims) AS s",
).collect()[0]
sec = time.perf_counter() - t0

# straggler evidence: the largest row count one window task must hold.
# Both formulations window the per-(conv, turn) AGGREGATED frame (the
# groupBy inside running_claim_count_*), so the state is one row per TURN —
# counting raw records here would overstate it by the records-per-turn
# factor.
per_turn = records.groupBy("conv_id", "turn_idx").count()
if variant == "naive":
    key = [F.col("conv_id")]
else:
    key = [F.col("conv_id"), (F.col("turn_idx") / skew_ops.DEFAULT_BLOCK).cast("long")]
max_task_rows = (
    per_turn.groupBy(*key).count().agg(F.max("count").alias("m")).collect()[0]["m"]
)

print(json.dumps({{
    "variant": variant, "cpus": cpus, "sec": sec,
    "rows_per_sec": row["n"] / sec,
    "digest": f"{{row['n']}}:{{row['dig']}}:{{row['s']}}",
    "max_task_rows": max_task_rows,
}}))
spark.stop()
"""


def run_one(cpus: int, n_turns: int, skew_pct: int, variant: str) -> dict:
    code = WORKER.format(repo=REPO)
    out = subprocess.run(
        [sys.executable, "-c", code, str(cpus), str(n_turns), str(skew_pct), variant],
        capture_output=True, text=True, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    lo = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    hi = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    skew_pct = int(sys.argv[5]) if len(sys.argv) > 5 else 1

    results: dict[tuple, list[dict]] = {}
    for _ in range(runs):
        for variant in ("naive", "salted"):
            for cpus in (lo, hi):  # alternate levels so machine drift hits both
                r = run_one(cpus, n_turns, skew_pct, variant)
                results.setdefault((variant, cpus), []).append(r)
                print(
                    f"  {variant} local[{cpus}]: {r['sec']:.2f}s "
                    f"{r['rows_per_sec']:.0f} rows/s max_task_rows={r['max_task_rows']}",
                    file=sys.stderr,
                )

    digests = {r["digest"] for rs in results.values() for r in rs}
    out: dict = {
        "n_turns": n_turns,
        "skew_pct": skew_pct,
        "runs_per_level": runs,
        "digest_equal": len(digests) == 1,
        "digest": sorted(digests),
    }
    for variant in ("naive", "salted"):
        best_lo = max(r["rows_per_sec"] for r in results[(variant, lo)])
        best_hi = max(r["rows_per_sec"] for r in results[(variant, hi)])
        out[f"{variant}_rows_per_sec_local{lo}"] = round(best_lo, 1)
        out[f"{variant}_rows_per_sec_local{hi}"] = round(best_hi, 1)
        out[f"{variant}_scaling_efficiency"] = round((best_hi / best_lo) / (hi / lo), 3)
        out[f"{variant}_max_task_rows"] = results[(variant, lo)][0]["max_task_rows"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
