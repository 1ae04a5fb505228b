"""Interleaved A/B/N benchmark between checked-out code variants.

Motivation (VERDICT.md round 2, "Next round" #1): the r1->r2 headline
bench showed a median 1.14x slowdown, but this host's effective CPU
allocation drifts 2-3x on a minutes timescale (see BENCH/BASELINE.md),
so separate-session comparisons are not evidence.  This script runs
all variants ALTERNATELY in one session (the start position rotates
every round so each variant samples every slot in the cycle), pairs
same-round samples, and reports per-query median ratios vs the first
variant — the same interleaving protocol the scaling runs use.

Usage:
    python tools/ab_bench.py DIR_A DIR_B [DIR_C ...] [--rounds N]
        [--out out.json]

Each variant dir must contain a bench.py honoring SPARK_GRAFT_SF_DIR /
SPARK_GRAFT_CPUS / BENCH_TURNS.  All variants share the transcript
cache under /tmp/tsaug_bench, so generation cost is paid once.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time


def run_bench(variant_dir: str, env: dict) -> dict:
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=variant_dir,
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if out.returncode != 0 or not lines:
        raise RuntimeError(
            f"bench failed in {variant_dir} "
            f"(rc={out.returncode}):\n{out.stderr[-2000:]}"
        )
    return json.loads(lines[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("dirs", nargs="+")
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--out", default="BENCH/ab_interleaved.json")
    args = ap.parse_args()
    dirs = args.dirs
    names = [chr(ord("a") + i) for i in range(len(dirs))]

    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    env.setdefault("SPARK_GRAFT_CPUS", "32")
    env.setdefault("BENCH_TURNS", "2000000")
    # A/B compares the query suite; the streaming ingest line is
    # separate evidence and would only add constant wall per run
    env.setdefault("BENCH_STREAM", "0")

    # unmeasured warm-up of each variant (first-run-in-session loses;
    # BENCH/BASELINE.md protocol)
    for n, d in zip(names, dirs):
        print(f"warm-up {n}", flush=True)
        run_bench(d, env)

    samples: dict[str, list[dict]] = {n: [] for n in names}
    for r in range(args.rounds):
        rot = r % len(names)
        order = list(zip(names, dirs))[rot:] + list(zip(names, dirs))[:rot]
        for which, d in order:
            t0 = time.time()
            res = run_bench(d, env)
            print(
                f"round {r} {which}: total={res['value']}s "
                f"(wall {time.time() - t0:.0f}s)",
                flush=True,
            )
            samples[which].append(res)

    common = sorted(
        set.intersection(
            *(set(samples[n][0]["queries"]) for n in names)
        )
    )
    per_query = {}
    for q in common:
        entry = {}
        for n in names:
            entry[f"{n}_med"] = round(
                statistics.median(
                    s["queries"][q] for s in samples[n]
                ),
                3,
            )
        for n in names[1:]:
            ratios = [
                samples[n][i]["queries"][q]
                / samples["a"][i]["queries"][q]
                for i in range(args.rounds)
            ]
            entry[f"ratio_{n}_over_a"] = round(
                statistics.median(ratios), 3
            )
            entry[f"ratios_{n}"] = [round(x, 3) for x in ratios]
        per_query[q] = entry

    totals = {}
    for n in names[1:]:
        tr = [
            sum(samples[n][i]["queries"][q] for q in common)
            / sum(samples["a"][i]["queries"][q] for q in common)
            for i in range(args.rounds)
        ]
        totals[f"total_ratio_{n}_over_a"] = [round(x, 3) for x in tr]
        totals[f"total_ratio_{n}_median"] = round(
            statistics.median(tr), 3
        )

    report = {
        "protocol": (
            "interleaved, start position rotates per round, "
            "warm-up discarded"
        ),
        "variants": dict(zip(names, dirs)),
        "rounds": args.rounds,
        "common_queries": common,
        "per_query": per_query,
        **totals,
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: v for k, v in totals.items() if "median" in k}))


if __name__ == "__main__":
    main()
