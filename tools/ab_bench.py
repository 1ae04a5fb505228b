"""Interleaved A/B benchmark between two checked-out code variants.

Motivation (VERDICT.md round 2, "Next round" #1): the r1->r2 headline
bench showed a median 1.14x slowdown, but this host's effective CPU
allocation drifts 2-3x on a minutes timescale (see BENCH/BASELINE.md),
so separate-session comparisons are not evidence.  This script runs the
two variants ALTERNATELY in one session (A,B,B,A,A,B,B,A ...), pairs
each adjacent (A,B) sample, and reports the per-query median ratio —
the same interleaving protocol the scaling runs use.

Usage:
    python tools/ab_bench.py /tmp/ab_r1 /tmp/ab_r2 [rounds] [out.json]

Each variant dir must contain a bench.py honoring SPARK_GRAFT_SF_DIR /
SPARK_GRAFT_CPUS / BENCH_TURNS.  Both variants share the transcript
cache under /tmp/tsaug_bench, so generation cost is paid once.
"""

from __future__ import annotations

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
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    dir_a, dir_b = sys.argv[1], sys.argv[2]
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    out_path = sys.argv[4] if len(sys.argv) > 4 else "BENCH/ab_interleaved.json"

    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    env.setdefault("SPARK_GRAFT_CPUS", "32")
    env.setdefault("BENCH_TURNS", "2000000")

    # unmeasured warm-up of each variant (first-run-in-session loses;
    # BENCH/BASELINE.md protocol)
    print("warm-up A", flush=True)
    run_bench(dir_a, env)
    print("warm-up B", flush=True)
    run_bench(dir_b, env)

    samples: dict[str, list[dict]] = {"a": [], "b": []}
    order_flip = False
    for r in range(rounds):
        pair = ["b", "a"] if order_flip else ["a", "b"]
        order_flip = not order_flip
        for which in pair:
            d = dir_a if which == "a" else dir_b
            t0 = time.time()
            res = run_bench(d, env)
            print(
                f"round {r} {which}: total={res['value']}s "
                f"(wall {time.time() - t0:.0f}s)",
                flush=True,
            )
            samples[which].append(res)

    qa = set(samples["a"][0]["queries"])
    qb = set(samples["b"][0]["queries"])
    common = sorted(qa & qb)
    per_query = {}
    for q in common:
        ratios = [
            samples["b"][i]["queries"][q] / samples["a"][i]["queries"][q]
            for i in range(rounds)
        ]
        per_query[q] = {
            "a_med": round(statistics.median(s["queries"][q] for s in samples["a"]), 3),
            "b_med": round(statistics.median(s["queries"][q] for s in samples["b"]), 3),
            "ratio_med": round(statistics.median(ratios), 3),
            "ratios": [round(x, 3) for x in ratios],
        }
    total_ratios = [
        sum(samples["b"][i]["queries"][q] for q in common)
        / sum(samples["a"][i]["queries"][q] for q in common)
        for i in range(rounds)
    ]
    report = {
        "protocol": "interleaved A/B, order alternated per round, warm-up discarded",
        "variant_a": dir_a,
        "variant_b": dir_b,
        "rounds": rounds,
        "common_queries": common,
        "per_query": per_query,
        "total_ratio_b_over_a": [round(x, 3) for x in total_ratios],
        "total_ratio_median": round(statistics.median(total_ratios), 3),
    }
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"median_total_ratio": report["total_ratio_median"]}))


if __name__ == "__main__":
    main()
