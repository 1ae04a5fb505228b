"""Cascade-only interleaved A/B: runs JUST run_cascade from each
variant's bench.py, alternating, to isolate whether the tier_cascade
slip is in the (byte-identical) cascade path or an artifact of the
longer r2 suite. Usage: python tools/ab_cascade_only.py dirA dirB rounds
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

SNIPPET = r"""
import json, sys, time
sys.path.insert(0, ".")
import bench
spark = bench._session("32")
table = bench._ensure_transcripts(spark, 8695, 200)
res = bench.run_cascade(spark, table)
print(json.dumps({"wall_s": res["wall_s"]}))
"""


def run_one(d: str, env: dict) -> float:
    out = subprocess.run(
        [sys.executable, "-c", SNIPPET],
        cwd=d,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if out.returncode != 0 or not lines:
        raise RuntimeError(
            f"cascade run failed in {d} "
            f"(rc={out.returncode}):\n{out.stderr[-2000:]}"
        )
    return json.loads(lines[-1])["wall_s"]


def main() -> None:
    dir_a, dir_b, rounds = sys.argv[1], sys.argv[2], int(sys.argv[3])
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_CPUS", "32")
    print("warm-up", run_one(dir_a, env), run_one(dir_b, env), flush=True)
    a, b = [], []
    for r in range(rounds):
        order = [("b", dir_b), ("a", dir_a)] if r % 2 else [
            ("a", dir_a), ("b", dir_b)
        ]
        for name, d in order:
            w = run_one(d, env)
            (a if name == "a" else b).append(w)
            print(f"round {r} {name}: {w:.2f}s", flush=True)
    ratios = [y / x for x, y in zip(a, b)]
    print(
        json.dumps(
            {
                "a": [round(x, 2) for x in a],
                "b": [round(x, 2) for x in b],
                "ratio_med": round(statistics.median(ratios), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
