"""N vs 4N scaling-efficiency evidence (sandbox protocol, BASELINE.md).

No real cluster here, so per the north rule's sandbox protocol we run the
IDENTICAL PageRank benchmark at two parallelism levels — local[8] (N) and
local[32] (4N) — on the same synthetic Zipfian input (same seed), and
report throughput at both plus efficiency = throughput(4N) / (4 ×
throughput(N)). Each run is a fresh subprocess (fresh JVM) so the two
measurements don't share executor state.

Writes the results table into BENCH.md and prints a JSON summary.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--only", "pagerank"],
        capture_output=True,
        text=True,
        env=env,
        check=True,
        cwd=REPO,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_small, n_big = 8, 32
    small = run_bench(n_small, sf_dir)
    big = run_bench(n_big, sf_dir)
    thr_small = small["pagerank_edges_per_sec"]
    thr_big = big["pagerank_edges_per_sec"]
    eff = thr_big / (4.0 * thr_small)
    summary = {
        "sf": small["sf"],
        "n_edges": small["n_edges"],
        "iters": small["pagerank_iters"],
        f"throughput_local[{n_small}]_edges_per_sec": thr_small,
        f"throughput_local[{n_big}]_edges_per_sec": thr_big,
        f"seconds_local[{n_small}]": small["pagerank_seconds"],
        f"seconds_local[{n_big}]": big["pagerank_seconds"],
        "scaling_efficiency_N_to_4N": round(eff, 3),
    }
    print(json.dumps(summary))

    md = f"""# BENCH — measured scaling evidence

Sandbox protocol (no real cluster, see BASELINE.md): identical PageRank
job (Zipfian graph, seed 42, {small['n_edges']:,} edges, tol 1e-6, sf
{small['sf']}) at two parallelism levels, fresh JVM each.

| parallelism | wall (s) | iterations | edges/sec (|E|·iters/wall) |
|---|---|---|---|
| local[{n_small}] (N) | {small['pagerank_seconds']} | {small['pagerank_iters']} | {thr_small:,.0f} |
| local[{n_big}] (4N) | {big['pagerank_seconds']} | {big['pagerank_iters']} | {thr_big:,.0f} |

**Scaling efficiency N → 4N = throughput(4N) / (4 × throughput(N)) =
{eff:.3f}** (target ≥ 0.8).

Edges/sec per executor: local mode is a single JVM "executor" with the
given core count, so per-executor throughput equals the table values.
"""
    with open(os.path.join(REPO, "BENCH.md"), "w", encoding="utf-8") as fh:
        fh.write(md)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
