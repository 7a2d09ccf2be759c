"""PageRank superstep cost at larger graph scale (round 5).

Companion to ``bench_dedup_scale.py`` for the headline workload: the
100 TB claims for the superstep loop rest on the plan shape (SMJ against
a persist-once sorted edge cache, map-side partials, one scalar action
per superstep).  This study measures the same end-to-end ``bench.py
--only pagerank`` job at 1x, 5x and 10x the sf0.1 graph (same Zipf
exponent, same seed, edges/vertices scaled together so average degree is
constant) and reports the MIN superstep wall per point — on a noisy host
interference only ever slows a superstep, so the fastest one is the
closest sample of true capability (same estimator as the scaling study).

What linear-by-construction predicts: min-superstep wall grows
proportionally with |E| once per-superstep fixed costs (task launch,
barrier, driver action) are amortized — i.e. *peak edges/sec flat or
rising* across the 10x sweep.  Superlinear superstep growth (per-edge
cost rising with |E|) would falsify the extrapolation; that is the check.

Each scale point is a fresh subprocess (fresh JVM).  Writes/updates the
"## PageRank at larger graph scale" BENCH.md section; prints one JSON
line per point.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_scaling import _replace_or_append_section  # noqa: E402

# 1x = the sf0.1 default (800k vertices / 8M edges, bench.py:100-105)
BASE_V, BASE_E = 800_000, 8_000_000


def run_point(mult: int, cpus: int, sf_dir: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_BENCH_VERTICES=str(BASE_V * mult),
        SPARK_GRAFT_BENCH_EDGES=str(BASE_E * mult),
        SPARK_GRAFT_BENCH_TRIALS="1",  # superstep walls, not suite wall
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--only", "pagerank"],
        env=env,
        capture_output=True,
        text=True,
        check=True,
    )
    r = json.loads(out.stdout.strip().splitlines()[-1])
    return {
        "mult": mult,
        "n_edges": r["n_edges"],
        "iters": r["pagerank_iters"],
        "graph_build_s": r["queries"]["graph_build"],
        "pagerank_wall_s": r["queries"]["pagerank"],
        "iter_s_min": r["pagerank_iter_seconds_min"],
        "iter_s_median": r["pagerank_iter_seconds_median"],
        "peak_edges_per_sec": r["pagerank_peak_edges_per_sec"],
        "iter_seconds_all": r["pagerank_iter_seconds_all"],
    }


def main() -> int:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    mults = [
        int(m)
        for m in os.environ.get("SPARK_GRAFT_GRAPH_SCALES", "1,5,10").split(",")
    ]
    results = [run_point(m, cpus, sf_dir) for m in mults]
    for r in results:
        print(json.dumps(r))

    base = results[0]
    rows = "\n".join(
        "| {mult}× | {n_edges:,} | {iters} | {graph_build_s} | {pagerank_wall_s} "
        "| {iter_s_min} | {peak_edges_per_sec:,.0f} |".format(**r)
        for r in results
    )
    ratios = ", ".join(
        f"{r['mult']}×edges → {r['iter_s_min'] / base['iter_s_min']:.1f}×min-superstep, "
        f"{r['peak_edges_per_sec'] / base['peak_edges_per_sec']:.2f}×peak-e/s"
        for r in results[1:]
    )
    title = "## PageRank at larger graph scale"
    body = f"""{title}

Headline-workload analog of the MinHash corpus-scale study: the same
`bench.py --only pagerank` job (Zipf graph, seed 42, constant average
degree 10, to 1e-6) at 1×, 5× and 10× the sf0.1 graph, one fresh JVM per
point, local[{cpus}].  The per-point metric is the MIN superstep wall
(interference only slows supersteps; the fastest is the cleanest sample
— the scaling study's estimator).  Linear-by-construction predicts
peak edges/sec flat-or-rising as fixed per-superstep costs amortize;
per-edge cost RISING with |E| would falsify the 100 TB extrapolation.

| scale | edges | supersteps | build (s) | pagerank wall (s) | min superstep (s) | peak edges/sec |
|---|---|---|---|---|---|---|
{rows}

Scaling check: {ratios}.
"""
    _replace_or_append_section(os.path.join(REPO, "BENCH.md"), title, body)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
