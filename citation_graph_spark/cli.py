"""CLI entry — the reference's command line, re-targeted at bulk tables.

Reference surface (``/root/reference/src/citation_graph/citation_graph.py:
191-367``): ``python -m citation_graph <id> -d DEPTH -m MAX_CITATIONS
--exclude ... --cache ...`` crawling one root through REST APIs. Here the
corpus is already a pages table, so the same knobs drive a Spark job:

    python -m citation_graph_spark ROOT_URL --pages PATH \
        [-d DEPTH] [-m MAX_CITATIONS_PER_PAPER] [--exclude FILE ...] \
        [--checkpoint DIR] [--list-file OUT_DIR] [--algorithm bfs] \
        [--master local[32]]

Algorithms: bfs (default — the reference's expand), pagerank, ppr
(personalized, seeded at ROOT_URL), cc, lpa, triangles, hits, kcore
(``--k``), linkpred (``--min-common`` / ``--max-center-degree``), scc
(directed components), hyperanf (neighborhood function / effective
diameter).
BFS writes the reference's depth-sorted ``;``-CSV when
``--list-file`` is given; rank/label algorithms write Parquet. Programmatic
use (reference entry point 2, ``citation_graph.py:379-384``): call
``run(args_namespace)`` or the library API directly.

Ships via ``spark-submit --py-files cgs.zip cli_submit.py`` or plain
``python -m citation_graph_spark`` (the session factory zips + ships the
package itself, session.py:_ship_package).
"""

from __future__ import annotations

import argparse
import sys

DEFAULT_MAX_DEPTH = 1  # reference citation_graph.py:30
DEFAULT_MAX_CITATIONS_PER_PAPER = 300  # reference citation_graph.py:32


def get_arg_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="citation_graph_spark",
        description="PySpark link-graph engine over a Common-Crawl-style pages table",
    )
    ap.add_argument("root", nargs="?", help="root page url (required for bfs)")
    ap.add_argument("--pages", required=True, help="pages table path (iceberg or parquet)")
    ap.add_argument("-d", "--max-depth", type=int, default=DEFAULT_MAX_DEPTH)
    ap.add_argument(
        "-m",
        "--max-citations-per-paper",
        type=int,
        default=DEFAULT_MAX_CITATIONS_PER_PAPER,
        help="per-src fan-out cap in extraction order",
    )
    ap.add_argument(
        "--exclude",
        action="append",
        default=[],
        help="exclude-list file(s) (reference format: one id per line, # comments)",
    )
    ap.add_argument("--checkpoint", default=None, help="checkpoint dir (resumable)")
    ap.add_argument("--list-file", default=None, help="CSV output dir (bfs)")
    ap.add_argument("--output", default=None, help="parquet output dir (rank/label algos)")
    ap.add_argument(
        "--algorithm",
        choices=[
            "bfs", "pagerank", "ppr", "cc", "lpa", "triangles",
            "hits", "kcore", "linkpred", "scc", "hyperanf",
            "harmonic", "betweenness", "metrics", "sssp", "walks",
        ],
        default="bfs",
    )
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--max-iter", type=int, default=100)
    ap.add_argument("--k", type=int, default=2, help="k for --algorithm kcore")
    ap.add_argument(
        "--min-common", type=int, default=2, help="linkpred: min common neighbours"
    )
    ap.add_argument(
        "--max-center-degree",
        type=int,
        default=None,
        help="linkpred: wedge-center degree cap (skew guard)",
    )
    ap.add_argument("--master", default=None, help="spark master (default local[$SPARK_GRAFT_CPUS])")
    return ap


def run(args: argparse.Namespace) -> int:
    from pyspark.sql import functions as F

    from pyspark.sql import SparkSession

    from citation_graph_spark.edges import dedup_edges, encode_vertices_hash
    from citation_graph_spark.session import get_spark
    from citation_graph_spark.sources.databases import merged_edges
    from citation_graph_spark.sources.exclude_list import read_exclude_list
    from citation_graph_spark.sources.pages import read_pages

    # only stop the session on exit if this invocation created it
    # (programmatic callers may pass in a live session via getOrCreate)
    owns_session = SparkSession.getActiveSession() is None
    spark = get_spark(app_name="citation_graph_spark", master=args.master)
    pages = read_pages(spark, args.pages)
    edges = dedup_edges(merged_edges(pages).select("src", "dst", "pos")).persist()

    exclude = None
    for path in args.exclude:
        # allow_bare: vertex ids here are page urls, so exclude files may
        # carry bare urls alongside the reference's canonical type::id lines
        parsed, malformed = read_exclude_list(spark, path, allow_bare=True)
        n_bad = malformed.count()
        if n_bad:
            print(f"warning: {n_bad} malformed exclude line(s) in {path}", file=sys.stderr)
        # Vertex ids here are page urls. An exclude entry may address a
        # vertex either by its raw id (``url::https://…`` → the url itself)
        # or by the reference's canonical ``type::id`` form — match BOTH id
        # spaces so a canonical-format entry can never silently no-op.
        ids = parsed.select(F.col("raw_id").alias("id")).unionByName(
            parsed.select(F.col("id"))
        ).distinct()
        exclude = ids if exclude is None else exclude.unionByName(ids)

    if args.algorithm == "bfs":
        if not args.root:
            print("error: bfs needs a root url", file=sys.stderr)
            return 2
        from citation_graph_spark.operators.bfs import bfs_expand

        res = bfs_expand(
            edges,
            root=args.root,
            max_depth=args.max_depth,
            max_per_src=args.max_citations_per_paper,
            exclude=exclude,
            checkpoint_dir=args.checkpoint,
        )
        n = res.visited.count()
        print(f"bfs: {n} vertices reached, depth {res.depth_reached}")
        if args.list_file:
            from citation_graph_spark.sources.sinks import write_visited_csv

            vertices = pages.select(
                F.col("url").alias("id"),
                F.lit(None).cast("map<string,string>").alias("ids"),
                F.lit(None).cast(
                    "array<struct<forename:string,lastname:string>>"
                ).alias("authors"),
                F.year("warc_ts").alias("year"),
                F.substring("text", 1, 80).alias("title"),
                F.col("url").alias("url"),
                F.lit(None).cast("long").alias("citation_count"),
                F.lit(None).cast("map<string,int>").alias("expected_citation_count"),
                F.lit(None).cast("map<string,string>").alias("meta"),
            )
            write_visited_csv(res.visited, vertices, args.list_file)
            print(f"list written to {args.list_file}")
    else:
        enc = encode_vertices_hash(edges)
        if args.algorithm == "pagerank":
            from citation_graph_spark.operators.pagerank import pagerank

            res = pagerank(
                enc, tol=args.tol, max_iter=args.max_iter, checkpoint_dir=args.checkpoint
            )
            out = res.ranks
            print(f"pagerank: {res.iterations} iterations, delta {res.delta:.3e}")
        elif args.algorithm == "cc":
            from citation_graph_spark.operators.components import connected_components

            res = connected_components(
                enc, max_iter=args.max_iter, checkpoint_dir=args.checkpoint
            )
            out = res.labels
            print(f"cc: {res.iterations} iterations, converged={res.converged}")
        elif args.algorithm == "lpa":
            from citation_graph_spark.operators.label_propagation import label_propagation

            res = label_propagation(
                enc, max_iter=args.max_iter, checkpoint_dir=args.checkpoint
            )
            out = res.labels
            print(f"lpa: {res.iterations} iterations, converged={res.converged}")
        elif args.algorithm == "ppr":
            if not args.root:
                print("error: ppr needs a root url (the seed set)", file=sys.stderr)
                return 2
            from citation_graph_spark.operators.pagerank import personalized_pagerank

            sources = spark.createDataFrame([(args.root,)], "url string").select(
                F.xxhash64("url").alias("id")
            )
            res = personalized_pagerank(
                enc,
                sources=sources,
                tol=args.tol,
                max_iter=args.max_iter,
                checkpoint_dir=args.checkpoint,
            )
            out = res.ranks
            print(f"ppr: {res.iterations} iterations, delta {res.delta:.3e}")
        elif args.algorithm == "hits":
            from citation_graph_spark.operators.hits import hits

            res = hits(
                enc, tol=args.tol, max_iter=args.max_iter,
                checkpoint_dir=args.checkpoint,
            )
            out = res.scores
            print(f"hits: {res.iterations} iterations, converged={res.converged}")
        elif args.algorithm == "kcore":
            from citation_graph_spark.operators.kcore import k_core

            res = k_core(enc, k=args.k, max_iter=args.max_iter)
            out = res.vertices
            print(
                f"kcore: k={args.k}, {res.iterations} rounds, "
                f"{out.count()} core vertices"
            )
        elif args.algorithm == "scc":
            from citation_graph_spark.operators.scc import (
                strongly_connected_components,
            )

            res = strongly_connected_components(enc, max_rounds=args.max_iter)
            out = res.labels
            print(
                f"scc: {res.rounds} rounds, converged={res.converged}, "
                f"{out.select('scc').distinct().count()} components"
            )
        elif args.algorithm == "hyperanf":
            from citation_graph_spark.operators.neighborhood import hyperanf

            res = hyperanf(enc, max_d=args.max_iter if args.max_iter < 100 else 6)
            out = res.per_vertex
            nf_str = ", ".join(f"NF({d})≈{v:,.0f}" for d, v in res.nf)
            print(
                f"hyperanf: {nf_str}; effective diameter ≈ "
                f"{res.effective_diameter}"
            )
        elif args.algorithm == "harmonic":
            from citation_graph_spark.operators.neighborhood import (
                harmonic_centrality,
                hyperanf,
            )

            k = 32
            res = hyperanf(enc, max_d=args.max_iter if args.max_iter < 100 else 6, k=k)
            out = harmonic_centrality(res.per_vertex, k=k)
            top = out.orderBy(out.harmonic.desc()).first()
            print(f"harmonic: top vertex {top['id']} HC≈{top['harmonic']:.2f}")
        elif args.algorithm == "betweenness":
            from citation_graph_spark.operators.betweenness import betweenness

            res = betweenness(
                enc,
                n_roots=args.k if args.k > 2 else 16,
                max_d=args.max_iter if args.max_iter < 100 else 4,
            )
            out = res.scores
            top = out.orderBy(out.betweenness.desc()).first()
            print(
                f"betweenness: {res.n_roots} roots, top vertex "
                f"{top['id']} bc≈{top['betweenness']:.2f}"
            )
        elif args.algorithm == "sssp":
            from pyspark.sql import functions as F

            from citation_graph_spark.operators.sssp import sssp

            roots = (
                enc.select(F.col("src").alias("root"))
                .distinct()
                .orderBy("root")
                .limit(args.k if args.k > 2 else 4)
            )
            res = sssp(
                enc.select("src", "dst", F.lit(1).alias("weight")),
                roots=roots,
                max_rounds=args.max_iter,
            )
            out = res.distances
            print(
                f"sssp: {res.rounds} rounds, converged={res.converged}, "
                f"{out.count()} (root, vertex) distances"
            )
        elif args.algorithm == "walks":
            from citation_graph_spark.operators.walks import random_walks

            res = random_walks(
                enc, walk_length=args.max_iter if args.max_iter < 100 else 8
            )
            out = res.corpus
            print(
                f"walks: {res.n_walks} walks × ≤{res.walk_length} steps, "
                f"{out.count()} corpus rows"
            )
        elif args.algorithm == "metrics":
            from citation_graph_spark.operators.metrics import (
                degree_assortativity,
                reciprocity,
            )

            r = reciprocity(enc).first()
            a = degree_assortativity(enc).first()
            out = enc.sparkSession.createDataFrame(
                [
                    (
                        r["mutual_edges"],
                        r["total_edges"],
                        r["reciprocity"],
                        a["assortativity"],
                    )
                ],
                "mutual_edges long, total_edges long, "
                "reciprocity double, assortativity double",
            )
            print(
                f"metrics: reciprocity={r['reciprocity']}, "
                f"assortativity={a['assortativity']}"
            )
        elif args.algorithm == "linkpred":
            from citation_graph_spark.operators.linkpred import link_prediction_scores

            res = link_prediction_scores(
                enc,
                min_common=args.min_common,
                max_center_degree=args.max_center_degree,
            )
            out = res.scores
            print(
                f"linkpred: {out.count()} candidate pairs "
                f"({res.dropped_centers} centers capped)"
            )
        else:
            from citation_graph_spark.operators.triangles import triangle_counts_per_vertex

            out = triangle_counts_per_vertex(enc)
            print(f"triangles: {out.agg({'triangles': 'sum'}).first()[0] // 3} total")
        if args.output:
            out.write.mode("overwrite").parquet(args.output)
            print(f"output written to {args.output}")
    if owns_session:
        spark.stop()
    return 0


def main(argv: list[str] | None = None, **kwargs) -> int:
    """CLI or programmatic (kwargs bypass argv — reference entry point 2)."""
    if kwargs:
        parser = get_arg_parser()
        defaults = {
            a.dest: a.default for a in parser._actions if a.dest not in ("help",)
        }
        defaults.update(kwargs)
        return run(argparse.Namespace(**defaults))
    return run(get_arg_parser().parse_args(argv))
