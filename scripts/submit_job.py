"""spark-submit entry — the north rule's packaging path:

    spark-submit --master <cluster> --py-files cgs.zip scripts/submit_job.py

The package must arrive ONLY via ``--py-files`` (this script adds no
sys.path entries), and the job deliberately crosses the driver/worker
pickle boundary: ``generate_pages`` + ``build_edges`` run package-defined
pandas UDFs on the executors, which fail to unpickle unless the zip was
shipped. Prints one JSON line with the PageRank summary.
"""

import json

from pyspark.sql import SparkSession

from citation_graph_spark import datagen
from citation_graph_spark.edges import build_edges
from citation_graph_spark.operators.pagerank import pagerank


def main() -> int:
    # spark-submit owns master/conf; getOrCreate attaches to what it built
    spark = SparkSession.builder.appName("cgs-submit-smoke").getOrCreate()
    pages = datagen.generate_pages(spark, 400, seed=42).cache()
    edges = build_edges(pages).cache()
    res = pagerank(edges, tol=1e-6, max_iter=60)
    summary = {
        "vertices": res.ranks.count(),
        "iters": res.iterations,
        "rank_sum": round(res.ranks.groupBy().sum("rank").first()[0], 9),
        "converged": res.converged,
    }
    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
