"""Result sinks.

- ``write_visited_csv`` — the reference's ``write_list``
  (``/root/reference/src/citation_graph/citation_graph.py:72-106``): all
  visited vertices sorted by BFS depth, the same 10 header columns,
  ``;`` delimiter (``citation_graph.py:33``). The reference formats
  authors via ``get_authors_str`` and the per-source expected counts as
  ``"name: count"`` joined by ``", "`` — both re-expressed as columns.
  ``coalesce(1)`` because the reference emits one file; at scale drop it
  and let the sink write per-partition parts.

- ``export_graph_attrs`` — the pyvis HTML graph is a driver-side render of
  a *small* collected frame (``citation_graph.py:60-69``); the engine's
  job is only to produce the node-attribute columns (label, size, color,
  title) — SURVEY.md S7/C8/C9.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from citation_graph_spark.functions.authors import authors_str
from citation_graph_spark.functions.ids import priority_id
from citation_graph_spark.functions.viz import node_size, year_color

CSV_DELIMITER = ";"

CSV_COLUMNS = [
    "Depth",
    "Parent id",
    "Id",
    "Authors",
    "Title",
    "Year",
    "Citation count (Actually found)",
    "Url",
    "Received citation count",
    "Meta",
]


def visited_list(visited: DataFrame, vertices: DataFrame) -> DataFrame:
    """Join the BFS state (id, depth, parent) with vertex metadata and
    project the reference's 10 list columns (in order)."""
    joined = visited.join(vertices, "id", "left")
    expected = F.array_join(
        F.transform(
            F.map_entries(
                F.coalesce(
                    "expected_citation_count",
                    F.from_json(F.lit("{}"), "map<string,int>"),
                )
            ),
            lambda e: F.concat_ws(": ", e["key"], e["value"].cast("string")),
        ),
        ", ",
    )
    return joined.select(
        F.col("depth").alias("Depth"),
        F.col("parent").alias("Parent id"),
        F.coalesce(priority_id(F.col("ids")), F.col("id")).alias("Id"),
        authors_str(F.coalesce("authors", F.array())).alias("Authors"),
        F.col("title").alias("Title"),
        F.col("year").alias("Year"),
        F.col("citation_count").alias("Citation count (Actually found)"),
        F.col("url").alias("Url"),
        expected.alias("Received citation count"),
        F.col("meta").cast("string").alias("Meta"),
    ).orderBy("Depth")


def write_visited_csv(
    visited: DataFrame, vertices: DataFrame, path: str, single_file: bool = True
) -> None:
    out = visited_list(visited, vertices)
    if single_file:
        out = out.coalesce(1)
    (
        out.write.mode("overwrite")
        .option("sep", CSV_DELIMITER)
        .option("header", True)
        .csv(path)
    )


def export_graph_attrs(vertices: DataFrame) -> DataFrame:
    """Node-attribute columns for the interactive graph export."""
    return vertices.select(
        "id",
        authors_str(F.coalesce("authors", F.array()), short=True).alias("label"),
        node_size(F.col("citation_count")).alias("size"),
        year_color(F.col("year")).alias("color"),
        F.col("title").alias("title_attr"),
    )


def render_html_graph(
    attrs: DataFrame,
    edges: DataFrame,
    path: str,
    height: str = "750px",
    width: str = "100%",
) -> bool:
    """Driver-side interactive-HTML render — the reference's pyvis export
    (``citation_graph.py:62-71``), the last step after the engine computed
    every node attribute distributed (``export_graph_attrs`` + ``viz.py``).

    By-contract SMALL on the *attrs* side: the reference renders one root
    expansion (hundreds of nodes), so collecting the node table is the
    same driver-side render it does. The EDGE side is NOT assumed small —
    callers may pass a full edge table — so edges are semi-joined against
    the render's node set distributed, and only renderable edges (both
    endpoints present) ever reach the driver.

    pyvis is optional (not in every runtime); without it this is a no-op
    returning False so pipelines degrade to the attribute export."""
    try:
        from pyvis.network import Network  # type: ignore
    except ImportError:
        return False
    net = Network(height=height, width=width, directed=True)
    node_ids = set()
    for r in attrs.collect():
        node_ids.add(r["id"])
        net.add_node(
            r["id"],
            label=r["label"],
            size=r["size"],
            color=r["color"],
            title=r["title_attr"],
        )
    # prune distributed: a full edge table must never be collected — only
    # edges with BOTH endpoints in the (small) rendered node set survive
    ids = attrs.select("id")
    renderable = (
        edges.select("src", "dst")
        .join(F.broadcast(ids).withColumnRenamed("id", "src"), "src", "left_semi")
        .join(F.broadcast(ids).withColumnRenamed("id", "dst"), "dst", "left_semi")
    )
    for r in renderable.collect():
        net.add_edge(r["src"], r["dst"])
    net.save_graph(path)
    return True
