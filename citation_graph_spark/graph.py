"""High-level programmatic API — the reference's entry point 2.

The reference exposes ``main(**kwargs)`` (``citation_graph.py:379-384``);
the engine's equivalent is an object wrapping a pages table / edge
DataFrame with the full algorithm surface:

    g = LinkGraph.from_pages(pages_df, max_per_src=300)
    g.out_degrees()                 # A1
    g.pagerank(tol=1e-6)            # north-rule workload (resumable)
    g.connected_components()        # hash-min or two_star
    g.label_propagation()
    g.triangle_count()
    g.bfs("https://...", max_depth=2, exclude=...)

The wrapped edge DataFrame is built ONCE (dedup, cap, partitioned on src)
and shared by every algorithm — the reference's response cache reborn.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from citation_graph_spark import edges as E


@dataclass
class LinkGraph:
    edges: DataFrame  # (src, dst[, pos])
    _prepared: object = None  # PreparedGraph, built by prepare()

    @classmethod
    def from_pages(
        cls,
        pages: DataFrame,
        max_per_src: int | None = None,
        encode: str = "none",
        num_partitions: int | None = None,
    ) -> "LinkGraph":
        return cls(
            E.build_edges(
                pages, max_per_src=max_per_src, encode=encode, num_partitions=num_partitions
            )
        )

    def cache(self) -> "LinkGraph":
        self.edges = self.edges.persist()
        return self

    def prepare(self, num_partitions: int | None = None) -> "LinkGraph":
        """Build (lazily) the shared static algorithm tables — weighted
        sorted edges, symmetrized view, dangling flags — so repeated
        ``pagerank``/``connected_components``/``label_propagation`` calls
        pay the setup once. Release with :meth:`unprepare`."""
        from citation_graph_spark.operators.prepared import PreparedGraph

        if self._prepared is None:
            self._prepared = PreparedGraph(self.edges, num_partitions)
        return self

    def unprepare(self) -> "LinkGraph":
        if self._prepared is not None:
            self._prepared.unpersist()
            self._prepared = None
        return self

    # --- degrees ------------------------------------------------------------
    def out_degrees(self) -> DataFrame:
        return E.out_degrees(self.edges)

    def in_degrees(self) -> DataFrame:
        return E.in_degrees(self.edges)

    def degrees(self) -> DataFrame:
        return E.degrees(self.edges)

    def vertices(self) -> DataFrame:
        return E.vertices_of(self.edges)

    # --- algorithms -----------------------------------------------------------
    def pagerank(self, **kwargs):
        from citation_graph_spark.operators.pagerank import pagerank

        return pagerank(self.edges, prepared=self._prepared, **kwargs)

    def connected_components(self, **kwargs):
        from citation_graph_spark.operators.components import connected_components

        return connected_components(self.edges, prepared=self._prepared, **kwargs)

    def label_propagation(self, **kwargs):
        from citation_graph_spark.operators.label_propagation import label_propagation

        return label_propagation(self.edges, prepared=self._prepared, **kwargs)

    def triangle_count(self) -> int:
        from citation_graph_spark.operators.triangles import triangle_count

        return triangle_count(self.edges)

    def triangle_counts(self) -> DataFrame:
        from citation_graph_spark.operators.triangles import triangle_counts_per_vertex

        return triangle_counts_per_vertex(self.edges)

    def bfs(self, root, max_depth: int, **kwargs):
        from citation_graph_spark.operators.bfs import bfs_expand

        return bfs_expand(self.edges, root=root, max_depth=max_depth, **kwargs)

    def sssp(self, roots, weight_col: str = "weight", **kwargs):
        from citation_graph_spark.operators.sssp import sssp

        return sssp(self.edges, roots=roots, weight_col=weight_col, **kwargs)

    def random_walks(self, **kwargs):
        from citation_graph_spark.operators.walks import random_walks

        return random_walks(self.edges, **kwargs)

    def betweenness(self, **kwargs):
        from citation_graph_spark.operators.betweenness import betweenness

        return betweenness(self.edges, **kwargs)

    def harmonic_centrality(self, max_d: int = 6, k: int = 32, **kwargs):
        from citation_graph_spark.operators.neighborhood import (
            harmonic_centrality,
            hyperanf,
        )

        res = hyperanf(self.edges, max_d=max_d, k=k, **kwargs)
        return harmonic_centrality(res.per_vertex, k=k)

    def reciprocity(self) -> DataFrame:
        from citation_graph_spark.operators.metrics import reciprocity

        return reciprocity(self.edges)

    def degree_assortativity(self) -> DataFrame:
        from citation_graph_spark.operators.metrics import degree_assortativity

        return degree_assortativity(self.edges)

    def degree_histogram(self) -> DataFrame:
        from citation_graph_spark.operators.metrics import degree_histogram

        return degree_histogram(self.edges)

    def coarsen(self, mapping: DataFrame, **kwargs) -> "LinkGraph":
        from citation_graph_spark.operators.metrics import coarsen

        return LinkGraph(edges=coarsen(self.edges, mapping, **kwargs))
