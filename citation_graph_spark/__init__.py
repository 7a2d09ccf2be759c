"""citation_graph_spark — a from-scratch PySpark-native link-graph analytics engine.

Re-expresses the *capabilities* of ``miile7/citation-graph`` (a sequential
crawl-and-expand citation-graph builder, see ``/root/reference``) as an
idiomatic Spark DataFrame engine over Common-Crawl-style page tables:

- vectorized link extraction (``extract``) producing a salted, bucketed
  ``(src, dst, pos)`` edge DataFrame,
- iterative graph algorithms as join-aggregate supersteps (``operators``):
  BFS root expansion, PageRank, connected components, label propagation,
  triangle counting,
- checkpointed, resumable iteration state with per-iteration manifests
  (``sources.checkpoint``),
- the reference's record semantics — id canonicalization/priority, title
  normalization, fuzzy entity resolution, author formatting — as Spark
  expressions (``functions``, ``entity``),
- training-data pipeline operators: dedup (exact/minhash/simhash/ngram/
  embedding), similarity search, text analysis, multimodal plumbing
  (``pipeline``).

Everything is DataFrame/SQL-first: Catalyst plans every step; Python only in
vectorized (Arrow-batched) pandas UDFs.
"""

__version__ = "0.1.0"

from citation_graph_spark.session import get_spark  # noqa: F401
