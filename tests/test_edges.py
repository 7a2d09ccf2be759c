"""Edge-layout unit tests — the dense vertex dictionary's two-pass
(range-partition → offsets → local row numbers) assignment."""

from citation_graph_spark.edges import encode_vertices_dict, vertex_dictionary


def test_vertex_dictionary_dense_and_distributed(spark):
    rows = [(f"u{i:04d}", f"u{(i * 7) % 500:04d}", 1) for i in range(1000)]
    edges = spark.createDataFrame(rows, "src string, dst string, pos int")
    d = vertex_dictionary(edges, num_partitions=8)
    got = {r["url"]: r["id"] for r in d.collect()}
    urls = sorted({r[0] for r in rows} | {r[1] for r in rows})
    assert got == {u: i for i, u in enumerate(urls)}
    # scale property: the assignment runs across partitions — the old
    # global-window version collapsed to a single output partition
    assert d.rdd.getNumPartitions() > 1
    # deterministic across runs
    again = {r["url"]: r["id"] for r in vertex_dictionary(edges, num_partitions=8).collect()}
    assert again == got


def test_vertex_dictionary_typed_ids_roundtrip(spark):
    edges = spark.createDataFrame(
        [(10, 20, 1), (20, 30, 1), (5, 10, 1)], "src long, dst long, pos int"
    )
    d = vertex_dictionary(edges, num_partitions=4)
    assert {(r["url"], r["id"]) for r in d.collect()} == {
        (5, 0), (10, 1), (20, 2), (30, 3),
    }
    enc = encode_vertices_dict(edges, d)
    assert {(r["src"], r["dst"]) for r in enc.collect()} == {(1, 2), (2, 3), (0, 1)}
