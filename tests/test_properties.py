"""Property-based tests (hypothesis) for the scalar/semantic layer.

Pure-python properties run at full example counts; Spark-backed properties
use few examples (each is a distributed job)."""

import datetime

from hypothesis import given, settings, strategies as st

from citation_graph_spark.functions.normalize import (
    ascii_fold_py,
    normalize_title_py,
    titles_resemble_py,
)

TEXT = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)), max_size=80
)
WORDS = st.lists(
    st.text(alphabet="abcdefgh", min_size=1, max_size=5), min_size=0, max_size=40
)


@given(TEXT)
@settings(max_examples=200)
def test_normalize_idempotent(t):
    once = normalize_title_py(t)
    assert normalize_title_py(once) == once


@given(TEXT)
@settings(max_examples=200)
def test_fold_output_is_ascii(t):
    folded = ascii_fold_py(t)
    assert all(ord(c) < 128 for c in folded)


@given(TEXT, TEXT)
@settings(max_examples=200)
def test_resemble_symmetric(a, b):
    assert titles_resemble_py(a, b) == titles_resemble_py(b, a)


@given(TEXT)
@settings(max_examples=200)
def test_resemble_reflexive_for_nonempty_normalized(t):
    # identical titles resemble iff the normalized form is non-empty
    # (threshold = ceil(0.05*len) must be > 0)
    n = normalize_title_py(t)
    assert titles_resemble_py(t, t) == (len(n) > 0)


@given(WORDS, WORDS)
@settings(max_examples=100)
def test_jaccard_oracle_bounds(a, b):
    # the python shingle-jaccard used as the engine oracle is a metric-ish
    # similarity: in [0,1], symmetric, 1 on identical non-empty sets
    def sh(toks, n=3):
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    sa, sb = sh(a), sh(b)
    if not sa or not sb:
        return
    j = len(sa & sb) / len(sa | sb)
    assert 0.0 <= j <= 1.0
    assert j == len(sb & sa) / len(sb | sa)
    if a == b:
        assert j == 1.0


# ----------------------- Spark-backed properties ----------------------------


@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50), st.floats(0, 100)),
        min_size=1,
        max_size=25,
    ),
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50), st.floats(0, 100)),
        min_size=0,
        max_size=25,
    ),
)
@settings(max_examples=5, deadline=None)
def test_asof_matches_bruteforce(spark, left_rows, right_rows):
    from citation_graph_spark.operators.asof import as_of_join

    base = datetime.datetime(2024, 1, 1)
    left = [
        (i, k, base + datetime.timedelta(minutes=m))
        for i, (k, m, _) in enumerate(left_rows)
    ]
    # dedupe right on (key, ts): contract of the operator
    rmap = {}
    for k, m, v in right_rows:
        rmap[(k, m)] = v
    right = [
        (k, base + datetime.timedelta(minutes=m), v) for (k, m), v in rmap.items()
    ]
    ldf = spark.createDataFrame(left, "event_id long, k long, ts timestamp")
    rdf = spark.createDataFrame(
        right or [(None, None, None)], "k long, ts timestamp, v double"
    )
    if not right:
        rdf = rdf.where("k is not null")
    got = {
        r["event_id"]: r["v_asof"]
        for r in as_of_join(ldf, rdf, ts="ts", by="k", value_cols=["v"]).collect()
    }
    for eid, k, ts in left:
        candidates = [(rts, v) for rk, rts, v in right if rk == k and rts <= ts]
        exp = max(candidates)[1] if candidates else None
        assert got[eid] == exp, (eid, k, ts)
