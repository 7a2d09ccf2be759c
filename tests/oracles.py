"""Single-process pure-python oracles for the iterative graph algorithms.

Mirrors of the engine's semantics at list-of-tuples scale — same update
rules, same tie-breaks — used by the pytest suite to verify the distributed
implementations exactly (allclose 1e-6 for PageRank; exact for CC/LPA/
triangles/BFS). The BFS oracle mirrors the reference's frontier loop
(``/root/reference/src/citation_graph/traverser.py:92-131``) with the
deterministic min-parent tie-break documented in SURVEY.md §7.
"""

from __future__ import annotations

from collections import Counter, defaultdict


def _vertices(edges):
    vs = set()
    for s, d in edges:
        vs.add(s)
        vs.add(d)
    return vs


def pagerank_oracle(edges, alpha=0.85, tol=1e-6, max_iter=100):
    """Power iteration, damping, uniform dangling redistribution; stops when
    L1 delta < tol. Returns (ranks dict, iterations)."""
    verts = _vertices(edges)
    n = len(verts)
    if n == 0:
        return {}, 0
    outdeg = Counter(s for s, _ in edges)
    ranks = {v: 1.0 / n for v in verts}
    it = 0
    for it in range(1, max_iter + 1):
        dm = sum(r for v, r in ranks.items() if outdeg[v] == 0)
        contrib = defaultdict(float)
        for s, d in edges:
            contrib[d] += ranks[s] / outdeg[s]
        base = (1.0 - alpha) / n + alpha * dm / n
        new_ranks = {v: base + alpha * contrib[v] for v in verts}
        delta = sum(abs(new_ranks[v] - ranks[v]) for v in verts)
        ranks = new_ranks
        if delta < tol:
            break
    return ranks, it


def pagerank_dense_oracle(edges, alpha=0.85, tol=1e-10, max_iter=200):
    """SECOND independent PageRank implementation: dense numpy matrix power
    iteration (r' = base + a·(Pᵀr + dm/n) with P the row-normalized
    adjacency). Shares no code with ``pagerank_oracle``'s per-edge dict
    loop — the cross-check substitute for networkx (not installed in this
    sandbox), so the cross-implementation parity test never skips.
    Returns (ranks dict, iterations)."""
    import numpy as np

    verts = sorted(_vertices(edges))
    n = len(verts)
    if n == 0:
        return {}, 0
    idx = {v: i for i, v in enumerate(verts)}
    outdeg = np.zeros(n)
    for s, _ in edges:
        outdeg[idx[s]] += 1
    P = np.zeros((n, n))
    for s, d in edges:
        P[idx[d], idx[s]] += 1.0 / outdeg[idx[s]]
    dangling = outdeg == 0
    r = np.full(n, 1.0 / n)
    it = 0
    for it in range(1, max_iter + 1):
        dm = r[dangling].sum()
        base = (1.0 - alpha) / n + alpha * dm / n
        new_r = base + alpha * (P @ r)
        delta = np.abs(new_r - r).sum()
        r = new_r
        if delta < tol:
            break
    return {v: float(r[idx[v]]) for v in verts}, it


def connected_components_oracle(edges):
    """Undirected CC; label = min vertex id in component."""
    adj = defaultdict(set)
    for s, d in edges:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    verts = _vertices(edges)
    label = {}
    for v in verts:
        if v in label:
            continue
        comp = [v]
        seen = {v}
        stack = [v]
        while stack:
            u = stack.pop()
            for w in adj[u]:
                if w not in seen:
                    seen.add(w)
                    comp.append(w)
                    stack.append(w)
        m = min(comp)
        for u in comp:
            label[u] = m
    return label


def label_propagation_oracle(edges, max_iter=20):
    """Synchronous LPA over the undirected graph. Initial label = own id.
    Each round every vertex takes the most frequent label among its
    neighbours (ties → smallest label); isolated semantics: keep own label.
    Deterministic; stops when no label changes or max_iter."""
    adj = defaultdict(set)
    for s, d in edges:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    verts = _vertices(edges)
    labels = {v: v for v in verts}
    for it in range(1, max_iter + 1):
        new_labels = {}
        for v in verts:
            if not adj[v]:
                new_labels[v] = labels[v]
                continue
            counts = Counter(labels[u] for u in adj[v])
            best = max(counts.items(), key=lambda kv: (kv[1], _neg(kv[0])))
            new_labels[v] = best[0]
        if new_labels == labels:
            return labels, it
        labels = new_labels
    return labels, max_iter


class _neg:
    """Reverse-order wrapper so max() picks the smallest label on count ties
    (works for any orderable label type)."""

    def __init__(self, value):
        self.value = value

    def __lt__(self, other):
        return self.value > other.value


def triangle_count_oracle(edges):
    """Number of triangles in the undirected simple graph."""
    adj = defaultdict(set)
    for s, d in edges:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    count = 0
    for u in adj:
        for v in adj[u]:
            if v <= u:
                continue
            count += sum(1 for w in adj[u] & adj[v] if w > v)
    return count


def bfs_oracle(edges, root, max_depth, max_per_src=None, exclude=frozenset()):
    """Reference frontier-expansion semantics (traverser.py:92-131):
    level-by-level BFS from root over directed edges (src -> dst in
    extraction order ``pos``), per-src fan-out cap applied in pos order,
    first-wins visited set; deterministic tie-break = (depth, min parent).
    Returns {id: (depth, parent)}."""
    adj = defaultdict(list)
    for s, d, p in edges:
        adj[s].append((p, d))
    for s in adj:
        adj[s].sort()
        if max_per_src is not None:
            adj[s] = adj[s][:max_per_src]
    visited = {root: (0, None)}
    frontier = [root]
    for depth in range(max_depth):
        nxt = {}
        for u in sorted(frontier):
            for _, d in adj.get(u, []):
                if d in visited or d in exclude:
                    continue
                if d not in nxt or u < nxt[d]:
                    nxt[d] = u
        for d, parent in nxt.items():
            visited[d] = (depth + 1, parent)
        frontier = list(nxt)
        if not frontier:
            break
    return visited


def ppr_oracle(edges, sources, alpha=0.85, tol=1e-6, max_iter=100):
    """Personalized PageRank mirror of operators/pagerank.py
    ``personalized_pagerank``: restart vector uniform over
    sources ∩ vertices, r0 = restart vector, dangling mass restarts at the
    sources, L1-delta stopping. Returns (ranks dict, iterations)."""
    verts = _vertices(edges)
    srcs = sorted(set(sources) & verts)
    ns = len(srcs)
    if ns == 0:
        raise ValueError("no source id matches a graph vertex")
    outdeg = Counter(s for s, _ in edges)
    p = {v: (1.0 / ns if v in set(srcs) else 0.0) for v in verts}
    ranks = dict(p)
    it = 0
    for it in range(1, max_iter + 1):
        dm = sum(r for v, r in ranks.items() if outdeg[v] == 0)
        contrib = defaultdict(float)
        for s, d in edges:
            contrib[d] += ranks[s] / outdeg[s]
        restart = (1.0 - alpha) + alpha * dm
        new_ranks = {v: restart * p[v] + alpha * contrib[v] for v in verts}
        delta = sum(abs(new_ranks[v] - ranks[v]) for v in verts)
        ranks = new_ranks
        if delta < tol:
            break
    return ranks, it


def hits_oracle(edges, tol=1e-8, max_iter=50):
    """HITS mirror of operators/hits.py: a' = E^T h (unnormalized), h' =
    E a' (from the unnormalized a'), then L1-normalize both; h0 = 1/n.
    Returns ({id: (auth, hub)}, iterations)."""
    verts = _vertices(edges)
    n = len(verts)
    if n == 0:
        return {}, 0
    hub = {v: 1.0 / n for v in verts}
    auth = {v: 0.0 for v in verts}
    it = 0
    for it in range(1, max_iter + 1):
        a_raw = defaultdict(float)
        for s, d in edges:
            a_raw[d] += hub[s]
        h_raw = defaultdict(float)
        for s, d in edges:
            h_raw[s] += a_raw[d]
        asum = sum(a_raw.values()) or 1.0
        hsum = sum(h_raw.values()) or 1.0
        new_auth = {v: a_raw[v] / asum for v in verts}
        new_hub = {v: h_raw[v] / hsum for v in verts}
        delta = sum(
            abs(new_auth[v] - auth[v]) + abs(new_hub[v] - hub[v]) for v in verts
        )
        auth, hub = new_auth, new_hub
        if delta < tol:
            break
    return {v: (auth[v], hub[v]) for v in verts}, it


def kcore_oracle(edges, k):
    """k-core peel mirror of operators/kcore.py over the symmetrized
    deduped self-loop-free view. Returns {id: within-core degree}."""
    nbrs = defaultdict(set)
    for s, d in edges:
        if s != d:
            nbrs[s].add(d)
            nbrs[d].add(s)
    alive = set(nbrs)
    while True:
        drop = {v for v in alive if len(nbrs[v] & alive) < k}
        if not drop:
            break
        alive -= drop
    return {v: len(nbrs[v] & alive) for v in alive}


def linkpred_oracle(edges, min_common=1, max_center_degree=None):
    """Link-prediction mirror of operators/linkpred.py over the
    symmetrized deduped self-loop-free view. Returns
    {(a, b): (common, jaccard, adamic_adar)} for non-adjacent pairs."""
    import math

    nbrs = defaultdict(set)
    for s, d in edges:
        if s != d:
            nbrs[s].add(d)
            nbrs[d].add(s)
    deg = {v: len(ns) for v, ns in nbrs.items()}
    acc = {}
    for z, ns in nbrs.items():
        if max_center_degree is not None and deg[z] > max_center_degree:
            continue
        ns_sorted = sorted(ns)
        for i, a in enumerate(ns_sorted):
            for b in ns_sorted[i + 1:]:
                c, aa = acc.get((a, b), (0, 0.0))
                acc[(a, b)] = (c + 1, aa + 1.0 / math.log(deg[z]))
    out = {}
    for (a, b), (c, aa) in acc.items():
        if b in nbrs[a] or c < min_common:
            continue
        out[(a, b)] = (c, c / (deg[a] + deg[b] - c), aa)
    return out


def weighted_pagerank_oracle(edges, alpha=0.85, tol=1e-6, max_iter=100):
    """Weighted PageRank mirror (operators/pagerank.py ``weight_col``):
    ``edges`` is (src, dst, weight) triples; contributions are
    r(u)·w/Σ_w(u), dangling = src with no out-edges. Returns
    (ranks dict, iterations)."""
    verts = set()
    totw = defaultdict(float)
    for s, d, w in edges:
        verts.add(s)
        verts.add(d)
        totw[s] += w
    n = len(verts)
    if n == 0:
        return {}, 0
    ranks = {v: 1.0 / n for v in verts}
    it = 0
    for it in range(1, max_iter + 1):
        dm = sum(r for v, r in ranks.items() if totw[v] == 0)
        contrib = defaultdict(float)
        for s, d, w in edges:
            contrib[d] += ranks[s] * w / totw[s]
        base = (1.0 - alpha) / n + alpha * dm / n
        new_ranks = {v: base + alpha * contrib[v] for v in verts}
        delta = sum(abs(new_ranks[v] - ranks[v]) for v in verts)
        ranks = new_ranks
        if delta < tol:
            break
    return ranks, it


def lcc_oracle(edges):
    """Local clustering coefficient mirror (operators/triangles.py
    ``local_clustering_coefficient``). Returns
    {id: (triangles, degree, lcc)} over ALL vertices."""
    nbrs = defaultdict(set)
    verts = set()
    for s, d in edges:
        verts.add(s)
        verts.add(d)
        if s != d:
            nbrs[s].add(d)
            nbrs[d].add(s)
    out = {}
    for v in verts:
        ns = nbrs[v]
        d = len(ns)
        t = sum(1 for u in ns for w in ns if u < w and w in nbrs[u]) if d >= 2 else 0
        lcc = 2.0 * t / (d * (d - 1)) if d >= 2 else 0.0
        out[v] = (t, d, lcc)
    return out


def scc_oracle(edges):
    """Directed SCC via iterative Tarjan; label = min vertex id in the SCC.

    Iterative (explicit stack) so 10^4-vertex fixture graphs don't hit the
    recursion limit."""
    adj = defaultdict(list)
    for s, d in edges:
        if s != d:
            adj[s].append(d)
    verts = _vertices(edges)

    index = {}
    low = {}
    on_stack = set()
    stack = []
    label = {}
    counter = [0]

    for root in verts:
        if root in index:
            continue
        # work stack: (vertex, iterator position into adj[v])
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack.add(v)
            recurse = False
            neighbors = adj[v]
            for i in range(pi, len(neighbors)):
                w = neighbors[i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                if w in on_stack:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                m = min(comp)
                for w in comp:
                    label[w] = m
            work.pop()
            if work:
                parent, _ = work[-1]
                low[parent] = min(low[parent], low[v])
    return label
