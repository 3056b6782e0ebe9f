"""Distributed graph operators (stages/graph.py) vs serial oracles:
connected components vs union-find, PageRank vs a numpy power iteration
with identical damping / iteration count / dangling handling."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from nightcrawlercmd_ray.stages.graph import (
    connected_components,
    dup_clusters,
    pagerank,
)
from nightcrawlercmd_ray.state.graphbsp import (
    connected_components_bsp,
    pagerank_bsp,
)


def _edge_ds(edges, repartition=None):
    t = pa.table({
        "src": pa.array([e[0] for e in edges], pa.int64()),
        "dst": pa.array([e[1] for e in edges], pa.int64()),
    })
    ds = ray.data.from_arrow(t)
    return ds.repartition(repartition) if repartition else ds


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        if a == b:
            find(a)
            continue
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps = {}
    for n in parent:
        comps.setdefault(find(n), set()).add(n)
    return {n: min(s) for s in comps.values() for n in s}


def _numpy_pagerank(edges, n_iter, damping=0.85):
    dedup = sorted({(a, b) for a, b in edges if a != b})
    nodes = sorted({x for e in dedup for x in e})
    ix = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    outdeg = np.zeros(n)
    for a, _ in dedup:
        outdeg[ix[a]] += 1
    M = np.zeros((n, n))
    for a, b in dedup:
        M[ix[b], ix[a]] = 1.0 / outdeg[ix[a]]
    r = np.full(n, 1.0 / n)
    d = damping
    for _ in range(n_iter):
        dangle = r[outdeg == 0].sum() / n
        r = (1 - d) / n + d * (M @ r + dangle)
    return {v: r[ix[v]] for v in nodes}


def test_cc_matches_union_find_random():
    rng = np.random.default_rng(11)
    edges = [(int(a), int(b)) for a, b in rng.integers(0, 200, (300, 2))
             if a != b]
    got = {r["node"]: r["component"]
           for r in connected_components(_edge_ds(edges, 5)).take_all()}
    assert got == _union_find(edges)


def test_cc_deep_chain_converges_fast():
    """A 64-deep path exercises pointer jumping: O(log d) rounds must reach
    the fixpoint well inside max_rounds=14 < 64."""
    edges = [(i, i + 1) for i in range(64)]
    got = {r["node"]: r["component"]
           for r in connected_components(
               _edge_ds(edges, 4), max_rounds=14).take_all()}
    assert got == {i: 0 for i in range(65)}


def test_cc_parallelism_invariant():
    rng = np.random.default_rng(23)
    edges = [(int(a), int(b)) for a, b in rng.integers(0, 80, (100, 2))
             if a != b]
    a = {r["node"]: r["component"]
         for r in connected_components(_edge_ds(edges, 1)).take_all()}
    b = {r["node"]: r["component"]
         for r in connected_components(_edge_ds(edges, 7)).take_all()}
    assert a == b == _union_find(edges)


def test_cc_self_loops_and_duplicate_edges():
    edges = [(1, 1), (2, 3), (2, 3), (3, 2), (5, 5)]
    got = {r["node"]: r["component"]
           for r in connected_components(_edge_ds(edges)).take_all()}
    # self-loops carry no connectivity: nodes with ONLY self-loops are
    # singletons and are not emitted (documented in _edge_stream)
    assert got == {2: 2, 3: 2}


def test_dup_clusters_transitive_chain():
    pairs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([5, 6, 9], pa.int64()),
        "dup_of": pa.array([3, 5, 8], pa.int64()),
    }))
    got = {r["doc_id"]: r["cluster_id"] for r in dup_clusters(pairs).take_all()}
    assert got == {3: 3, 5: 3, 6: 3, 8: 8, 9: 8}


def test_pagerank_matches_numpy_random():
    rng = np.random.default_rng(7)
    edges = sorted({(int(a), int(b)) for a, b in rng.integers(0, 50, (150, 2))
                    if a != b})
    got = {r["node"]: r["rank"]
           for r in pagerank(_edge_ds(edges, 6), n_iter=8).take_all()}
    want = _numpy_pagerank(edges, n_iter=8)
    assert set(got) == set(want)
    assert max(abs(got[v] - want[v]) for v in want) < 1e-12
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_dangling_and_parallel_edges():
    # node 4 dangles (no out-edges); (1,2) appears 3 times — must count once
    edges = [(1, 2), (1, 2), (1, 2), (2, 3), (3, 4), (1, 4)]
    got = {r["node"]: r["rank"]
           for r in pagerank(_edge_ds(edges, 3), n_iter=6).take_all()}
    want = _numpy_pagerank(edges, n_iter=6)
    assert max(abs(got[v] - want[v]) for v in want) < 1e-12
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_star_ranks_hub_highest():
    edges = [(i, 0) for i in range(1, 9)]
    got = {r["node"]: r["rank"]
           for r in pagerank(_edge_ds(edges), n_iter=5).take_all()}
    assert got[0] == max(got.values())


# --------------------------------------------------------------------------- #
# actor-BSP engine (state/graphbsp.py) ≡ Dataset composition ≡ serial oracle
# --------------------------------------------------------------------------- #
@pytest.mark.parametrize("num_shards", [1, 3, 8])
def test_cc_bsp_matches_union_find(num_shards):
    rng = np.random.default_rng(31)
    edges = [(int(a), int(b)) for a, b in rng.integers(0, 300, (450, 2))
             if a != b]
    got = {r["node"]: r["component"]
           for r in connected_components_bsp(
               _edge_ds(edges, 5), num_shards=num_shards).take_all()}
    assert got == _union_find(edges)


def test_cc_bsp_deep_chain_and_self_loops():
    edges = [(i, i + 1) for i in range(100)] + [(500, 500)]
    got = {r["node"]: r["component"]
           for r in connected_components_bsp(
               _edge_ds(edges, 4), num_shards=4, max_rounds=16).take_all()}
    assert got == {i: 0 for i in range(101)}


@pytest.mark.parametrize("num_shards", [1, 4])
def test_pagerank_bsp_matches_numpy(num_shards):
    rng = np.random.default_rng(41)
    edges = sorted({(int(a), int(b))
                    for a, b in rng.integers(0, 70, (220, 2)) if a != b})
    # include parallel edges in the input — must collapse
    noisy = edges + edges[:20]
    got = {r["node"]: r["rank"]
           for r in pagerank_bsp(_edge_ds(noisy, 5), num_shards=num_shards,
                                 n_iter=7).take_all()}
    want = _numpy_pagerank(edges, n_iter=7)
    assert set(got) == set(want)
    assert max(abs(got[v] - want[v]) for v in want) < 1e-12
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_bsp_equals_dataset_composition():
    rng = np.random.default_rng(53)
    edges = [(int(a), int(b)) for a, b in rng.integers(0, 120, (180, 2))
             if a != b]
    a = {r["node"]: r["component"]
         for r in connected_components(_edge_ds(edges, 3)).take_all()}
    b = {r["node"]: r["component"]
         for r in connected_components_bsp(
             _edge_ds(edges, 3), num_shards=5).take_all()}
    assert a == b
    pr_a = {r["node"]: r["rank"]
            for r in pagerank(_edge_ds(edges, 3), n_iter=6).take_all()}
    pr_b = {r["node"]: r["rank"]
            for r in pagerank_bsp(_edge_ds(edges, 3), num_shards=5,
                                  n_iter=6).take_all()}
    assert max(abs(pr_a[v] - pr_b[v]) for v in pr_a) < 1e-12


# --- triangle_counts ---------------------------------------------------------


def test_triangle_counts_matches_serial_oracle():
    import numpy as np
    import pyarrow as pa
    import ray

    from nightcrawlercmd_ray.stages.graph import triangle_counts

    rng = np.random.default_rng(23)
    n_nodes = 60
    # dense-ish random graph → plenty of triangles
    m = rng.random((n_nodes, n_nodes)) < 0.25
    adj = np.triu(m, 1)
    us, vs = np.nonzero(adj)
    edge_set = set(zip(us.tolist(), vs.tolist()))

    expect = {}
    for a, b in edge_set:
        for c in range(b + 1, n_nodes):
            if (b, c) in edge_set and (a, c) in edge_set:
                expect[a] = expect.get(a, 0) + 1

    t = pa.table({"u": pa.array(us, pa.int64()), "v": pa.array(vs, pa.int64())})
    for blocks, parts in ((1, 1), (5, 13)):
        ds = ray.data.from_arrow(t).repartition(blocks)
        out = triangle_counts(ds, num_partitions=parts).to_pandas()
        got = dict(zip(out["u"].astype(int), out["n_tri"].astype(int)))
        assert got == expect, (blocks, parts)
    assert sum(expect.values()) > 100  # fixture sanity


def test_triangle_counts_trianglefree_and_empty():
    import pyarrow as pa
    import ray

    from nightcrawlercmd_ray.stages.graph import triangle_counts

    # a path graph has no triangles
    path = pa.table({"u": pa.array([0, 1, 2], pa.int64()),
                     "v": pa.array([1, 2, 3], pa.int64())})
    out = triangle_counts(ray.data.from_arrow(path), num_partitions=2).to_pandas()
    assert len(out) == 0
    empty = pa.table({"u": pa.array([], pa.int64()), "v": pa.array([], pa.int64())})
    out2 = triangle_counts(ray.data.from_arrow(empty), num_partitions=1).to_pandas()
    assert len(out2) == 0


# --------------------------------------------------------------------------- #
# HITS (hubs/authorities) vs a numpy oracle with identical update order
# --------------------------------------------------------------------------- #
def _numpy_hits(edges, n_iter):
    dedup = sorted({(a, b) for a, b in edges if a != b})
    nodes = sorted({x for e in dedup for x in e})
    ix = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    A = np.zeros((n, n))
    for a, b in dedup:
        A[ix[a], ix[b]] = 1.0
    h = np.full(n, 1.0 / np.sqrt(n))
    a = h.copy()
    for _ in range(n_iter):
        a = A.T @ h
        na = np.linalg.norm(a)
        if na > 0:
            a = a / na
        h = A @ a
        nh = np.linalg.norm(h)
        if nh > 0:
            h = h / nh
    return ({v: h[ix[v]] for v in nodes}, {v: a[ix[v]] for v in nodes})


@pytest.mark.parametrize("nparts", [None, 7])
def test_hits_matches_numpy_random(nparts):
    from nightcrawlercmd_ray.stages.graph import hits

    rng = np.random.default_rng(23)
    edges = sorted({(int(a), int(b)) for a, b in rng.integers(0, 40, (120, 2))
                    if a != b})
    # parallel edges in the input must collapse
    noisy = edges + edges[:15]
    got = {r["node"]: (r["hub"], r["authority"])
           for r in hits(_edge_ds(noisy, nparts), n_iter=6).take_all()}
    want_h, want_a = _numpy_hits(edges, n_iter=6)
    assert set(got) == set(want_h)
    assert max(abs(got[v][0] - want_h[v]) for v in want_h) < 1e-12
    assert max(abs(got[v][1] - want_a[v]) for v in want_a) < 1e-12


def test_hits_bipartite_star_separates_roles():
    """k sources all pointing at one sink: the sink is the pure authority
    (authority 1, hub 0) and every source a pure hub (hub 1/sqrt(k))."""
    from nightcrawlercmd_ray.stages.graph import hits

    k = 6
    edges = [(i, 99) for i in range(1, k + 1)]
    got = {r["node"]: (r["hub"], r["authority"])
           for r in hits(_edge_ds(edges), n_iter=4).take_all()}
    assert got[99][1] == pytest.approx(1.0, abs=1e-12)
    assert got[99][0] == 0.0
    for i in range(1, k + 1):
        assert got[i][0] == pytest.approx(1.0 / np.sqrt(k), abs=1e-12)
        assert got[i][1] == 0.0


def test_hits_empty_graph():
    from nightcrawlercmd_ray.stages.graph import hits

    out = hits(_edge_ds([(5, 5)])).take_all()  # only self-loops → empty
    assert out == []


@pytest.mark.parametrize("num_shards", [1, 3, 8])
def test_hits_bsp_matches_numpy_and_dataset(num_shards):
    from nightcrawlercmd_ray.stages.graph import hits
    from nightcrawlercmd_ray.state.graphbsp import hits_bsp

    rng = np.random.default_rng(31)
    edges = sorted({(int(a), int(b)) for a, b in rng.integers(0, 45, (160, 2))
                    if a != b})
    noisy = edges + edges[:10]  # parallel edges must collapse
    got = {r["node"]: (r["hub"], r["authority"])
           for r in hits_bsp(_edge_ds(noisy, 4), num_shards=num_shards,
                             n_iter=6).take_all()}
    want_h, want_a = _numpy_hits(edges, n_iter=6)
    assert set(got) == set(want_h)
    assert max(abs(got[v][0] - want_h[v]) for v in want_h) < 1e-12
    assert max(abs(got[v][1] - want_a[v]) for v in want_a) < 1e-12
    ds_twin = {r["node"]: (r["hub"], r["authority"])
               for r in hits(_edge_ds(noisy), n_iter=6).take_all()}
    assert set(ds_twin) == set(got)
    assert max(abs(got[v][0] - ds_twin[v][0]) +
               abs(got[v][1] - ds_twin[v][1]) for v in got) < 1e-12


def test_hits_bsp_empty():
    from nightcrawlercmd_ray.state.graphbsp import hits_bsp

    assert hits_bsp(_edge_ds([(3, 3)])).take_all() == []


# --------------------------------------------------------------------------- #
# k-core peeling vs a serial oracle
# --------------------------------------------------------------------------- #
def _serial_kcore(edges, k):
    """Classic peeling: repeatedly drop nodes with degree < k; returns
    {node: degree within the core}."""
    adj = {}
    for a, b in {(min(e), max(e)) for e in edges if e[0] != e[1]}:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for n in [n for n, nb in adj.items() if len(nb) < k]:
            for m in adj.pop(n):
                adj[m].discard(n)
            changed = True
    return {n: len(nb) for n, nb in adj.items()}


@pytest.mark.parametrize("num_shards", [1, 3, 8])
def test_kcore_bsp_matches_serial(num_shards):
    from nightcrawlercmd_ray.state.graphbsp import kcore_bsp

    rng = np.random.default_rng(17)
    edges = sorted({(int(a), int(b)) for a, b in rng.integers(0, 60, (260, 2))
                    if a != b})
    noisy = edges + edges[:20] + [(b, a) for a, b in edges[:10]]
    for k in (2, 3, 4):
        got = {r["node"]: r["core_degree"]
               for r in kcore_bsp(_edge_ds(noisy, 4), k=k,
                                  num_shards=num_shards).take_all()}
        assert got == _serial_kcore(edges, k)


def test_kcore_clique_with_tail():
    from nightcrawlercmd_ray.state.graphbsp import kcore_bsp

    clique = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    tail = [(4, 10), (10, 11), (11, 12)]  # chain peels away at k=3
    got = {r["node"]: r["core_degree"]
           for r in kcore_bsp(_edge_ds(clique + tail), k=3).take_all()}
    assert got == {i: 4 for i in range(5)}
    # k above the max core → empty
    assert kcore_bsp(_edge_ds(clique), k=5).take_all() == []


# --------------------------------------------------------------------------- #
# multi-source BFS depths vs a serial oracle
# --------------------------------------------------------------------------- #
def _serial_bfs(edges, sources, *, undirected=False):
    from collections import deque

    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set())
        if undirected:
            adj[b].add(a)
    dist = {}
    dq = deque()
    for s in sources:
        if s in adj and s not in dist:
            dist[s] = 0
            dq.append(s)
    while dq:
        n = dq.popleft()
        for m in adj[n]:
            if m not in dist:
                dist[m] = dist[n] + 1
                dq.append(m)
    return dist


@pytest.mark.parametrize("num_shards", [1, 3, 8])
@pytest.mark.parametrize("undirected", [False, True])
def test_bfs_depths_matches_serial(num_shards, undirected):
    from nightcrawlercmd_ray.state.graphbsp import bfs_depths_bsp

    rng = np.random.default_rng(29)
    edges = sorted({(int(a), int(b)) for a, b in rng.integers(0, 70, (180, 2))
                    if a != b})
    sources = [0, 5, 999]  # 999 absent from the graph — ignored
    got = {r["node"]: r["depth"]
           for r in bfs_depths_bsp(_edge_ds(edges, 4), sources,
                                   num_shards=num_shards,
                                   undirected=undirected).take_all()}
    assert got == _serial_bfs(edges, sources, undirected=undirected)


def test_bfs_depths_no_valid_sources():
    from nightcrawlercmd_ray.state.graphbsp import bfs_depths_bsp

    assert bfs_depths_bsp(_edge_ds([(1, 2)]), [42]).take_all() == []


# --------------------------------------------------------------------------- #
# personalized pagerank vs a numpy oracle
# --------------------------------------------------------------------------- #
def _numpy_ppr(edges, seeds, n_iter, damping=0.85):
    dedup = sorted({(a, b) for a, b in edges if a != b})
    nodes = sorted({x for e in dedup for x in e})
    ix = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    outdeg = np.zeros(n)
    for a, _ in dedup:
        outdeg[ix[a]] += 1
    e = np.zeros(n)
    sset = [s for s in seeds if s in ix]
    for s in sset:
        e[ix[s]] = 1.0 / len(sset)
    r = e.copy()
    for _ in range(n_iter):
        nxt = np.zeros(n)
        for a, b in dedup:
            nxt[ix[b]] += damping * r[ix[a]] / outdeg[ix[a]]
        dangle = float(r[outdeg == 0].sum())
        nxt += ((1.0 - damping) + damping * dangle) * e
        r = nxt
    return {v: r[ix[v]] for v in nodes}


@pytest.mark.parametrize("num_shards", [1, 3, 8])
def test_ppr_bsp_matches_numpy(num_shards):
    from nightcrawlercmd_ray.state.graphbsp import ppr_bsp

    rng = np.random.default_rng(47)
    edges = sorted({(int(a), int(b)) for a, b in rng.integers(0, 55, (170, 2))
                    if a != b})
    seeds = [0, 3, 888]  # 888 not in the graph — ignored
    got = {r["node"]: r["rank"]
           for r in ppr_bsp(_edge_ds(edges + edges[:9], 4), seeds,
                            num_shards=num_shards, n_iter=7).take_all()}
    want = _numpy_ppr(edges, seeds, n_iter=7)
    assert set(got) == set(want)
    assert max(abs(got[v] - want[v]) for v in want) < 1e-12
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_ppr_concentrates_near_seed():
    """Two disjoint 3-cycles: all rank must stay in the seed's component."""
    from nightcrawlercmd_ray.state.graphbsp import ppr_bsp

    cyc1 = [(1, 2), (2, 3), (3, 1)]
    cyc2 = [(10, 11), (11, 12), (12, 10)]
    got = {r["node"]: r["rank"]
           for r in ppr_bsp(_edge_ds(cyc1 + cyc2), [1], n_iter=12).take_all()}
    assert sum(v for n, v in got.items() if n < 10) == pytest.approx(1.0)
    assert all(got[n] == 0.0 for n in (10, 11, 12))
    with pytest.raises(ValueError):
        ppr_bsp(_edge_ds(cyc1), [999]).take_all()


# --------------------------------------------------------------------------- #
# weighted pagerank vs a numpy oracle
# --------------------------------------------------------------------------- #
def _numpy_weighted_pagerank(wedges, n_iter, damping=0.85):
    """wedges: {(a, b): w} with parallel weights pre-summed."""
    nodes = sorted({x for e in wedges for x in e})
    ix = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    wsum = np.zeros(n)
    for (a, _), w in wedges.items():
        wsum[ix[a]] += w
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        nxt = np.zeros(n)
        for (a, b), w in wedges.items():
            nxt[ix[b]] += damping * r[ix[a]] * w / wsum[ix[a]]
        dangle = float(r[wsum == 0].sum())
        nxt += (1.0 - damping) / n + damping * dangle / n
        r = nxt
    return {v: r[ix[v]] for v in nodes}


@pytest.mark.parametrize("num_shards", [1, 4])
def test_weighted_pagerank_bsp_matches_numpy(num_shards):
    rng = np.random.default_rng(53)
    raw = [(int(a), int(b), float(w)) for (a, b), w in zip(
        rng.integers(0, 40, (140, 2)), rng.integers(1, 9, 140)) if a != b]
    wedges: dict = {}
    for a, b, w in raw:  # parallel edges must SUM weights
        wedges[(a, b)] = wedges.get((a, b), 0.0) + w
    t = pa.table({
        "src": pa.array([r[0] for r in raw], pa.int64()),
        "dst": pa.array([r[1] for r in raw], pa.int64()),
        "w": pa.array([r[2] for r in raw], pa.float64()),
    })
    ds = ray.data.from_arrow(t).repartition(5)
    got = {r["node"]: r["rank"]
           for r in pagerank_bsp(ds, num_shards=num_shards, n_iter=7,
                                 weight="w").take_all()}
    want = _numpy_weighted_pagerank(wedges, n_iter=7)
    assert set(got) == set(want)
    assert max(abs(got[v] - want[v]) for v in want) < 1e-12
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_weighted_pagerank_reduces_to_uniform_on_equal_weights():
    edges = [(1, 2), (2, 3), (3, 1), (1, 3)]
    t = pa.table({
        "src": pa.array([e[0] for e in edges], pa.int64()),
        "dst": pa.array([e[1] for e in edges], pa.int64()),
        "w": pa.array([5.0] * len(edges), pa.float64()),
    })
    got_w = {r["node"]: r["rank"]
             for r in pagerank_bsp(ray.data.from_arrow(t), n_iter=6,
                                   weight="w").take_all()}
    got_u = {r["node"]: r["rank"]
             for r in pagerank_bsp(_edge_ds(edges), n_iter=6).take_all()}
    assert got_w.keys() == got_u.keys()
    assert all(abs(got_w[k] - got_u[k]) < 1e-15 for k in got_u)


# --------------------------------------------------------------------------- #
# weighted SSSP (state/graphbsp.sssp_bsp)
# --------------------------------------------------------------------------- #
def _dijkstra(u, v, w, srcs):
    import heapq

    adj = {}
    nodes = set(u.tolist()) | set(v.tolist())
    for a, b, ww in zip(u, v, w):
        if a != b:
            adj.setdefault(a, []).append((b, int(ww)))
    dist0 = {s: 0 for s in srcs if s in nodes}
    pq = [(0, s) for s in dist0]
    heapq.heapify(pq)
    best = dict(dist0)
    seen = {}
    while pq:
        d, x = heapq.heappop(pq)
        if x in seen:
            continue
        seen[x] = d
        for b, ww in adj.get(x, []):
            nd = d + ww
            if b not in seen and nd < best.get(b, 1 << 60):
                best[b] = nd
                heapq.heappush(pq, (nd, b))
    return seen


@pytest.mark.parametrize("num_shards", [2, 7])
def test_sssp_matches_dijkstra(num_shards):
    from nightcrawlercmd_ray.state.graphbsp import sssp_bsp

    rng = np.random.RandomState(4)
    n, m = 300, 1500
    u = rng.randint(0, n, m).astype(np.int64)
    v = rng.randint(0, n, m).astype(np.int64)
    w = rng.randint(1, 20, m).astype(np.int64)
    edges = ray.data.from_arrow(pa.table({
        "src": pa.array(u), "dst": pa.array(v), "w": pa.array(w),
    })).repartition(4)
    got = {r["node"]: r["dist"]
           for r in sssp_bsp(edges, [0, 5], num_shards=num_shards,
                             weight="w").take_all()}
    assert got == _dijkstra(u, v, w, [0, 5])


def test_sssp_parallel_edges_take_min_and_guards():
    from nightcrawlercmd_ray.state.graphbsp import sssp_bsp

    # parallel 1→2 edges with different costs: the cheap one must win
    edges = ray.data.from_arrow(pa.table({
        "src": pa.array([1, 1, 2], pa.int64()),
        "dst": pa.array([2, 2, 3], pa.int64()),
        "w": pa.array([9, 2, 1], pa.int64()),
    }))
    got = {r["node"]: r["dist"]
           for r in sssp_bsp(edges, [1], weight="w").take_all()}
    assert got == {1: 0, 2: 2, 3: 3}
    bad = ray.data.from_arrow(pa.table({
        "src": pa.array([1], pa.int64()), "dst": pa.array([2], pa.int64()),
        "w": pa.array([-1], pa.int64()),
    }))
    with pytest.raises(Exception, match="negative"):
        sssp_bsp(bad, [1], weight="w", num_shards=1)
    # unreachable nodes omitted; unknown sources ignored
    got2 = {r["node"]: r["dist"]
            for r in sssp_bsp(edges, [2, 999], weight="w").take_all()}
    assert got2 == {2: 0, 3: 1}


def test_sssp_rejects_fractional_weights():
    from nightcrawlercmd_ray.state.graphbsp import sssp_bsp

    edges = ray.data.from_arrow(pa.table({
        "src": pa.array([1], pa.int64()), "dst": pa.array([2], pa.int64()),
        "w": pa.array([0.4], pa.float64()),
    }))
    with pytest.raises(Exception, match="integer"):
        sssp_bsp(edges, [1], weight="w", num_shards=1)
