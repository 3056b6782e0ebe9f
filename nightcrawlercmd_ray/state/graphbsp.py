"""Actor-sharded BSP graph engine (Pregel-lite) — the SCALE path for the
iterative graph operators in ``stages/graph.py``.

Why actors (SURVEY §2.6 custom-operator recipe (b)): an iterative graph
algorithm re-reads the SAME edge set every superstep. The Dataset-composed
versions re-shuffle the edges through a keyed exchange once per round —
correct, but at 100 TB the dominant cost becomes re-sorting static data.
Here the edge set is partitioned ONCE into P shard actors (owner(x) =
``hash(x) % P``, the same multiplicative hash as ``stages/joins.py``), and
each superstep ships only compact (node, value) message arrays between
shards — an object-store all-to-all in which the driver routes REFS only
(``num_returns=P`` per propagate call) and sees nothing but per-round
scalar counters. This mirrors the crawl frontier's shard design
(``state/frontier.py``): stateful shards + task-side pushes, no driver
materialization.

Partitioning assumptions (documented per the §2.6 recipe):
- a node's out-edges fit in its owner shard's memory (hash-spread; salt a
  pathological super-node upstream);
- message volume per round is O(nodes), far below the edge volume that a
  Dataset re-shuffle would move.

Algorithms are identical to ``stages/graph.py`` (min-label propagation with
pointer jumping; damped PageRank with dangling-mass redistribution) and are
conformance-pinned against those versions AND the serial oracles in
``tests/test_graph.py``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _owner(x: np.ndarray, P: int) -> np.ndarray:
    return ((x.astype(np.uint64) * _GOLD) >> np.uint64(32)) % np.uint64(P)


def _group_min(keys: np.ndarray, vals: np.ndarray):
    """(unique keys, per-key min(vals)) — vectorized sort + reduceat."""
    if keys.size == 0:
        return keys, vals
    order = np.argsort(keys, kind="stable")
    k, v = keys[order], vals[order]
    starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
    return k[starts], np.minimum.reduceat(v, starts)


def _group_sum(keys: np.ndarray, vals: np.ndarray):
    if keys.size == 0:
        return keys, vals
    order = np.argsort(keys, kind="stable")
    k, v = keys[order], vals[order]
    starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
    return k[starts], np.add.reduceat(v, starts)


class GraphShard:
    """One partition of the graph: edges with owner(u) == shard_id, plus
    label/rank state for owned nodes (owner(n) == shard_id)."""

    def __init__(self, shard_id: int, num_shards: int):
        self.id = shard_id
        self.P = num_shards
        self._eu: list[np.ndarray] = []
        self._ev: list[np.ndarray] = []
        self._ew: list[np.ndarray] = []  # optional per-edge weights
        self._ru: list[np.ndarray] = []  # reverse edges: this shard owns v
        self._rv: list[np.ndarray] = []
        self.ew = self.wsum = None
        self._nodes: list[np.ndarray] = []
        self.eu = self.ev = self.nodes = None
        self.ru = self.rv = None
        self.lab = self.rank = self.outdeg = None
        self.hub = self.auth = None
        self.u_idx = None  # per-edge index of u into self.nodes
        self.rv_idx = None  # per-reverse-edge index of v into self.nodes

    # ---- build ---------------------------------------------------------- #
    def add_edges(self, t: pa.Table) -> int:
        self._eu.append(t.column("u").to_numpy(zero_copy_only=False))
        self._ev.append(t.column("v").to_numpy(zero_copy_only=False))
        if "w" in t.column_names:
            self._ew.append(t.column("w").to_numpy(zero_copy_only=False)
                            .astype(np.float64))
        return t.num_rows

    def add_rev_edges(self, t: pa.Table) -> int:
        self._ru.append(t.column("u").to_numpy(zero_copy_only=False))
        self._rv.append(t.column("v").to_numpy(zero_copy_only=False))
        return t.num_rows

    def add_nodes(self, t: pa.Table) -> int:
        self._nodes.append(t.column("node").to_numpy(zero_copy_only=False))
        return t.num_rows

    def seal(self, *, dedup_edges: bool) -> dict:
        eu = (np.concatenate(self._eu) if self._eu
              else np.array([], np.int64))
        ev = (np.concatenate(self._ev) if self._ev
              else np.array([], np.int64))
        ew = np.concatenate(self._ew) if self._ew else None
        self._eu = self._ev = self._ew = []
        order = np.lexsort((ev, eu))
        eu, ev = eu[order], ev[order]
        if ew is not None:
            ew = ew[order]
        if dedup_edges and eu.size:
            keep = np.r_[True, (eu[1:] != eu[:-1]) | (ev[1:] != ev[:-1])]
            if ew is not None:  # parallel weighted edges SUM their weights
                ew = np.add.reduceat(ew, np.flatnonzero(keep))
            eu, ev = eu[keep], ev[keep]
        self.eu, self.ev = eu, ev
        self.ew = ew
        ru = (np.concatenate(self._ru) if self._ru
              else np.array([], np.int64))
        rv = (np.concatenate(self._rv) if self._rv
              else np.array([], np.int64))
        self._ru = self._rv = []
        rorder = np.lexsort((ru, rv))
        ru, rv = ru[rorder], rv[rorder]
        if dedup_edges and ru.size:
            keep = np.r_[True, (ru[1:] != ru[:-1]) | (rv[1:] != rv[:-1])]
            ru, rv = ru[keep], rv[keep]
        self.ru, self.rv = ru, rv
        ann = (np.concatenate(self._nodes) if self._nodes
               else np.array([], np.int64))
        self._nodes = []
        self.nodes = np.unique(ann)
        self.u_idx = np.searchsorted(self.nodes, self.eu)
        self.rv_idx = np.searchsorted(self.nodes, self.rv)
        # out-degree of owned nodes (after dedup → distinct targets)
        self.outdeg = np.zeros(self.nodes.size, np.int64)
        if self.eu.size:
            np.add.at(self.outdeg, self.u_idx, 1)
        if self.ew is not None:
            self.wsum = np.zeros(self.nodes.size)
            np.add.at(self.wsum, self.u_idx, self.ew)
        return {"edges": int(self.eu.size), "nodes": int(self.nodes.size)}

    # ---- connected components ------------------------------------------ #
    def cc_init(self) -> None:
        self.lab = self.nodes.copy()

    def cc_propagate(self):
        """Per-target-owner min proposals from local edges; returns P
        tables (routed by the driver as refs, fetched shard-to-shard)."""
        lab_u = self.lab[self.u_idx] if self.eu.size else self.eu
        v, m = _group_min(self.ev, lab_u)
        part = _owner(v, self.P)
        out = []
        for j in range(self.P):
            sel = part == j
            out.append(pa.table({"node": pa.array(v[sel], pa.int64()),
                                 "cand": pa.array(m[sel], pa.int64())}))
        return out if self.P > 1 else out[0]

    def cc_merge(self, *proposals: pa.Table) -> int:
        ks, vs = [], []
        for t in proposals:
            if t.num_rows:
                ks.append(t.column("node").to_numpy(zero_copy_only=False))
                vs.append(t.column("cand").to_numpy(zero_copy_only=False))
        if not ks:
            return 0
        k, v = _group_min(np.concatenate(ks), np.concatenate(vs))
        idx = np.searchsorted(self.nodes, k)
        new = np.minimum(self.lab[idx], v)
        changed = int((new < self.lab[idx]).sum())
        self.lab[idx] = new
        return changed

    def label_queries(self):
        """Pointer jump, step 1: distinct labels we hold, routed to their
        owner shards for resolution."""
        ls = np.unique(self.lab) if self.lab is not None else np.array([], np.int64)
        part = _owner(ls, self.P)
        out = [pa.array(ls[part == j], pa.int64()) for j in range(self.P)]
        return out if self.P > 1 else out[0]

    def lookup(self, ids: pa.Array) -> pa.Table:
        a = np.asarray(ids)
        idx = np.searchsorted(self.nodes, a)
        return pa.table({"node": pa.array(a, pa.int64()),
                         "lab": pa.array(self.lab[idx], pa.int64())})

    def apply_jump(self, *answers: pa.Table) -> None:
        ks, vs = [], []
        for t in answers:
            if t.num_rows:
                ks.append(t.column("node").to_numpy(zero_copy_only=False))
                vs.append(t.column("lab").to_numpy(zero_copy_only=False))
        if not ks:
            return
        # answers are disjoint across owner shards (each label resolved by
        # exactly one owner), so a concat+sort gives a unique-keyed map
        keys = np.concatenate(ks)
        vals = np.concatenate(vs)
        order = np.argsort(keys, kind="stable")
        keys, vals = keys[order], vals[order]
        idx = np.searchsorted(keys, self.lab)
        # every label is a node id we queried, so lookup always resolves
        self.lab = np.minimum(self.lab, vals[idx])

    def cc_result(self) -> pa.Table:
        return pa.table({"node": pa.array(self.nodes, pa.int64()),
                         "component": pa.array(self.lab, pa.int64())})

    # ---- pagerank -------------------------------------------------------- #
    def pr_init(self, n_nodes: int) -> None:
        self.n_total = n_nodes
        self.rank = np.full(self.nodes.size, 1.0 / n_nodes)

    def pr_propagate(self):
        """Per-target-owner partial mass sums; last element of the return
        is the scalar mass emitted (driver derives dangling mass). With
        edge weights, mass splits ∝ w(u,v)/Σw(u,·) instead of 1/outdeg."""
        if self.eu.size:
            if self.ew is not None:
                contrib = (self.rank[self.u_idx] * self.ew
                           / self.wsum[self.u_idx])
            else:
                contrib = self.rank[self.u_idx] / self.outdeg[self.u_idx]
            v, m = _group_sum(self.ev, contrib)
            emitted = float(contrib.sum())
        else:
            v = np.array([], np.int64)
            m = np.array([], np.float64)
            emitted = 0.0
        part = _owner(v, self.P)
        out = [pa.table({"node": pa.array(v[part == j], pa.int64()),
                         "mass": pa.array(m[part == j], pa.float64())})
               for j in range(self.P)]
        out.append(emitted)
        return out if len(out) > 1 else out[0]

    def pr_update(self, base: float, damping: float, dangle: float,
                  *masses: pa.Table) -> None:
        total = np.zeros(self.nodes.size)
        ks, vs = [], []
        for t in masses:
            if t.num_rows:
                ks.append(t.column("node").to_numpy(zero_copy_only=False))
                vs.append(t.column("mass").to_numpy(zero_copy_only=False))
        if ks:
            k, v = _group_sum(np.concatenate(ks), np.concatenate(vs))
            total[np.searchsorted(self.nodes, k)] = v
        self.rank = base + damping * dangle + damping * total

    def pr_result(self) -> pa.Table:
        return pa.table({"node": pa.array(self.nodes, pa.int64()),
                         "rank": pa.array(self.rank, pa.float64())})

    # ---- personalized pagerank -------------------------------------------- #
    def ppr_init(self, seeds) -> int:
        """Teleport-set variant: rank starts (and teleports) uniformly over
        the SEED set instead of all nodes. Returns owned-seed count."""
        s = np.unique(np.asarray(list(seeds), np.int64))
        mine = s[_owner(s, self.P) == np.uint64(self.id)]
        idx = np.searchsorted(self.nodes, mine)
        ok = (idx < self.nodes.size)
        ok[ok] = self.nodes[idx[ok]] == mine[ok]
        self._seed_idx = idx[ok]
        self.rank = np.zeros(self.nodes.size)
        return int(ok.sum())

    def ppr_set_nseeds(self, n_seeds: int) -> None:
        self._n_seeds = n_seeds
        self.rank[:] = 0.0
        if self._seed_idx.size:
            self.rank[self._seed_idx] = 1.0 / n_seeds

    def ppr_update(self, damping: float, dangle: float,
                   *masses: pa.Table) -> None:
        """next = d·(in-mass) + (1-d + d·dangle)·teleport(seed)."""
        total = np.zeros(self.nodes.size)
        ks, vs = [], []
        for t in masses:
            if t.num_rows:
                ks.append(t.column("node").to_numpy(zero_copy_only=False))
                vs.append(t.column("mass").to_numpy(zero_copy_only=False))
        if ks:
            k, v = _group_sum(np.concatenate(ks), np.concatenate(vs))
            total[np.searchsorted(self.nodes, k)] = v
        self.rank = damping * total
        if self._seed_idx.size:
            self.rank[self._seed_idx] += (
                (1.0 - damping) + damping * dangle) / self._n_seeds

    # ---- multi-source BFS depths ------------------------------------------ #
    _INF = np.int64(1) << np.int64(62)

    def bfs_init(self, sources) -> int:
        """Seed owned source nodes at depth 0; returns how many of the
        given sources this shard owns (sources absent from the graph are
        ignored)."""
        self.lab = np.full(self.nodes.size, self._INF)
        s = np.unique(np.asarray(list(sources), np.int64))
        mine = s[_owner(s, self.P) == np.uint64(self.id)]
        idx = np.searchsorted(self.nodes, mine)
        ok = (idx < self.nodes.size)
        ok[ok] = self.nodes[idx[ok]] == mine[ok]
        self._fresh = np.zeros(self.nodes.size, dtype=bool)
        self._fresh[idx[ok]] = True
        self.lab[idx[ok]] = 0
        return int(ok.sum())

    def bfs_propagate(self):
        """Frontier-only: edges whose source's depth changed last round
        propose depth+1 to the target's owner."""
        if self.eu.size:
            sel = self._fresh[self.u_idx]
            v = self.ev[sel]
            d = self.lab[self.u_idx[sel]] + 1
            v, m = _group_min(v, d)
        else:
            v = np.array([], np.int64)
            m = np.array([], np.int64)
        part = _owner(v, self.P)
        out = [pa.table({"node": pa.array(v[part == j], pa.int64()),
                         "cand": pa.array(m[part == j], pa.int64())})
               for j in range(self.P)]
        return out if self.P > 1 else out[0]

    def bfs_merge(self, *proposals: pa.Table) -> int:
        self._fresh = np.zeros(self.nodes.size, dtype=bool)
        ks, vs = [], []
        for t in proposals:
            if t.num_rows:
                ks.append(t.column("node").to_numpy(zero_copy_only=False))
                vs.append(t.column("cand").to_numpy(zero_copy_only=False))
        if not ks:
            return 0
        k, v = _group_min(np.concatenate(ks), np.concatenate(vs))
        idx = np.searchsorted(self.nodes, k)
        better = v < self.lab[idx]
        self.lab[idx[better]] = v[better]
        self._fresh[idx[better]] = True
        return int(better.sum())

    def bfs_result(self) -> pa.Table:
        sel = self.lab < self._INF
        return pa.table({
            "node": pa.array(self.nodes[sel], pa.int64()),
            "depth": pa.array(self.lab[sel], pa.int64()),
        })

    # ---- weighted SSSP (Bellman-Ford-style frontier relaxation) --------- #
    def sssp_init(self, sources) -> int:
        """Seed like bfs_init, and validate the weighted build: integer
        non-negative weights (the exact-arithmetic contract — int64 path
        sums are exactly associative, so distances are bit-identical at
        any shard count)."""
        if self.ew is None:
            if self.eu.size:  # edges without weights: a wiring error
                raise ValueError("sssp: shards were built without weights")
            self._ewi = np.array([], np.int64)
            return self.bfs_init(sources)
        if self.ew.size and self.ew.min() < 0:
            raise ValueError("sssp: negative edge weights are not supported")
        ewi = np.rint(self.ew)
        if self.ew.size and not np.array_equal(ewi, self.ew):
            # silent rounding would return wrong distances (w=0.4 → 0
            # everywhere); the documented contract is integer weights
            raise ValueError("sssp: edge weights must be integers "
                             "(quantize fractional costs upstream)")
        self._ewi = ewi.astype(np.int64)
        return self.bfs_init(sources)

    def sssp_propagate(self):
        """Frontier-only relaxation: edges whose source's distance improved
        last round propose dist+w to the target's owner."""
        if self.eu.size:
            sel = self._fresh[self.u_idx]
            v = self.ev[sel]
            d = self.lab[self.u_idx[sel]] + self._ewi[sel]
            v, m = _group_min(v, d)
        else:
            v = np.array([], np.int64)
            m = np.array([], np.int64)
        part = _owner(v, self.P)
        out = [pa.table({"node": pa.array(v[part == j], pa.int64()),
                         "cand": pa.array(m[part == j], pa.int64())})
               for j in range(self.P)]
        return out if self.P > 1 else out[0]

    def sssp_result(self) -> pa.Table:
        sel = self.lab < self._INF
        return pa.table({
            "node": pa.array(self.nodes[sel], pa.int64()),
            "dist": pa.array(self.lab[sel], pa.int64()),
        })

    # ---- k-core peeling ---------------------------------------------------- #
    def kcore_init(self, k: int) -> None:
        self._k = k
        self.alive = np.ones(self.nodes.size, dtype=bool)
        self.deg = self.outdeg.copy()  # undirected build → outdeg == degree

    def kcore_peel(self):
        """Kill owned alive nodes with deg < k; per incident edge of a node
        killed THIS call, emit a degree decrement to the neighbor's owner.
        Returns P routed tables (+ the local kill count as the last item)."""
        newly = self.alive & (self.deg < self._k)
        self.alive &= ~newly
        if self.eu.size:
            sel = newly[self.u_idx]
            v, m = _group_sum(self.ev[sel], np.ones(int(sel.sum()), np.int64))
        else:
            v = np.array([], np.int64)
            m = np.array([], np.int64)
        part = _owner(v, self.P)
        out = [pa.table({"node": pa.array(v[part == j], pa.int64()),
                         "dec": pa.array(m[part == j], pa.int64())})
               for j in range(self.P)]
        out.append(int(newly.sum()))
        return out if len(out) > 1 else out[0]

    def kcore_apply(self, *decs: pa.Table) -> None:
        ks, vs = [], []
        for t in decs:
            if t.num_rows:
                ks.append(t.column("node").to_numpy(zero_copy_only=False))
                vs.append(t.column("dec").to_numpy(zero_copy_only=False))
        if not ks:
            return
        k, v = _group_sum(np.concatenate(ks), np.concatenate(vs))
        idx = np.searchsorted(self.nodes, k)
        self.deg[idx] -= v  # dead nodes may go negative — they stay dead

    def kcore_result(self) -> pa.Table:
        sel = self.alive
        return pa.table({
            "node": pa.array(self.nodes[sel], pa.int64()),
            "core_degree": pa.array(self.deg[sel], pa.int64()),
        })

    # ---- HITS ------------------------------------------------------------ #
    def hits_init(self, n_nodes: int) -> None:
        self.hub = np.full(self.nodes.size, 1.0 / np.sqrt(n_nodes))
        self.auth = np.zeros(self.nodes.size)

    def hits_propagate(self, which: str):
        """'auth': forward edges forward hub[u] to owner(v);
        'hub': reverse edges forward auth[v] to owner(u)."""
        if which == "auth":
            tgt, idx, score = self.ev, self.u_idx, self.hub
        else:
            tgt, idx, score = self.ru, self.rv_idx, self.auth
        if tgt.size:
            k, m = _group_sum(tgt, score[idx])
        else:
            k = np.array([], np.int64)
            m = np.array([], np.float64)
        part = _owner(k, self.P)
        out = [pa.table({"node": pa.array(k[part == j], pa.int64()),
                         "mass": pa.array(m[part == j], pa.float64())})
               for j in range(self.P)]
        return out if self.P > 1 else out[0]

    def hits_merge(self, which: str, *masses: pa.Table) -> float:
        """Install the raw (unnormalized) vector for owned nodes; returns
        the local sum of squares so the driver can fold the global L2."""
        total = np.zeros(self.nodes.size)
        ks, vs = [], []
        for t in masses:
            if t.num_rows:
                ks.append(t.column("node").to_numpy(zero_copy_only=False))
                vs.append(t.column("mass").to_numpy(zero_copy_only=False))
        if ks:
            k, v = _group_sum(np.concatenate(ks), np.concatenate(vs))
            total[np.searchsorted(self.nodes, k)] = v
        if which == "auth":
            self.auth = total
        else:
            self.hub = total
        return float(np.dot(total, total))

    def hits_scale(self, which: str, norm: float) -> None:
        if norm <= 0.0:
            return
        if which == "auth":
            self.auth = self.auth / norm
        else:
            self.hub = self.hub / norm

    def hits_result(self) -> pa.Table:
        return pa.table({"node": pa.array(self.nodes, pa.int64()),
                         "hub": pa.array(self.hub, pa.float64()),
                         "authority": pa.array(self.auth, pa.float64())})


def _build_shards(edges, src: str, dst: str, P: int, *, undirected: bool,
                  dedup_edges: bool, with_reverse: bool = False,
                  weight: str | None = None):
    """Partition an edge Dataset into P shard actors: one map_batches pass
    routes edge rows to owner(u) and node announcements to owner(n); the
    driver consumes only per-batch row counts. ``with_reverse`` additionally
    routes each edge to owner(v) (for algorithms that propagate along BOTH
    directions, e.g. HITS) — duplicates of an edge land in the same shards
    either way, so per-shard dedup stays global."""
    import pyarrow.compute as pc

    Shard = ray.remote(num_cpus=0)(GraphShard)
    shards = [Shard.remote(i, P) for i in range(P)]

    def push(t: pa.Table) -> pa.Table:
        u = pc.cast(t.column(src), pa.int64()).to_numpy(zero_copy_only=False)
        v = pc.cast(t.column(dst), pa.int64()).to_numpy(zero_copy_only=False)
        w = (pc.cast(t.column(weight), pa.float64())
             .to_numpy(zero_copy_only=False) if weight else None)
        keep = u != v
        u, v = u[keep], v[keep]
        if w is not None:
            w = w[keep]
        if undirected and u.size:
            u, v = np.r_[u, v], np.r_[v, u]
            if w is not None:
                w = np.r_[w, w]
        acks = []
        eo = _owner(u, P)
        for j in range(P):
            sel = eo == j
            if sel.any():
                cols = {"u": pa.array(u[sel], pa.int64()),
                        "v": pa.array(v[sel], pa.int64())}
                if w is not None:
                    cols["w"] = pa.array(w[sel], pa.float64())
                acks.append(shards[j].add_edges.remote(pa.table(cols)))
        if with_reverse:
            ro = _owner(v, P)
            for j in range(P):
                sel = ro == j
                if sel.any():
                    acks.append(shards[j].add_rev_edges.remote(
                        pa.table({"u": pa.array(u[sel], pa.int64()),
                                  "v": pa.array(v[sel], pa.int64())})))
        nodes = np.unique(np.r_[u, v]) if u.size else u
        no = _owner(nodes, P)
        for j in range(P):
            sel = no == j
            if sel.any():
                acks.append(shards[j].add_nodes.remote(
                    pa.table({"node": pa.array(nodes[sel], pa.int64())})))
        ray.get(acks)
        return pa.table({"n": pa.array([len(u)], pa.int64())})

    edges.map_batches(push, batch_format="pyarrow",
                      batch_size=65536).sum("n")
    infos = ray.get([s.seal.remote(dedup_edges=dedup_edges) for s in shards])
    return shards, infos


def _routed(shards, refs_matrix):
    """refs_matrix[i] = P refs emitted by shard i; returns per-destination
    argument lists [refs from every i destined to j]."""
    P = len(shards)
    return [[refs_matrix[i][j] for i in range(P)] for j in range(P)]


def connected_components_bsp(
    edges, *, src: str = "src", dst: str = "dst", num_shards: int = 8,
    max_rounds: int = 100, pointer_jump: bool = True,
):
    """Actor-BSP connected components; same contract as
    ``stages.graph.connected_components`` (node → min id in component,
    undirected, self-loop-only nodes dropped)."""
    shards, infos = _build_shards(edges, src, dst, num_shards,
                                  undirected=True, dedup_edges=True)
    P = len(shards)
    if sum(i["nodes"] for i in infos) == 0:
        return ray.data.from_arrow(
            pa.table({"node": pa.array([], pa.int64()),
                      "component": pa.array([], pa.int64())}))
    ray.get([s.cc_init.remote() for s in shards])
    for _ in range(max_rounds):
        if P > 1:
            props = [s.cc_propagate.options(num_returns=P).remote()
                     for s in shards]
            routed = _routed(shards, props)
        else:
            routed = [[shards[0].cc_propagate.remote()]]
        changed = sum(ray.get(
            [shards[j].cc_merge.remote(*routed[j]) for j in range(P)]))
        if changed == 0:
            break
        if pointer_jump:
            if P > 1:
                qs = [s.label_queries.options(num_returns=P).remote()
                      for s in shards]
                answers = [
                    [shards[j].lookup.remote(qs[i][j]) for j in range(P)]
                    for i in range(P)
                ]
            else:
                answers = [[shards[0].lookup.remote(
                    shards[0].label_queries.remote())]]
            ray.get([shards[i].apply_jump.remote(*answers[i])
                     for i in range(P)])
    return ray.data.from_arrow_refs(
        [s.cc_result.remote() for s in shards])


def pagerank_bsp(
    edges, *, src: str = "src", dst: str = "dst", num_shards: int = 8,
    damping: float = 0.85, n_iter: int = 10, weight: str | None = None,
):
    """Actor-BSP PageRank; same contract as ``stages.graph.pagerank``
    (directed, parallel edges collapsed, dangling mass redistributed,
    ranks sum to 1). With ``weight``, rank mass splits proportionally to
    edge weight instead of uniformly over distinct targets (parallel
    weighted edges SUM their weights at the shard seal) — the host-graph
    authority variant, where an edge's weight is its URL-level link
    count."""
    shards, infos = _build_shards(edges, src, dst, num_shards,
                                  undirected=False, dedup_edges=True,
                                  weight=weight)
    P = len(shards)
    n_nodes = sum(i["nodes"] for i in infos)
    if n_nodes == 0:
        return ray.data.from_arrow(
            pa.table({"node": pa.array([], pa.int64()),
                      "rank": pa.array([], pa.float64())}))
    ray.get([s.pr_init.remote(n_nodes) for s in shards])
    base = (1.0 - damping) / n_nodes
    for _ in range(n_iter):
        outs = [s.pr_propagate.options(num_returns=P + 1).remote()
                for s in shards]
        emitted = sum(ray.get([outs[i][P] for i in range(P)]))
        dangle = max(1.0 - emitted, 0.0) / n_nodes
        routed = [[outs[i][j] for i in range(P)] for j in range(P)]
        ray.get([
            shards[j].pr_update.remote(base, damping, dangle, *routed[j])
            for j in range(P)
        ])
    return ray.data.from_arrow_refs([s.pr_result.remote() for s in shards])


def hits_bsp(
    edges, *, src: str = "src", dst: str = "dst", num_shards: int = 8,
    n_iter: int = 10,
):
    """Actor-BSP HITS; same contract as ``stages.graph.hits`` (directed,
    parallel edges collapsed, each half-step L2-normalized, h₀ = 1/√n).
    Edges are partitioned ONCE in both orientations (owner(u) forward,
    owner(v) reverse); each half-step ships only (node, mass) arrays and
    the driver folds one sum-of-squares scalar."""
    shards, infos = _build_shards(edges, src, dst, num_shards,
                                  undirected=False, dedup_edges=True,
                                  with_reverse=True)
    P = len(shards)
    n_nodes = sum(i["nodes"] for i in infos)
    if n_nodes == 0:
        empty = pa.array([], pa.float64())
        return ray.data.from_arrow(
            pa.table({"node": pa.array([], pa.int64()),
                      "hub": empty, "authority": empty}))
    ray.get([s.hits_init.remote(n_nodes) for s in shards])
    for _ in range(n_iter):
        for which in ("auth", "hub"):
            if P > 1:
                outs = [s.hits_propagate.options(num_returns=P).remote(which)
                        for s in shards]
                routed = _routed(shards, outs)
            else:
                routed = [[shards[0].hits_propagate.remote(which)]]
            ss = sum(ray.get(
                [shards[j].hits_merge.remote(which, *routed[j])
                 for j in range(P)]))
            norm = float(np.sqrt(ss))
            ray.get([s.hits_scale.remote(which, norm) for s in shards])
    return ray.data.from_arrow_refs([s.hits_result.remote() for s in shards])


def kcore_bsp(
    edges, *, k: int, src: str = "src", dst: str = "dst",
    num_shards: int = 8, max_rounds: int = 10_000,
):
    """Distributed k-core peeling (Matula & Beck 1983's algorithm, BSP-ified):
    repeatedly remove nodes of degree < k until a fixpoint →
    Dataset(node, core_degree) of the surviving k-core with each node's
    degree WITHIN the core. Undirected simple graph (edges deduped both
    orientations, self-loops dropped).

    Shape: edges partitioned once (owner(u), both orientations via the
    undirected build, so every node's full incidence is local to its
    owner); per round each shard kills its under-degree nodes locally and
    ships ONE (neighbor, decrement) array per destination shard — message
    volume ∝ edges incident to nodes killed that round, so the whole run
    ships each edge's decrement at most twice. The driver sees one scalar
    (kill count) per round.
    """
    shards, infos = _build_shards(edges, src, dst, num_shards,
                                  undirected=True, dedup_edges=True)
    P = len(shards)
    if sum(i["nodes"] for i in infos) == 0:
        return ray.data.from_arrow(
            pa.table({"node": pa.array([], pa.int64()),
                      "core_degree": pa.array([], pa.int64())}))
    ray.get([s.kcore_init.remote(k) for s in shards])
    for _ in range(max_rounds):
        outs = [s.kcore_peel.options(num_returns=P + 1).remote()
                for s in shards]
        killed = sum(ray.get([outs[i][P] for i in range(P)]))
        if killed == 0:
            break
        routed = [[outs[i][j] for i in range(P)] for j in range(P)]
        ray.get([shards[j].kcore_apply.remote(*routed[j]) for j in range(P)])
    return ray.data.from_arrow_refs([s.kcore_result.remote() for s in shards])


def bfs_depths_bsp(
    edges, sources, *, src: str = "src", dst: str = "dst",
    num_shards: int = 8, undirected: bool = False, max_rounds: int = 10_000,
):
    """Multi-source BFS → Dataset(node, depth): shortest hop distance from
    ANY of ``sources`` (unreachable nodes omitted; sources not present in
    the edge set are ignored). This is the crawl-analysis primitive behind
    "how deep is the reachable web from this seed list" — the unbounded,
    politeness-free analog of the crawl's wave number.

    Shape: frontier-only min-propagation on the sharded edge set — per
    round, only edges whose source's depth IMPROVED last round ship a
    (target, depth+1) proposal to the target's owner; converges in
    eccentricity(sources) rounds with total message volume O(edges) over
    the whole run.
    """
    shards, infos = _build_shards(edges, src, dst, num_shards,
                                  undirected=undirected, dedup_edges=True)
    P = len(shards)
    if sum(i["nodes"] for i in infos) == 0:
        return ray.data.from_arrow(
            pa.table({"node": pa.array([], pa.int64()),
                      "depth": pa.array([], pa.int64())}))
    n_seeded = sum(ray.get([s.bfs_init.remote(list(sources))
                            for s in shards]))
    if n_seeded:
        for _ in range(max_rounds):
            if P > 1:
                props = [s.bfs_propagate.options(num_returns=P).remote()
                         for s in shards]
                routed = _routed(shards, props)
            else:
                routed = [[shards[0].bfs_propagate.remote()]]
            changed = sum(ray.get(
                [shards[j].bfs_merge.remote(*routed[j]) for j in range(P)]))
            if changed == 0:
                break
    return ray.data.from_arrow_refs([s.bfs_result.remote() for s in shards])


def sssp_bsp(
    edges, sources, *, src: str = "src", dst: str = "dst",
    weight: str = "w", num_shards: int = 8, undirected: bool = False,
    max_rounds: int = 10_000,
):
    """Weighted single-source(-set) shortest paths → Dataset(node, dist):
    minimum total edge weight from ANY of ``sources`` (unreachable nodes
    omitted). The weighted generalization of :func:`bfs_depths_bsp` — the
    crawl-budget routing primitive (cost-weighted host hops).

    Shape: Bellman-Ford-style frontier-only relaxation on the sharded edge
    set — per round, only edges whose source's distance IMPROVED last
    round ship a (target, dist+w) proposal to the target's owner; with
    non-negative integer weights convergence takes at most
    |longest shortest path in hops| rounds and total message volume is
    O(edges × improvements). Weights must be non-negative int64 (exact
    path sums ⇒ bit-identical distances at any shard count); parallel
    edges are kept (the min-merge picks the cheapest), so no pre-dedup
    pass is needed."""
    shards, infos = _build_shards(edges, src, dst, num_shards,
                                  undirected=undirected, dedup_edges=False,
                                  weight=weight)
    P = len(shards)
    if sum(i["nodes"] for i in infos) == 0:
        return ray.data.from_arrow(
            pa.table({"node": pa.array([], pa.int64()),
                      "dist": pa.array([], pa.int64())}))
    n_seeded = sum(ray.get([s.sssp_init.remote(list(sources))
                            for s in shards]))
    if n_seeded:
        for _ in range(max_rounds):
            if P > 1:
                props = [s.sssp_propagate.options(num_returns=P).remote()
                         for s in shards]
                routed = _routed(shards, props)
            else:
                routed = [[shards[0].sssp_propagate.remote()]]
            changed = sum(ray.get(
                [shards[j].bfs_merge.remote(*routed[j]) for j in range(P)]))
            if changed == 0:
                break
    return ray.data.from_arrow_refs([s.sssp_result.remote() for s in shards])


def ppr_bsp(
    edges, seeds, *, src: str = "src", dst: str = "dst",
    num_shards: int = 8, damping: float = 0.85, n_iter: int = 10,
):
    """Personalized PageRank (teleport restricted to ``seeds``; Page et al.
    1999 §6 'personalized' vector; the seed-biased crawl-ordering signal):
    random walk restarts at a uniform seed instead of a uniform page, so
    rank mass concentrates around the seed neighborhood. Dangling mass
    teleports back to the seeds; ranks sum to 1. Seeds absent from the
    graph are ignored; raises if none remain. Same propagate machinery and
    message shape as :func:`pagerank_bsp`."""
    shards, infos = _build_shards(edges, src, dst, num_shards,
                                  undirected=False, dedup_edges=True)
    P = len(shards)
    if sum(i["nodes"] for i in infos) == 0:
        return ray.data.from_arrow(
            pa.table({"node": pa.array([], pa.int64()),
                      "rank": pa.array([], pa.float64())}))
    n_seeds = sum(ray.get([s.ppr_init.remote(list(seeds)) for s in shards]))
    if n_seeds == 0:
        raise ValueError("ppr_bsp: no seed is a node of the edge set")
    ray.get([s.ppr_set_nseeds.remote(n_seeds) for s in shards])
    for _ in range(n_iter):
        outs = [s.pr_propagate.options(num_returns=P + 1).remote()
                for s in shards]
        emitted = sum(ray.get([outs[i][P] for i in range(P)]))
        dangle = max(1.0 - emitted, 0.0)
        routed = [[outs[i][j] for i in range(P)] for j in range(P)]
        ray.get([shards[j].ppr_update.remote(damping, dangle, *routed[j])
                 for j in range(P)])
    return ray.data.from_arrow_refs([s.pr_result.remote() for s in shards])
