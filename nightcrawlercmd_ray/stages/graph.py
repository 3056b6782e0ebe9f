"""Distributed graph operators — engine additions beyond the reference (the
reference crawler extracts links, `mainCrawler.go:160-198`, but never
processes the link GRAPH). These are the graph shapes a web-corpus pipeline
needs: connected components (the standard post-pass that turns pairwise
near-duplicate matches from LSH into transitive duplicate CLUSTERS) and
PageRank over the crawl link graph (authority scoring for crawl ordering /
quality weighting).

Both are iterative BSP loops composed from the engine's own primitives:
per round, ONE keyed exchange ships compact (node, value) rows through
``stages.joins.hash_join`` (tagged union + coarse keyed shuffle + vectorized
per-partition merge) and ONE native groupby-aggregate (vectorized, never
per-key Python) reduces messages — edge payloads ride a shuffle once per
round, labels/ranks are the only other traffic, and nothing materializes on
the driver (per-round convergence is a scalar count).

Algorithms (public knowledge):
- connected components: iterative min-label propagation ("hash-min" family;
  cf. Rastogi et al., *Finding Connected Components in Map-Reduce in
  Logarithmic Rounds*, ICDE 2013, and Kiveris et al., *Connected Components
  in MapReduce and Beyond*, SoCC 2014). Converges in O(diameter) rounds —
  the intended workloads (near-dup clusters, small-world web graphs) have
  tiny diameter; for adversarially deep graphs the star-contraction variant
  of Kiveris et al. is the documented upgrade path.
- PageRank: Page, Brin, Motwani, Winograd, *The PageRank Citation Ranking*,
  1999 — damped power iteration with dangling-mass redistribution.

Partitioning assumption (inherited from hash_join): a single node's edges
fit in one partition; salt pathological super-nodes upstream.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Count, Min, Sum

from .joins import hash_join


def _edge_stream(edges, src: str, dst: str, *, undirected: bool):
    """Normalize to a (u, v) int64 edge Dataset; undirected doubles each
    edge so every neighborhood is visible from both endpoints. Self-loops
    are dropped (no-ops for both operators — a node with ONLY self-loops is
    a singleton and disappears from the node set entirely); per-batch exact
    duplicates are collapsed to shrink the per-round exchange."""

    def prep(t: pa.Table) -> pa.Table:
        u = pc.cast(t.column(src), pa.int64())
        v = pc.cast(t.column(dst), pa.int64())
        both = pa.table({"u": u, "v": v})
        if undirected:
            both = pa.concat_tables([both, pa.table({"u": v, "v": u})])
        both = both.filter(pc.not_equal(both.column("u"), both.column("v")))
        # in-batch dedupe (cheap combiner). NOT a global dedupe — CC's min
        # semantics tolerate dupes; pagerank dedupes globally (see _edges_w_deg)
        return both.group_by(["u", "v"]).aggregate([]).select(["u", "v"])

    return edges.map_batches(prep, batch_format="pyarrow", batch_size=65536)


def _distinct_nodes(edge_ds):
    """Dataset(node) of distinct endpoints: per-batch unique combiner, then
    one native groupby — only distinct ids per block ride the shuffle."""

    def uniq(t: pa.Table) -> pa.Table:
        n = pa.concat_arrays([
            t.column("u").combine_chunks(),
            t.column("v").combine_chunks(),
        ]).unique()
        return pa.table({"node": n})

    return (
        edge_ds.map_batches(uniq, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
    )


def _changed_count(merged) -> int:
    """Scalar count of rows with new_lab < old_lab, reduced per batch —
    never a per-row driver loop."""

    def part(t: pa.Table) -> pa.Table:
        lt = pc.less(t.column("new_lab"), t.column("old_lab"))
        c = pc.sum(pc.cast(lt, pa.int64())).as_py() or 0
        return pa.table({"c": pa.array([c], pa.int64())})

    return int(merged.map_batches(part, batch_format="pyarrow").sum("c") or 0)


def connected_components(
    edges,
    *,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 100,
    n_rows: int | None = None,
):
    """→ Dataset(node, component) — ``component`` is the smallest node id in
    the node's connected component (edges treated as undirected).

    Per round: labels join onto edges (keyed exchange on ``u``), each edge
    forwards its source's label to ``v`` (with an in-batch per-target min
    combiner), one native groupby-Min merges proposals with current labels,
    and a pointer-jump (``lab ← lab[lab]``, Wyllie shortcutting — one more
    keyed exchange over node-sized rows) halves the remaining propagation
    distance, making the loop O(log diameter) rounds instead of
    O(diameter). Labels only ever decrease, so the edge-propagation step's
    changed count hits 0 exactly at the fixed point.
    """
    e = _edge_stream(edges, src, dst, undirected=True).materialize()
    n_edges = e.count()
    if n_edges == 0:
        import ray

        return ray.data.from_arrow(
            pa.table({"node": pa.array([], pa.int64()),
                      "component": pa.array([], pa.int64())})
        )
    if n_rows is not None:
        n_edges = n_rows

    labels = _distinct_nodes(e).map_batches(
        lambda t: pa.table({"node": t.column("node"),
                            "lab": t.column("node")}),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(max_rounds):
        fwd = hash_join(
            e,
            labels.map_batches(
                lambda t: pa.table({"u": t.column("node"),
                                    "lab": t.column("lab")}),
                batch_format="pyarrow",
            ),
            on="u",
            n_rows=n_edges,
        )

        def msg(t: pa.Table) -> pa.Table:
            p = pa.table({"node": t.column("v"), "cand": t.column("lab")})
            g = p.group_by("node").aggregate([("cand", "min")])
            return pa.table({
                "node": g.column("node"),
                "cand": g.column("cand_min"),
                "old": pa.nulls(g.num_rows, pa.int64()),
            })

        merged = (
            fwd.map_batches(msg, batch_format="pyarrow", batch_size=65536)
            .union(labels.map_batches(
                lambda t: pa.table({"node": t.column("node"),
                                    "cand": t.column("lab"),
                                    "old": t.column("lab")}),
                batch_format="pyarrow",
            ))
            .groupby("node")
            .aggregate(Min("cand", alias_name="new_lab"),
                       Min("old", alias_name="old_lab"))
            .materialize()
        )
        changed = _changed_count(merged)
        labels = merged.map_batches(
            lambda t: pa.table({"node": t.column("node"),
                                "lab": t.column("new_lab")}),
            batch_format="pyarrow",
        ).materialize()
        if changed == 0:
            break

        # pointer jump: lab ← lab[lab]. Every label IS a node id, so the
        # left join always resolves; coalesce guards the root (lab == node)
        jump = hash_join(
            labels.map_batches(
                lambda t: pa.table({"_j": t.column("lab"),
                                    "node": t.column("node")}),
                batch_format="pyarrow",
            ),
            labels.map_batches(
                lambda t: pa.table({"_j": t.column("node"),
                                    "lab2": t.column("lab")}),
                batch_format="pyarrow",
            ),
            on="_j",
            how="left",
            n_rows=None,
        )
        labels = jump.map_batches(
            lambda t: pa.table({
                "node": t.column("node"),
                "lab": pc.coalesce(t.column("lab2"), t.column("_j")),
            }),
            batch_format="pyarrow",
        ).materialize()

    return labels.map_batches(
        lambda t: pa.table({"node": t.column("node"),
                            "component": t.column("lab")}),
        batch_format="pyarrow",
    )


def dup_clusters(pairs, *, left: str = "doc_id", right: str = "dup_of",
                 n_rows: int | None = None, engine: str = "bsp",
                 num_shards: int = 8):
    """Transitive duplicate clusters from pairwise near-dup matches (the
    standard LSH post-pass): → Dataset(doc_id, cluster_id) covering every
    doc that appears in ≥1 pair, with cluster_id = min doc id in the
    transitive group. Docs in no pair are singletons by definition and are
    deliberately not emitted. ``engine="bsp"`` (default) runs on the
    actor-sharded engine (``state/graphbsp.py`` — edges partitioned once,
    only labels move per round); ``engine="dataset"`` uses the pure
    Dataset composition below."""
    if engine == "bsp":
        from ..state.graphbsp import connected_components_bsp

        lab = connected_components_bsp(pairs, src=left, dst=right,
                                       num_shards=num_shards)
    else:
        lab = connected_components(pairs, src=left, dst=right, n_rows=n_rows)
    return lab.map_batches(
        lambda t: pa.table({"doc_id": t.column("node"),
                            "cluster_id": t.column("component")}),
        batch_format="pyarrow",
    )


def pagerank(
    edges,
    *,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    n_iter: int = 10,
    n_rows: int | None = None,
):
    """→ Dataset(node, rank) after ``n_iter`` damped power iterations over
    the DIRECTED edge list (parallel edges collapsed); ranks sum to 1
    (dangling mass redistributed uniformly, the standard treatment).

    Per iteration: ranks join onto out-edges (keyed exchange on ``u``), each
    edge emits rank/outdeg to its target with an in-batch per-target sum
    combiner, one native groupby-Sum reduces incoming mass, and a left join
    back onto the node set re-bases nodes with no in-links. Edge payloads
    are (u, v, outdeg) only; the driver sees two scalars per round.
    """
    e = _edge_stream(edges, src, dst, undirected=False).materialize()
    if e.count() == 0:
        import ray

        return ray.data.from_arrow(
            pa.table({"node": pa.array([], pa.int64()),
                      "rank": pa.array([], pa.float64())})
        )
    # global parallel-edge collapse: PageRank's outdeg counts DISTINCT targets
    e = (
        e.groupby(["u", "v"])
        .aggregate(Count(alias_name="_m"))
        .drop_columns(["_m"])
        .materialize()
    )
    n_edges = n_rows if n_rows is not None else e.count()

    nodes = _distinct_nodes(e).materialize()
    n_nodes = nodes.count()

    # out-degree once, attached to edges once — iterations reuse it
    deg = (
        e.groupby("u")
        .aggregate(Count(alias_name="outdeg"))
    )
    ewd = hash_join(e, deg, on="u", n_rows=n_edges).materialize()

    base = (1.0 - damping) / n_nodes
    ranks = nodes.map_batches(
        lambda t: pa.table({
            "node": t.column("node"),
            "rank": pa.array(
                np.full(t.num_rows, 1.0 / n_nodes), pa.float64()),
        }),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(n_iter):
        contrib = hash_join(
            ewd,
            ranks.map_batches(
                lambda t: pa.table({"u": t.column("node"),
                                    "rank": t.column("rank")}),
                batch_format="pyarrow",
            ),
            on="u",
            n_rows=n_edges + n_nodes,
        )

        def emit(t: pa.Table) -> pa.Table:
            c = pc.divide(
                t.column("rank"),
                pc.cast(t.column("outdeg"), pa.float64()),
            )
            p = pa.table({"node": t.column("v"), "m": c})
            g = p.group_by("node").aggregate([("m", "sum")])
            return pa.table({"node": g.column("node"),
                             "mass": g.column("m_sum")})

        mass = (
            contrib.map_batches(emit, batch_format="pyarrow",
                                batch_size=65536)
            .groupby("node")
            .aggregate(Sum("mass", alias_name="mass"))
            .materialize()
        )
        # dangling mass = rank not emitted this round (outdeg-0 nodes).
        # Total rank is invariantly 1: sum(next) = (1-d) + d*total, so
        # starting from 1 it stays 1 — no need to re-sum ranks per round.
        emitted = mass.sum("mass") or 0.0
        dangle = max(1.0 - emitted, 0.0) / n_nodes

        joined = hash_join(nodes, mass, on="node", how="left",
                           n_rows=2 * n_nodes)
        d = damping
        ranks = joined.map_batches(
            lambda t, _b=base, _d=d, _g=dangle: pa.table({
                "node": t.column("node"),
                "rank": pc.add(
                    pa.scalar(_b + _d * _g),
                    pc.multiply(
                        pc.coalesce(t.column("mass"), pa.scalar(0.0)),
                        pa.scalar(_d),
                    ),
                ),
            }),
            batch_format="pyarrow",
        ).materialize()

    return ranks


def hits(
    edges,
    *,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 10,
    n_rows: int | None = None,
):
    """→ Dataset(node, hub, authority) after ``n_iter`` HITS iterations
    (Kleinberg, *Authoritative Sources in a Hyperlinked Environment*, JACM
    1999) over the DIRECTED edge list (parallel edges collapsed; self-loops
    dropped). Each half-step L2-normalizes its vector — the classic
    mutually-reinforcing update a = Aᵀh / ‖Aᵀh‖, h = Aa / ‖Aa‖ from
    h₀ = 1/√n.

    Shape per half-iteration (mirrors :func:`pagerank`): current scores join
    onto the edge list (keyed exchange on the forwarding endpoint), each edge
    forwards its endpoint's score to the other endpoint with an in-batch
    per-target sum combiner, one native groupby-Sum reduces incoming score,
    and the L2 norm is a per-batch sum-of-squares partial folded to ONE
    scalar on the driver. Nodes that receive no mass are implicitly 0 and
    are re-based onto the full node set only once, at the end — inner joins
    mid-loop mean absent == 0 exactly.
    """
    import ray

    e = _edge_stream(edges, src, dst, undirected=False).materialize()
    if e.count() == 0:
        empty = pa.array([], pa.float64())
        return ray.data.from_arrow(
            pa.table({"node": pa.array([], pa.int64()),
                      "hub": empty, "authority": empty})
        )
    # parallel-edge collapse: HITS is defined on the simple directed graph
    e = (
        e.groupby(["u", "v"])
        .aggregate(Count(alias_name="_m"))
        .drop_columns(["_m"])
        .materialize()
    )
    n_edges = n_rows if n_rows is not None else e.count()

    nodes = _distinct_nodes(e).materialize()
    n_nodes = nodes.count()

    hubs = nodes.map_batches(
        lambda t, _h=1.0 / np.sqrt(n_nodes): pa.table({
            "node": t.column("node"),
            "score": pa.array(np.full(t.num_rows, _h), pa.float64()),
        }),
        batch_format="pyarrow",
    ).materialize()
    auths = hubs

    def _l2(scores) -> float:
        def part(t: pa.Table) -> pa.Table:
            s = t.column("score").to_numpy(zero_copy_only=False)
            return pa.table({"ss": pa.array([float(np.dot(s, s))])})

        ss = scores.map_batches(part, batch_format="pyarrow").sum("ss") or 0.0
        return float(np.sqrt(ss))

    def _half_step(scores, key_fwd: str, key_to: str):
        """One forward pass: Σ over edges of score(key_fwd-endpoint) at the
        key_to-endpoint, then L2-normalize."""
        contrib = hash_join(
            e,
            scores.map_batches(
                lambda t, _k=key_fwd: pa.table(
                    {_k: t.column("node"), "score": t.column("score")}),
                batch_format="pyarrow",
            ),
            on=key_fwd,
            n_rows=n_edges + n_nodes,
        )

        def emit(t: pa.Table) -> pa.Table:
            p = pa.table({"node": t.column(key_to), "m": t.column("score")})
            g = p.group_by("node").aggregate([("m", "sum")])
            return pa.table({"node": g.column("node"),
                             "score": g.column("m_sum")})

        raw = (
            contrib.map_batches(emit, batch_format="pyarrow",
                                batch_size=65536)
            .groupby("node")
            .aggregate(Sum("score", alias_name="score"))
            .materialize()
        )
        norm = _l2(raw)
        if norm == 0.0:
            return raw
        return raw.map_batches(
            lambda t, _n=norm: pa.table({
                "node": t.column("node"),
                "score": pc.divide(t.column("score"), pa.scalar(_n)),
            }),
            batch_format="pyarrow",
        ).materialize()

    for _ in range(n_iter):
        auths = _half_step(hubs, "u", "v")    # a = Aᵀh, normalized
        hubs = _half_step(auths, "v", "u")    # h = A a, normalized

    out = hash_join(
        hash_join(
            nodes,
            hubs.map_batches(
                lambda t: pa.table({"node": t.column("node"),
                                    "hub": t.column("score")}),
                batch_format="pyarrow"),
            on="node", how="left", n_rows=2 * n_nodes,
        ),
        auths.map_batches(
            lambda t: pa.table({"node": t.column("node"),
                                "authority": t.column("score")}),
            batch_format="pyarrow"),
        on="node", how="left", n_rows=2 * n_nodes,
    )
    return out.map_batches(
        lambda t: pa.table({
            "node": t.column("node"),
            "hub": pc.coalesce(pc.cast(t.column("hub"), pa.float64()),
                               pa.scalar(0.0)),
            "authority": pc.coalesce(
                pc.cast(t.column("authority"), pa.float64()),
                pa.scalar(0.0)),
        }),
        batch_format="pyarrow",
    )


def triangle_counts(edges, *, u_col: str = "u", v_col: str = "v",
                    n_rows: int | None = None,
                    num_partitions: int | None = None):
    """Per-node triangle counts over an undirected graph given as DISTINCT
    canonical edges (u < v) — each triangle {u<v<w} attributed to its
    smallest node u → Dataset(u, n_tri). Σ n_tri = global triangle count.

    Node-iterator with canonical orientation (Schank & Wagner 2005): for
    every middle node v, wedges are (u→v) × (v→w) with u<v<w; a wedge
    closes iff (u, w) is an edge. Shape: each edge is routed to exactly TWO
    coarse partitions (once keyed by each endpoint, tagged in/out), so ONE
    compact shuffle co-locates every mid-node's adjacency; wedges are
    ENUMERATED AND COUNTED inside the partition (repeat/searchsorted, no
    Python pair loop) against a BROADCAST sorted array of packed edge keys
    (u·2³² + w; ids must fit 31 bits, asserted) — wedges never hit a second
    exchange, the earlier two-hash-join layout was ~60× slower for exactly
    that reason. Output of a partition is pre-aggregated (u, partial) rows;
    one tiny groupby(u).sum finishes. The broadcast is 8 bytes/edge — fine
    to ~10^9 edges; beyond that swap the probe for the semi-join-on-packed-
    key path (the engine's hash_join supports it) at one extra exchange.
    """
    import ray

    from .dedup import _num_coarse_partitions

    # the edge table is consumed twice (broadcast key build + routed
    # shuffle); it is compact int rows (16 B/edge, spillable) — materialize
    # once instead of re-running the upstream edge build per consumer
    edges = edges.materialize()
    P = _num_coarse_partitions(edges, num_partitions, n_rows)

    # broadcast sorted packed edge keys (8 B/edge)
    def pack_batch(t: pa.Table) -> pa.Table:
        x = t.column(u_col).to_numpy(zero_copy_only=False).astype(np.int64)
        y = t.column(v_col).to_numpy(zero_copy_only=False).astype(np.int64)
        assert ((0 <= x) & (x < 1 << 31)).all() and \
            ((0 <= y) & (y < 1 << 31)).all(), \
            "triangle_counts packs (u,w) into one int64: ids must fit 31 bits"
        return pa.table({"_uw": pa.array((x << 32) | y)})

    key_blocks = [
        b.column("_uw").to_numpy(zero_copy_only=False)
        for b in edges.map_batches(pack_batch, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    ]
    edge_keys = np.sort(np.concatenate(key_blocks)) if key_blocks else \
        np.zeros(0, np.int64)
    keys_ref = ray.put(edge_keys)

    def route(t: pa.Table) -> pa.Table:
        u = t.column(u_col).to_numpy(zero_copy_only=False).astype(np.int64)
        v = t.column(v_col).to_numpy(zero_copy_only=False).astype(np.int64)
        # one copy keyed by its v endpoint (edge arrives AT mid), one by u
        # (edge leaves FROM mid)
        mid = np.concatenate([v, u])
        other = np.concatenate([u, v])
        is_in = np.concatenate([np.ones(len(u), bool), np.zeros(len(u), bool)])
        return pa.table({
            "_c": pa.array((mid % P).astype(np.int64)),
            "mid": pa.array(mid),
            "other": pa.array(other),
            "is_in": pa.array(is_in),
        })

    def count_wedges(g: pa.Table) -> pa.Table:
        keys = ray.get(keys_ref)
        g = g.sort_by([("mid", "ascending"), ("is_in", "ascending"),
                       ("other", "ascending")])
        mid = g.column("mid").to_numpy(zero_copy_only=False)
        oth = g.column("other").to_numpy(zero_copy_only=False)
        isin = g.column("is_in").to_numpy(zero_copy_only=False)
        if len(mid) == 0:
            return pa.table({"u": pa.array([], pa.int64()),
                             "partial": pa.array([], pa.int64())})
        new = np.empty(len(mid), dtype=bool)
        new[0] = True
        new[1:] = mid[1:] != mid[:-1]
        starts = np.nonzero(new)[0]
        bounds = np.append(starts, len(mid))
        us_all, ws_all = [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            # within a mid segment, is_in=False (outs) sort first
            seg_in = isin[s:e]
            n_out = int((~seg_in).sum())
            if n_out == 0 or n_out == e - s:
                continue
            ws = oth[s:s + n_out]          # v → w  (w > v)
            us = oth[s + n_out:e]          # u → v  (u < v)
            us_all.append(np.repeat(us, len(ws)))
            ws_all.append(np.tile(ws, len(us)))
        if not us_all:
            return pa.table({"u": pa.array([], pa.int64()),
                             "partial": pa.array([], pa.int64())})
        uu = np.concatenate(us_all)
        ww = np.concatenate(ws_all)
        probe = (uu << np.int64(32)) | ww
        pos = np.searchsorted(keys, probe)
        hit = (pos < len(keys)) & (keys[np.minimum(pos, len(keys) - 1)] == probe)
        if not hit.any():
            return pa.table({"u": pa.array([], pa.int64()),
                             "partial": pa.array([], pa.int64())})
        uniq, cnt = np.unique(uu[hit], return_counts=True)
        return pa.table({"u": pa.array(uniq.astype(np.int64)),
                         "partial": pa.array(cnt.astype(np.int64))})

    return (
        edges.map_batches(route, batch_format="pyarrow")
        .groupby("_c")
        .map_groups(count_wedges, batch_format="pyarrow")
        .groupby("u")
        .sum("partial")
        .map_batches(lambda t: t.rename_columns(["u", "n_tri"]),
                     batch_format="pyarrow")
    )
