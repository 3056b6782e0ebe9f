"""Frontier shard — per-host FIFO lanes + politeness budgets + URL-seen filter.

This re-homes the reference crawler's central mutable state
(``cw.Links map[string]bool`` + ``PageCount``, ``/root/reference/mainCrawler.go:110-155``,
and the serial politeness wait ``mainCrawler.go:45,81``) into P independent
shards, each owning the hosts with ``host_hash % P == shard_id``. The crawl
driver (pipelines/crawl.py) runs shards as long-lived Ray actors; this class
itself is plain Python so the serial oracle and unit tests drive it directly.

Pinned ordering contract (SURVEY §3.1 — the engine's deterministic
specification of the reference's map-iteration-order crawl loop):

- BFS waves; wave 0 = seeds in list order; wave k+1 = links discovered in
  wave k. Within a wave, candidates are processed in discovery order
  ``(src_seq, link_pos)``; first discovery wins the dedup.
- Each wave, every host may emit up to ``max(1, window_ms // delay_ms(host))``
  URLs from the front of its FIFO lane — the politeness budget
  (reference default delay 500 ms, ``mainCrawler.go:45``; robots Crawl-delay
  raises it). Leftover lane entries wait for the next wave.
- Emission order: politeness ticks t = 0,1,…; at tick t every host (sorted by
  ``(host_hash, host)``) with remaining budget and a non-empty lane emits one
  URL. ``(tick, host_hash, host)`` is therefore a total order over the wave,
  across all shards — the driver sorts the merged wave by it.

Determinism: given the same candidate batches (any arrival order — they are
sorted on entry) and the same config, every method is a pure function of prior
state; checkpoints restore bit-equal behavior.
"""

from __future__ import annotations

import pickle
from collections import deque
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.urlnorm import host_hash as _host_hash
from ..functions.urlnorm import url_hash as _url_hash
from .cuckoo import make_seen_filter
from .robots import RobotsRules, url_path

WAVE_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("host_hash", pa.uint64()),
        ("url_hash", pa.uint64()),  # carried so downstream never re-hashes
        ("depth", pa.int32()),
        ("tick", pa.int32()),
    ]
)


@dataclass
class FrontierConfig:
    num_shards: int = 8
    default_delay_ms: int = 500  # reference default, mainCrawler.go:45
    per_host_delay_ms: dict[str, int] = field(default_factory=dict)
    window_ms: int = 2000  # politeness window a wave represents
    seen_filter: str = "cuckoo"  # or "bloom" / "exact" (conformance mode)
    seen_capacity: int = 1 << 20  # per shard
    keep_seen_log: bool = False  # record url strings (test scale only)
    respect_robots: bool = True
    # False when the fetch tasks already robots-gate candidates in parallel
    # (the distributed driver's mode); robots rules are still installed on the
    # shard for Crawl-delay politeness. True = gate here (serial oracle parity
    # mode for unit tests).
    robots_gate_in_seal: bool = True
    # "host": candidates route by host_hash%P and dedup + lanes live together
    #         (simple mode; a hot host concentrates its seen-filter state and
    #         seal work on one shard).
    # "url":  the skew-handling mode of the north rule — candidates route by
    #         url_hash%P, so URL-seen state and dedup WORK are uniform across
    #         shards by construction regardless of host skew (the "salted
    #         split": a hot host's URLs spread over all P shards). Survivors
    #         are then forwarded shard→shard to their host's politeness lane,
    #         which stays the single per-host budget owner. Needs set_peers().
    dedup_sharding: str = "host"


class FrontierShard:
    def __init__(self, shard_id: int, config: FrontierConfig):
        self.shard_id = shard_id
        self.cfg = config
        self.seen = make_seen_filter(config.seen_filter, config.seen_capacity)
        self._pending: list[pa.Table] = []  # candidate buffer for current wave
        self._forwarded: list[pa.Table] = []  # dedup survivors (url mode)
        self.peers: list | None = None  # actor handles, url mode only
        self.seen_log: list[str] = []  # url strings, only when cfg.keep_seen_log
        self.lanes: dict[str, deque[tuple[str, int, int]]] = {}  # host -> (url, depth, url_hash)
        self.robots: dict[str, RobotsRules] = {}
        self.counters = {
            "candidates_in": 0,
            "dup_dropped": 0,
            "robots_blocked": 0,
            "enqueued": 0,
            "emitted": 0,
        }

    # ------------------------------------------------------------------ config
    def set_robots(self, rules: dict[str, RobotsRules]) -> None:
        self.robots.update(rules)

    def set_peers(self, handles: list) -> None:
        """All shard actor handles (url-sharded dedup forwards through them)."""
        self.peers = handles

    def _delay_ms(self, host: str) -> int:
        d = self.cfg.per_host_delay_ms.get(host, self.cfg.default_delay_ms)
        r = self.robots.get(host)
        if r is not None and r.crawl_delay_ms is not None:
            d = max(d, r.crawl_delay_ms)
        return max(1, d)

    def _budget(self, host: str) -> int:
        return max(1, self.cfg.window_ms // self._delay_ms(host))

    # -------------------------------------------------------------- candidates
    def add_candidates(self, batch: pa.Table) -> int:
        """Buffer candidates pushed by (any number of, in any order) fetch
        tasks during the current wave. Columns: url (canonical), host,
        src_seq:int64, link_pos:int32, depth:int32. Nothing is enqueued until
        ``seal_wave`` — the wave barrier — so upstream parallelism cannot
        influence dedup or lane order.

        Arrival-time conservative prefilter (r3 verdict: overlap seal work
        with wave stragglers): candidates already in the PRE-WAVE seen set
        are dropped here, while fetch tasks are still running, instead of at
        the barrier. Sound because every seen filter's membership is
        MONOTONE (see ``CuckooFilter.contains_batch``): contains=True now ⟹
        contains=True at the canonical-order seal pass, so the exact same
        instances would be dropped there, in any arrival order — survivors,
        counters and the seen set are bit-identical. On crawl corpora most
        candidates are dups (≈70-90% measured), so most of the barrier's
        dedup cost moves into the fetch window. Applied only when robots are
        pre-gated upstream (distributed mode): with the gate in the seal, a
        robots-blocked candidate must count as robots_blocked, not
        dup_dropped, and that attribution needs the canonical pass."""
        n = batch.num_rows
        if not n:
            return 0
        if (
            "url_hash" in batch.column_names
            and not (self.cfg.respect_robots and self.cfg.robots_gate_in_seal)
            and hasattr(self.seen, "contains_batch")
        ):
            pre = self.seen.contains_batch(
                batch.column("url_hash").to_numpy(zero_copy_only=False))
            n_dup = int(pre.sum())
            if n_dup:
                self.counters["candidates_in"] += n_dup
                self.counters["dup_dropped"] += n_dup
                if n_dup == n:
                    return n
                batch = batch.take(pa.array(np.nonzero(~pre)[0]))
        self._pending.append(batch)
        return n

    @staticmethod
    def _drain_sorted(buf: list[pa.Table]) -> pa.Table | None:
        """Concat a buffer and sort by the canonical discovery key — arrival
        order (and thus upstream parallelism) cannot influence outcomes."""
        if not buf:
            return None
        batch = pa.concat_tables(buf)
        buf.clear()
        return batch.sort_by([("src_seq", "ascending"), ("link_pos", "ascending")])

    def _batch_cols(self, batch: pa.Table):
        urls = batch.column("url").to_pylist()
        hosts = batch.column("host").to_pylist()
        depths = (
            batch.column("depth").to_pylist()
            if "depth" in batch.column_names else [0] * len(urls)
        )
        hashes = (
            batch.column("url_hash").to_pylist()
            if "url_hash" in batch.column_names
            else [_url_hash(u) for u in urls]
        )
        return urls, hosts, depths, hashes

    def flush_dedup(self, *_barrier) -> list:
        """url-sharded mode, phase 1 (between the fetch barrier and
        seal_wave): gate+dedup THIS shard's url-partition of the wave's
        candidates — uniform work across shards regardless of host skew —
        then forward survivors to their host's lane shard. Returns
        (target_shard, ack_ref) pairs: the driver routes each ack to ONLY
        its target shard's ``seal_wave`` call (scheduler-side barrier on
        ≤num_shards unresolved refs per seal — an all-to-all ack fan-in
        was measured at ~0.1 s/wave of arg-resolution cost). ``_barrier``
        accepts upstream ack values the same way when used."""
        batch = self._drain_sorted(self._pending)
        if batch is None:
            return []
        gate = self.cfg.respect_robots and self.cfg.robots_gate_in_seal
        self.counters["candidates_in"] += batch.num_rows
        if not gate and "url_hash" in batch.column_names:
            # distributed fast path (robots pre-gated in the fetch tasks):
            # one vectorized seen-filter pass over the whole candidate batch —
            # in-(src_seq,link_pos)-order first-wins exactly like the loop
            hashes_arr = batch.column("url_hash").to_numpy(zero_copy_only=False)
            new_mask = self.seen.add_batch(hashes_arr)
            keep = np.nonzero(new_mask)[0]
            self.counters["dup_dropped"] += int(batch.num_rows - keep.size)
            if self.cfg.keep_seen_log:
                kept_urls = batch.column("url").take(pa.array(keep)).to_pylist()
                self.seen_log.extend(kept_urls)
            if keep.size == 0:
                return []
            survivors = batch.take(pa.array(keep))
        else:
            urls, hosts, depths, hashes = self._batch_cols(batch)
            keep_l: list[int] = []
            for i, (url, host, h) in enumerate(zip(urls, hosts, hashes)):
                if gate:
                    r = self.robots.get(host)
                    if r is not None and not r.allowed(url_path(url)):
                        self.counters["robots_blocked"] += 1
                        continue
                if not self.seen.add_if_new(h):
                    self.counters["dup_dropped"] += 1
                    continue
                if self.cfg.keep_seen_log:
                    self.seen_log.append(url)
                keep_l.append(i)
            if not keep_l:
                return []
            survivors = batch.take(pa.array(keep_l, pa.int64()))
        assert self.peers is not None, "url-sharded dedup requires set_peers()"
        lane_shard = [
            _host_hash(h) % self.cfg.num_shards
            for h in survivors.column("host").to_pylist()
        ]
        ls_arr = pa.array(lane_shard, pa.int32())
        acks = []
        for p in sorted(set(lane_shard)):
            sub = survivors.filter(pc.equal(ls_arr, p))
            acks.append((p, self.peers[p].add_forwarded.remote(sub)))
        return acks

    def add_forwarded(self, batch: pa.Table) -> int:
        """Receive dedup survivors destined for this shard's host lanes."""
        if batch.num_rows:
            self._forwarded.append(batch)
        return batch.num_rows

    def seal_wave(self, *_barrier) -> dict:
        """Wave barrier. host-sharded mode: robots gate (unless pre-gated) →
        dedup → lane append, all here. url-sharded mode: lane-append the
        already-deduped survivors forwarded by flush_dedup. ``_barrier``
        accepts upstream ack values (forward acks in url mode, candidate
        push acks in host mode): passing the ack REFS as arguments makes
        Ray hold this call until they have all landed, replacing
        driver-side gathers (pipelines/crawl._seal_async)."""
        if self.cfg.dedup_sharding == "url":
            batch = self._drain_sorted(self._forwarded)
            if batch is not None:
                urls, hosts, depths, hashes = self._batch_cols(batch)
                for url, host, depth, h in zip(urls, hosts, depths, hashes):
                    self.lanes.setdefault(host, deque()).append((url, depth, h))
                self.counters["enqueued"] += len(urls)
            return {"frontier": self.frontier_size()}
        batch = self._drain_sorted(self._pending)
        if batch is not None:
            urls, hosts, depths, hashes = self._batch_cols(batch)
            gate = self.cfg.respect_robots and self.cfg.robots_gate_in_seal
            self.counters["candidates_in"] += len(urls)
            for url, host, depth, h in zip(urls, hosts, depths, hashes):
                if gate:
                    r = self.robots.get(host)
                    if r is not None and not r.allowed(url_path(url)):
                        self.counters["robots_blocked"] += 1
                        continue
                if not self.seen.add_if_new(h):
                    self.counters["dup_dropped"] += 1
                    continue
                self.lanes.setdefault(host, deque()).append((url, depth, h))
                if self.cfg.keep_seen_log:
                    self.seen_log.append(url)
                self.counters["enqueued"] += 1
        return {"frontier": self.frontier_size()}

    def mark_seen(self, urls: list[str]) -> int:
        """Pre-mark URLs seen without enqueuing (``no-new-links`` pre-marking,
        ``mainCrawler.go:110-115``, and resume restore)."""
        n = 0
        for u in urls:
            if self.seen.add_if_new(_url_hash(u)):
                if self.cfg.keep_seen_log:
                    self.seen_log.append(u)
                n += 1
        return n

    # ------------------------------------------------------------------- waves
    def emit_wave(self, *_barrier) -> pa.Table:
        """Pop this wave's fetch quota from every lane, in the pinned order.

        ``_barrier``: optional unread ref args — the driver passes the
        previous wave's seal-chain result so the scheduler holds this call
        until the seal has committed (no cross-caller mailbox reliance)."""
        hosts = sorted(self.lanes, key=lambda h: (_host_hash(h), h))
        out_url: list[str] = []
        out_host: list[str] = []
        out_hh: list[int] = []
        out_uh: list[int] = []
        out_depth: list[int] = []
        out_tick: list[int] = []
        budgets = {h: self._budget(h) for h in hosts}
        hh_cache = {h: _host_hash(h) for h in hosts}
        tick = 0
        active = [h for h in hosts if self.lanes[h]]
        while active:
            next_active = []
            for h in active:
                lane = self.lanes[h]
                url, depth, uh = lane.popleft()
                out_url.append(url)
                out_host.append(h)
                out_hh.append(hh_cache[h])
                out_uh.append(uh)
                out_depth.append(depth)
                out_tick.append(tick)
                if lane and tick + 1 < budgets[h]:
                    next_active.append(h)
            tick += 1
            active = next_active
        for h in [h for h, lane in self.lanes.items() if not lane]:
            del self.lanes[h]
        self.counters["emitted"] += len(out_url)
        return pa.table(
            {
                "url": pa.array(out_url, pa.string()),
                "host": pa.array(out_host, pa.string()),
                "host_hash": pa.array(np.array(out_hh, dtype=np.uint64)),
                "url_hash": pa.array(np.array(out_uh, dtype=np.uint64)),
                "depth": pa.array(out_depth, pa.int32()),
                "tick": pa.array(out_tick, pa.int32()),
            },
            schema=WAVE_SCHEMA,
        )

    def frontier_size(self) -> int:
        return sum(len(v) for v in self.lanes.values())

    def get_seen_log(self) -> list[str]:
        return self.seen_log

    def get_robots(self) -> dict[str, RobotsRules]:
        return self.robots

    def stats(self) -> dict:
        return {
            **self.counters,
            "frontier": self.frontier_size(),
            "seen": len(self.seen),
            "shard_id": self.shard_id,
        }

    # -------------------------------------------------------------- checkpoint
    def checkpoint_bytes(self) -> bytes:
        """Checkpoints are taken at wave boundaries only (after seal_wave +
        emit), so the candidate buffer must be empty."""
        assert not self._pending and not self._forwarded, (
            "checkpoint mid-wave: flush_dedup + seal_wave first"
        )
        return pickle.dumps(
            {
                "shard_id": self.shard_id,
                "seen_kind": self.cfg.seen_filter,
                "seen": self.seen.to_bytes(),
                "lanes": {h: list(v) for h, v in self.lanes.items()},
                "robots": self.robots,
                "counters": self.counters,
                "seen_log": self.seen_log,
            },
            protocol=4,
        )

    def restore_bytes(self, data: bytes) -> None:
        d = pickle.loads(data)
        assert d["shard_id"] == self.shard_id, "checkpoint/shard mismatch"
        # The checkpoint's stored filter kind wins: restoring a cuckoo blob
        # through ExactSeenFilter.from_bytes (or vice versa) would silently
        # produce a garbage filter and break the no-refetch invariant.
        kind = d.get("seen_kind", self.cfg.seen_filter)
        from .cuckoo import seen_filter_class

        self.seen = seen_filter_class(kind).from_bytes(d["seen"])
        self.cfg.seen_filter = kind
        self.lanes = {h: deque(v) for h, v in d["lanes"].items()}
        self.robots = d["robots"]
        self.counters = d["counters"]
        self.seen_log = d.get("seen_log", [])
        self._pending = []
        self._forwarded = []
