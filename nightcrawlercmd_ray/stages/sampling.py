"""Deterministic sampling / mixture weighting for training-data pipelines.

Engine addition beyond the reference (which has no sampling at all —
SURVEY §2.6 "No top-k and no sampling"). These are the knobs a 100-TB
corpus-prep pipeline needs: drop-in per-source mixture weighting ("keep 50%
of English, 25% of German, 10% of the rest") and stable train/holdout
splits. Everything is a pure per-batch vectorized map — no shuffle, no
state, no RNG stream to coordinate — so the operators are trivially
scale-safe and **reproducible at any parallelism**: membership depends only
on (key, salt), never on row order, partition boundaries or worker count.

The hash is deliberately simple integer arithmetic —
``(key * 2654435761 + salt) mod 2^32`` (Knuth multiplicative) — so the
exact same predicate is expressible in ANSI SQL for the DuckDB oracle
(``queries()['sample_documents_stratified']`` ↔ its ``oracle_sql`` entry).
Rate → threshold uses ``round(rate * 2^32)`` once, driver-side; the hot
path compares uint32s.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_KNUTH = np.uint64(2654435761)
_MASK32 = np.uint64(0xFFFFFFFF)


def hash_u32(key: np.ndarray, salt: int = 0) -> np.ndarray:
    """(key * 2654435761 + salt) mod 2^32 on uint64 — SQL-replicable."""
    k = key.astype(np.uint64, copy=False)
    return (k * _KNUTH + np.uint64(salt)) & _MASK32


def shuffle_hash(key: np.ndarray, epoch: int) -> np.ndarray:
    """Order-scrambling epoch hash for deterministic global shuffles:
    ``h1 = (key·2654435761 + epoch) mod 2^32;
    h = ((h1 XOR (h1 // 65536)) · 2654435761) mod 2^32``.
    The xor-shift between the two multiplies is essential: a purely
    additive salt (``hash_u32(key, salt=epoch)``) only SHIFTS every hash
    by a constant, so different epochs would produce the SAME order —
    sampling membership tolerates that; a shuffle does not. Every step is
    ANSI-SQL-expressible (``xor``, ``//``, ``%``)."""
    h1 = hash_u32(key, epoch)
    return ((h1 ^ (h1 >> np.uint64(16))) * _KNUTH) & _MASK32


def threshold_for(rate: float) -> int:
    """Inclusive-exclusive uint32 threshold for a keep-rate in [0, 1]."""
    return min(1 << 32, max(0, int(round(rate * (1 << 32)))))


def deterministic_sample(ds, *, key: str, rate: float, salt: int = 0):
    """Keep each row iff hash(key, salt) < rate·2^32. Pure map, no shuffle."""
    thr = np.uint64(threshold_for(rate))

    def keep(t: pa.Table) -> pa.Table:
        k = t.column(key).to_numpy(zero_copy_only=False)
        return t.filter(pa.array(hash_u32(k, salt) < thr))

    return ds.map_batches(keep, batch_format="pyarrow")


def stratified_sample(
    ds,
    *,
    key: str,
    stratum: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: int = 0,
):
    """Per-stratum keep-rates (mixture weighting): row kept iff
    hash(key, salt) < rates[stratum]·2^32, with ``default_rate`` for strata
    not listed. Vectorized threshold lookup via ``pc.index_in`` against the
    (tiny) rate table — closure-captured, no broadcast needed. Stratum
    values may be strings OR integers (class labels): the lookup array's
    type is inferred and the column cast to it."""
    strata = pa.array(list(rates.keys()))  # type inferred: string or int
    thrs = np.array([threshold_for(r) for r in rates.values()], dtype=np.uint64)
    default_thr = np.uint64(threshold_for(default_rate))

    def keep(t: pa.Table) -> pa.Table:
        k = t.column(key).to_numpy(zero_copy_only=False)
        col = pc.cast(t.column(stratum), strata.type)
        idx = pc.index_in(col, value_set=strata)
        idx_np = idx.to_numpy(zero_copy_only=False)
        miss = np.isnan(idx_np) if idx_np.dtype.kind == "f" else (idx_np < 0)
        safe = np.where(miss, 0, idx_np).astype(np.int64)
        thr = np.where(miss, default_thr, thrs[safe])
        return t.filter(pa.array(hash_u32(k, salt) < thr))

    return ds.map_batches(keep, batch_format="pyarrow")


def train_holdout_split(ds, *, key: str, holdout: float, salt: int = 0):
    """Stable (train, holdout) Dataset pair: a row is in holdout iff
    hash(key, salt) < holdout·2^32. The two datasets partition the input
    exactly and permanently (new data keeps old rows' assignment)."""
    thr = np.uint64(threshold_for(holdout))

    def side(want_holdout: bool):
        def fn(t: pa.Table) -> pa.Table:
            k = t.column(key).to_numpy(zero_copy_only=False)
            m = hash_u32(k, salt) < thr
            return t.filter(pa.array(m if want_holdout else ~m))

        return fn

    return (
        ds.map_batches(side(False), batch_format="pyarrow"),
        ds.map_batches(side(True), batch_format="pyarrow"),
    )


def sample_k_per_group(
    ds, *, key: str, group: str, k: int, salt: int = 0
):
    """Deterministic k-per-group sample: within each group keep the k rows
    with the smallest ``(hash_u32(key), key)`` rank — a reproducible
    "reservoir" that is independent of partitioning and row order (the
    hash IS the random draw, SQL-replicable as
    ``(key*2654435761+salt) % 2^32``).

    Scale shape: the selection is associative — each batch first cuts to
    its local top-k per group (combiner), the single keyed shuffle carries
    ≤ k·|groups in batch| rows, and the per-group merge re-cuts to the
    global k. No global sort.
    """

    def local_topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("_hr", pa.array([], pa.int64())) \
                if "_hr" not in t.column_names else t
        if "_hr" not in t.column_names:
            keys = pc.cast(t.column(key), pa.int64()).combine_chunks() \
                .to_numpy(zero_copy_only=False)
            hr = hash_u32(keys, salt).astype(np.int64)
            t = t.append_column("_hr", pa.array(hr, pa.int64()))
        idx = pc.sort_indices(
            t, sort_keys=[(group, "ascending"), ("_hr", "ascending"),
                          (key, "ascending")],
        )
        t = t.take(idx)
        g = t.column(group).combine_chunks().to_numpy(zero_copy_only=False)
        n = len(g)
        first = np.ones(n, dtype=bool)
        if n > 1:
            first[1:] = g[1:] != g[:-1]
        starts = np.flatnonzero(first)
        rank = np.arange(n, dtype=np.int64) - np.repeat(
            starts, np.diff(np.append(starts, n))
        )
        return t.filter(pa.array(rank < k))

    return (
        ds.map_batches(local_topk, batch_format="pyarrow")
        .groupby(group)
        .map_groups(local_topk, batch_format="pyarrow")
        .drop_columns(["_hr"])
    )


def token_budget_sample(ds, *, budget: int, lang_col: str = "lang",
                        id_col: str = "doc_id", text_col: str = "text",
                        part_span: int = 4096):
    """Per-stratum token-budget sampling: within each ``lang_col`` stratum,
    keep documents in ``id_col`` order while the running token total stays
    ≤ ``budget`` — the "take the first B tokens of each language" cut a
    mixture-weighted training-data pipeline makes (token counts, not doc
    counts, are what LLM data budgets are written in). Tokens =
    ``len(text.split(' '))``, identical to the SQL oracle's
    ``len(string_split(text, ' '))``.

    Scale shape — a textbook two-pass distributed prefix scan (budget
    sampling is sequential per stratum BY DEFINITION; this is the standard
    way to distribute it):

    1. pass A (map + tiny shuffle): per-batch combiner emits
       ``(part = id // part_span, lang, partial token sum)`` rows;
       ``groupby(part, lang).sum`` reduces them to ≤ parts × strata rows —
       the only driver pull, bounded at 10^10 docs / 2^20-span to ~10^4
       rows per stratum, NOT corpus-sized.
    2. driver: exclusive prefix sum of part totals per stratum → broadcast
       the offset dict via ``ray.put``.
    3. pass B (ONE bounded keyed shuffle): ``groupby(part)`` groups are
       capped at ``part_span`` rows regardless of corpus size; inside a
       group the per-stratum cumsum is vectorized (argsort + segment
       cumsum) and each row keeps iff ``offset[part, lang] + local_cum ≤
       budget``.

    → Dataset(doc_id, lang, n_tokens, cum_tokens) — ``cum_tokens`` is the
    stratum-global running total at that row (≤ budget for every kept row).
    """
    import ray
    from ray.data.aggregate import Sum

    span = int(part_span)

    def partials(t: pa.Table) -> pa.Table:
        ids = pc.cast(t.column(id_col), pa.int64()).to_numpy(zero_copy_only=False)
        ntok = np.fromiter(
            (len((x or "").split(" ")) for x in t.column(text_col).to_pylist()),
            dtype=np.int64, count=t.num_rows)
        langs = t.column(lang_col).to_pylist()
        agg: dict[tuple[int, str], int] = {}
        for p, lg, n in zip((ids // span).tolist(), langs, ntok.tolist()):
            agg[(p, lg)] = agg.get((p, lg), 0) + n
        return pa.table({
            "part": pa.array([k[0] for k in agg], pa.int64()),
            lang_col: pa.array([k[1] for k in agg], pa.string()),
            "tok": pa.array(list(agg.values()), pa.int64()),
        })

    part_rows = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(["part", lang_col])
        .aggregate(Sum("tok", alias_name="tok"))
        .take_all()
    )
    part_rows.sort(key=lambda r: (r[lang_col], r["part"]))
    offsets: dict[tuple[int, str], int] = {}
    run: dict[str, int] = {}
    for r in part_rows:
        lg = r[lang_col]
        offsets[(r["part"], lg)] = run.get(lg, 0)
        run[lg] = run.get(lg, 0) + r["tok"]
    off_ref = ray.put(offsets)

    def add_part(t: pa.Table) -> pa.Table:
        ids = pc.cast(t.column(id_col), pa.int64())
        # numpy // (floors) to match the pass-A partials — Arrow's divide
        # truncates toward zero and would split negative ids across passes
        part = ids.to_numpy(zero_copy_only=False) // span
        return pa.table({
            id_col: ids,
            lang_col: pc.cast(t.column(lang_col), pa.string()),
            text_col: t.column(text_col),
            "part": pa.array(part),
        })

    def pick(g: pa.Table) -> pa.Table:
        off = ray.get(off_ref)
        part = int(g.column("part")[0].as_py())
        ids = g.column(id_col).to_numpy(zero_copy_only=False)
        langs = np.asarray(g.column(lang_col).to_pylist(), dtype=object)
        ntok = np.fromiter(
            (len((x or "").split(" ")) for x in g.column(text_col).to_pylist()),
            dtype=np.int64, count=g.num_rows)
        # segment cumsum: sort by (lang, doc_id), cumsum, subtract segment base
        order = np.lexsort((ids, langs))
        sl, st, si = langs[order], ntok[order], ids[order]
        cs = np.cumsum(st)
        seg_first = np.ones(len(sl), dtype=bool)
        seg_first[1:] = sl[1:] != sl[:-1]
        base = np.repeat(cs[np.flatnonzero(seg_first)] - st[np.flatnonzero(seg_first)],
                         np.diff(np.append(np.flatnonzero(seg_first), len(sl))))
        local_cum = cs - base
        glob = local_cum + np.fromiter(
            (off.get((part, lg), 0) for lg in sl), dtype=np.int64, count=len(sl))
        keep = glob <= budget
        return pa.table({
            id_col: pa.array(si[keep]),
            lang_col: pa.array(sl[keep].tolist(), pa.string()),
            "n_tokens": pa.array(st[keep]),
            "cum_tokens": pa.array(glob[keep]),
        })

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pick, batch_format="pyarrow")
    )


def weighted_sample_k(ds, *, key: str, weight: str, k: int, salt: int = 0):
    """Deterministic weighted sampling WITHOUT replacement (priority
    sampling, Duffield–Lund–Thorup / Efraimidis–Spirakis lineage): each
    row gets priority ``weight / (hash_u32(key, salt) + 1)`` and the k
    rows with the LARGEST priority win (ties broken by key ascending).
    Inclusion probability is ∝ weight in expectation over salts, and —
    because the hash IS the random draw — membership is reproducible at
    any parallelism and expressible verbatim in ANSI SQL:
    ``weight / (((key*2654435761 + salt) % 4294967296) + 1)``.

    Bit-exactness of the double: weight (int64 ≤ 2^53) and hash+1
    (≤ 2^32) are both exactly representable, and IEEE-754 division is
    correctly rounded in numpy and DuckDB alike, so the priority column
    hash-matches the SQL oracle bit for bit.

    Scale shape: per-batch local top-k combiner (each block emits ≤ k
    rows), then ONE sort+limit over the ≤ k·num_blocks residue — no
    full-corpus sort, no RNG stream to coordinate. Rows with weight ≤ 0
    are never sampled (guard matches the oracle's WHERE).

    Requires non-negative integer keys < 2^32 (doc ids): numpy's uint64
    wraparound and SQL's ``%`` agree only there.
    → input columns + ``priority`` float64, the k winners.
    """
    kk = int(k)

    def local_topk(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t.column(weight), 0))
        keys = pc.cast(t.column(key), pa.int64()).to_numpy(zero_copy_only=False)
        w = t.column(weight).to_numpy(zero_copy_only=False).astype(np.float64)
        h = hash_u32(keys, salt).astype(np.float64)
        t = t.append_column("priority", pa.array(w / (h + 1.0), pa.float64()))
        if t.num_rows > kk:
            idx = pc.sort_indices(
                t, sort_keys=[("priority", "descending"), (key, "ascending")]
            )
            t = t.take(idx[:kk])
        return t

    return (
        ds.map_batches(local_topk, batch_format="pyarrow")
        .sort(["priority", key], descending=[True, False])
        .limit(kk)
    )


def temperature_upsample(ds, *, stratum: str = "lang", id_col: str = "doc_id",
                         keep_cols: list[str] | None = None):
    """Temperature-balanced mixture upsampling (the multilingual-LLM
    rebalancing step, XLM-R / mT5 lineage, T=2 i.e. q ∝ √p): every stratum
    is replicated by factor √(n_max/n_stratum) ≥ 1, so head strata stay at
    1× and tail strata are upsampled toward balance. Deterministic and
    bit-exact vs a SQL oracle: IEEE-754 `sqrt` is correctly rounded in both
    numpy and DuckDB, the factor's integer part replicates every row, and
    the fractional part replicates rows with
    ``id % 10^6 < floor(frac·10^6)`` — a pure function of the id, no RNG.

    Scale shape: ONE tiny stratum-count shuffle (rows ∝ strata) → broadcast
    factor dict → pure flat-map replication (adds a 1-based ``replica``
    column). Replication multiplies bytes — at 100 TB feed this AFTER
    curation/dedup cut the corpus, or downstream of a rate-capped sample.
    → input columns (or ``keep_cols``) + ``replica`` int64.
    """
    import math

    import ray

    counts = (
        ds.map_batches(_partial_counts(stratum), batch_format="pyarrow")
        .groupby(stratum)
        .sum("_n")
        .take_all()
    )  # bounded: one row per stratum
    if not counts:
        raise ValueError("temperature_upsample: empty input")
    n_by = {r[stratum]: int(r["sum(_n)"]) for r in counts}
    n_max = max(n_by.values())
    factors = {s: math.sqrt(n_max / n) for s, n in n_by.items()}
    fac_ref = ray.put(factors)

    def replicate(t: pa.Table) -> pa.Table:
        fac = ray.get(fac_ref)
        strata = t.column(stratum).to_pylist()
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        f = np.array([fac[s] for s in strata], dtype=np.float64)
        base = np.floor(f).astype(np.int64)
        frac_thr = np.floor((f - np.floor(f)) * 1_000_000).astype(np.int64)
        reps = base + ((ids % 1_000_000) < frac_thr)
        idx = np.repeat(np.arange(len(t)), reps)
        out = t if keep_cols is None else t.select(keep_cols)
        out = out.take(pa.array(idx))
        # 1-based replica index within each source row (generate_series
        # semantics in the oracle)
        ends = np.cumsum(reps)
        replica = np.arange(int(ends[-1]) if len(ends) else 0) - np.repeat(
            ends - reps, reps
        ) + 1
        return out.append_column("replica", pa.array(replica, pa.int64()))

    return ds.map_batches(replicate, batch_format="pyarrow")


def _partial_counts(stratum: str):
    def fn(t: pa.Table) -> pa.Table:
        g = t.select([stratum]).group_by([stratum]).aggregate([([], "count_all")])
        return g.rename_columns([stratum, "_n"])

    return fn


def balanced_sample(ds, *, key: str, stratum: str, salt: int = 0):
    """Class-balanced downsampling: every stratum is kept at rate
    ``n_min / n_stratum`` (hash-thresholded on ``key``), so all strata
    shrink toward the SMALLEST class in expectation — the dataset-balancing
    step before training a classifier on skewed labels (the downsampling
    dual of ``temperature_upsample``).

    Scale shape: ONE tiny stratum-count shuffle (rows ∝ strata, pulled to
    the driver bounded) to derive the rates, then the
    ``stratified_sample`` pure map — membership is a pure function of
    (key, salt) and the stratum counts, reproducible at any parallelism
    and SQL-replicable (window counts + the same threshold arithmetic).
    → the sampled rows, input columns unchanged.
    """
    counts = (
        ds.map_batches(_partial_counts(stratum), batch_format="pyarrow")
        .groupby(stratum)
        .sum("_n")
        .take_all()
    )
    if not counts:
        raise ValueError("balanced_sample: empty input")
    n_by = {r[stratum]: int(r["sum(_n)"]) for r in counts}
    mn = min(n_by.values())
    rates = {s: mn / n for s, n in n_by.items()}
    return stratified_sample(ds, key=key, stratum=stratum, rates=rates,
                             default_rate=0.0, salt=salt)


def split_assign(ds, *, key: str, fractions: dict[str, float], salt: int = 0,
                 out_col: str = "split"):
    """K-way deterministic split (train/val/test and friends): each row gets
    the label of the cumulative-fraction band its ``hash_u32(key, salt)``
    falls in — a pure map, zero shuffle, stable under reprocessing (new
    data never moves old rows between splits, the same permanence contract
    as ``train_holdout_split``). ``fractions`` must sum to 1 (±1e-9); band
    edges use the canonical ``threshold_for`` so the SQL oracle replicates
    them bit-for-bit. Label order follows dict insertion order."""
    labels = list(fractions)
    total = float(sum(fractions.values()))
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split_assign: fractions sum to {total}, not 1")
    cum, edges = 0.0, []
    for lab in labels[:-1]:
        cum += fractions[lab]
        edges.append(np.uint64(threshold_for(cum)))
    edges_arr = np.array(edges, dtype=np.uint64)
    labels_arr = np.array(labels)

    def fn(t: pa.Table) -> pa.Table:
        k = t.column(key).to_numpy(zero_copy_only=False)
        h = hash_u32(k, salt)
        band = np.searchsorted(edges_arr, h, side="right")
        return t.append_column(
            out_col, pa.array(labels_arr[band].tolist(), pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow")
