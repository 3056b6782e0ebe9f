"""Distributed exact quantiles — histogram method.

The reference has no percentile/quantile operator anywhere (its only order
statistics are the wordlist sort, ``mainWordlist.go:96``, and the report's
full sorts); a large-scale training-data pipeline needs distribution stats
(doc-length percentiles for quality cuts, price/value percentiles for
outlier fences) without a global sort.

Scale shape: quantiles over a column with BOUNDED DISTINCT CARDINALITY
(integer cents, character counts, token counts — the usual cases) reduce to
a distributed histogram: each batch emits partial ``(value, count)`` rows
(``pyarrow.Table.group_by`` inside ``map_batches`` — a combiner, so the
shuffle carries at most |distinct| rows per block, not the data), ONE small
``groupby(value).sum`` shuffle merges them, and the driver does a cumsum
over the |distinct|-row result to pick order statistics. No global sort, no
full materialization; driver memory is O(|distinct values|) — document that
assumption at call sites (for truly continuous doubles, bucket to fixed
precision first, which is what the cents policy already does).

Order-statistic rule matches DuckDB ``quantile_disc``: the k-th smallest
element with ``k = max(1, ceil(q * n))`` (verified against DuckDB 1.x in
tests) — so these results are SQL-oracle-able bit-for-bit.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _partial_hist(value_col: str, by_col: str | None):
    """Per-batch combiner: (by?, value) → partial count."""

    def fn(t: pa.Table) -> pa.Table:
        keys = [by_col, value_col] if by_col else [value_col]
        g = t.select(keys).group_by(keys).aggregate([([], "count_all")])
        return g.rename_columns(keys + ["_cnt"])

    return fn


def _default_qname(q: float) -> str:
    """Numeric column name for quantile q: p25, p50, p100; non-integral
    percents keep their digits with '.'→'_' (0.999 → p99_9). String-munging
    str(q) mangled edge cases (1.0 → 'p1.0', 0.999 → 'p999' — ADVICE r2)."""
    v = q * 100.0
    if abs(v - round(v)) < 1e-9:
        return f"p{int(round(v)):02d}"
    return "p" + f"{v:.6f}".rstrip("0").rstrip(".").replace(".", "_")


def _pick(values: np.ndarray, counts: np.ndarray, qs: list[float]) -> list:
    """Order statistics from a sorted (value, count) histogram —
    quantile_disc semantics: k-th smallest, k = max(1, ceil(q*n))."""
    order = np.argsort(values, kind="stable")
    values, counts = values[order], counts[order]
    cum = np.cumsum(counts)
    n = int(cum[-1])
    out = []
    for q in qs:
        k = max(1, math.ceil(q * n))
        out.append(values[int(np.searchsorted(cum, k, side="left"))])
    return out


def exact_quantiles(
    ds,
    value_col: str,
    qs: list[float],
    *,
    by_col: str | None = None,
    out_names: list[str] | None = None,
) -> pa.Table:
    """Exact discrete quantiles of ``value_col`` (optionally per ``by_col``
    group). Returns a SMALL driver-side Arrow table — one row (or one row
    per group) with one column per quantile, named ``out_names`` (default
    ``p25``-style from ``qs``).

    Driver memory is O(distinct values × groups); see module docstring.
    """
    if out_names is None:
        out_names = [_default_qname(q) for q in qs]

    hist = (
        ds.map_batches(_partial_hist(value_col, by_col), batch_format="pyarrow")
        .groupby([by_col, value_col] if by_col else value_col)
        .sum("_cnt")
    )
    df = hist.to_pandas()  # |distinct values| rows — small by assumption
    cnt_col = "sum(_cnt)"
    if by_col is None:
        picked = _pick(df[value_col].to_numpy(), df[cnt_col].to_numpy(), qs)
        return pa.table({n: pa.array([v]) for n, v in zip(out_names, picked)})

    rows: dict[str, list] = {by_col: []}
    for n in out_names:
        rows[n] = []
    for key, grp in df.groupby(by_col, sort=True):
        picked = _pick(
            grp[value_col].to_numpy(), grp[cnt_col].to_numpy(), qs
        )
        rows[by_col].append(key)
        for n, v in zip(out_names, picked):
            rows[n].append(v)
    return pa.table({k: pa.array(v) for k, v in rows.items()})


def fixed_width_histogram(
    ds,
    value_col: str,
    *,
    bucket_cents: int,
    scale: float = 100.0,
):
    """Fixed-width histogram over a price-like double column: bucket id =
    ``round(value·scale) // bucket_cents`` on integer cents (float policy per
    SURVEY §3.4, so the result is SQL-oracle-able bit-for-bit:
    ``CAST(round(v*100) AS BIGINT) // bucket_cents``).

    Scale shape: the same combiner as the quantile histogram — each batch
    pre-buckets locally and emits at most |occupied buckets| partial rows,
    then ONE tiny ``groupby(bucket).sum`` shuffle. The exchange volume is
    bounded by bucket count × blocks, independent of row count.
    → Dataset(bucket, n).
    """

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(pc.cast(t.column(value_col), pa.float64()), scale)),
            pa.int64(),
        )
        b = np.floor_divide(
            cents.combine_chunks().to_numpy(zero_copy_only=False), bucket_cents
        )
        vals, counts = np.unique(b, return_counts=True)
        return pa.table({
            "bucket": pa.array(vals, pa.int64()),
            "n": pa.array(counts.astype(np.int64)),
        })

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .sum("n")
        .map_batches(
            lambda t: t.rename_columns(["bucket", "n"]), batch_format="pyarrow"
        )
    )


def percentile_rank(ds, value_col: str, *, out_col: str = "pct_rank",
                    keep_cols: list[str] | None = None):
    """Global percentile rank per row — SQL ``percent_rank() OVER (ORDER BY
    value_col)`` = (#rows strictly smaller) / (n − 1) — WITHOUT a global
    sort. The normalization pass a quality-score → percentile curation
    filter needs.

    Scale shape: pass 1 builds the exact value-count histogram (per-batch
    ``group_by(value).count`` combiner → ONE groupby(value) shuffle — rows
    ∝ distinct values, which for discrete scores/lengths is ≪ corpus);
    the sorted histogram's exclusive cumulative counts are broadcast once
    (``ray.put``); pass 2 is a pure vectorized ``searchsorted`` map. The
    single rank/(n−1) float division is deterministic, so output is
    bit-exact at any partitioning and hash-comparable to the SQL oracle.

    Caveat (documented): the broadcast CDF is |distinct values| entries —
    right for discrete columns (lengths, scores, buckets, prices in cents);
    for high-cardinality floats quantize first or use exact_quantiles.
    → input columns (or ``keep_cols``) + ``out_col`` float64.
    """
    import ray

    hist_rows = (
        ds.map_batches(_partial_hist(value_col, None), batch_format="pyarrow")
        .groupby(value_col)
        .sum("_cnt")
        .take_all()
    )  # bounded: |distinct values| rows
    if not hist_rows:
        raise ValueError(f"percentile_rank: no rows in {value_col!r}")
    values = np.array([r[value_col] for r in hist_rows])
    counts = np.array([r["sum(_cnt)"] for r in hist_rows], dtype=np.int64)
    order = np.argsort(values, kind="stable")
    values, counts = values[order], counts[order]
    below = np.concatenate([[0], np.cumsum(counts)[:-1]])  # exclusive cumsum
    n = int(counts.sum())
    cdf_ref = ray.put((values, below, n))

    def rank_map(t: pa.Table) -> pa.Table:
        vals, blw, total = ray.get(cdf_ref)
        x = t.column(value_col).to_numpy(zero_copy_only=False)
        idx = np.searchsorted(vals, x, side="left")
        pr = blw[idx] / (total - 1) if total > 1 else np.zeros(len(x))
        if keep_cols is not None:
            t = t.select(keep_cols)
        return t.append_column(out_col, pa.array(pr, pa.float64()))

    return ds.map_batches(rank_map, batch_format="pyarrow")


def exact_quantiles_wide(
    ds,
    value_col: str,
    qs: list[float],
    *,
    out_names: list[str] | None = None,
    max_buckets: int = 65536,
    max_passes: int = 8,
) -> pa.Table:
    """Exact discrete quantiles over an int64 column of UNBOUNDED distinct
    cardinality — the scale path where ``exact_quantiles``'s
    O(|distinct|) histogram does not fit (raw hashes, byte offsets,
    timestamps; floats: quantize first, per the repo's float policy).

    Distributed histogram-narrowing (binary search by bucketed counts):
    each pass scans once, bucketing only rows inside the still-active
    value intervals into ≤ ``max_buckets`` equal-width buckets per
    interval (a per-batch combiner → ONE tiny groupby; exchange rows ∝
    buckets × blocks, never data), then narrows each quantile's interval
    to the bucket containing its order statistic and rebases its rank.
    Intervals shrink ≥ ``max_buckets``× per pass, so int64 needs at most
    ⌈64/log2(max_buckets)⌉ = 4 passes; a final exact in-interval
    histogram (≤ max_buckets distinct values by construction) picks the
    value. Same ``quantile_disc`` order-statistic rule as
    ``exact_quantiles`` (k = max(1, ceil(q·n))) — SQL-oracle-able
    bit-for-bit. Driver memory: O(qs × max_buckets).
    """
    if out_names is None:
        out_names = [_default_qname(q) for q in qs]
    return _quantiles_wide_core(
        ds, value_col, None,
        lambda q, n: max(1, math.ceil(q * n)), qs, out_names,
        max_buckets, max_passes,
    )


def weighted_quantiles_wide(
    ds,
    value_col: str,
    weight_col: str,
    qs: list[tuple[int, int]],
    *,
    out_names: list[str],
    max_buckets: int = 65536,
    max_passes: int = 8,
) -> pa.Table:
    """Exact WEIGHTED discrete quantiles over an int64 column of unbounded
    cardinality: the smallest value v with ``cumweight(≤v) ≥ ⌈(num/den)·W⌉``
    for each rational quantile ``(num, den)`` (W = total weight). Rational
    targets keep the rank integer-exact at any W (float ``q·W`` is unsafe
    past 2^53 — this function exists for exactly that regime). Weights must
    be non-negative int64 (validated in the stats pass); zero-weight values
    are never selected. SQL oracle (peers-inclusive RANGE cumsum)::

        SELECT min(v) FROM (SELECT v, sum(w) OVER (ORDER BY v) cw FROM t)
        WHERE den * cw >= num * (SELECT sum(w) FROM t)

    Same distributed histogram-narrowing core as ``exact_quantiles_wide``,
    with per-bucket weight SUMS (int64-exact ``np.add.at``) instead of
    counts — exchange rows ∝ buckets × blocks, never data.
    """

    def k_of(q: tuple[int, int], total_w: int) -> int:
        num, den = q
        return max(1, -(-num * total_w // den))

    return _quantiles_wide_core(
        ds, value_col, weight_col, k_of, qs, out_names, max_buckets, max_passes
    )


def _quantiles_wide_core(
    ds,
    value_col: str,
    weight_col: str | None,
    k_of,
    qs: list,
    out_names: list[str],
    max_buckets: int,
    max_passes: int,
) -> pa.Table:
    # pass 0: total (row count or weight sum), min, max — three scalars.
    # With weights: rows where value OR weight is null are dropped jointly,
    # and min weight is folded so the driver can reject negatives.
    def minmax(t: pa.Table) -> pa.Table:
        v = pc.cast(t.column(value_col), pa.int64())
        if weight_col is None:
            n = len(v) - v.null_count
            wmin = 1
        else:
            w = pc.cast(t.column(weight_col), pa.int64())
            mask = pc.and_(pc.is_valid(v), pc.is_valid(w))
            v = pc.filter(v, mask)
            wv = pc.filter(w, mask)
            n = pc.sum(wv).as_py() or 0
            wmin = pc.min(wv).as_py() if len(wv) else None
        return pa.table({
            "_lo": pa.array([pc.min(v).as_py()], pa.int64()),
            "_hi": pa.array([pc.max(v).as_py()], pa.int64()),
            "_n": pa.array([n], pa.int64()),
            "_wmin": pa.array([wmin], pa.int64()),
        })

    import ray as _ray

    parts = _ray.get([r for r in ds.map_batches(
        minmax, batch_format="pyarrow").to_arrow_refs()])
    los = [p.column("_lo")[0].as_py() for p in parts if p.num_rows]
    his = [p.column("_hi")[0].as_py() for p in parts if p.num_rows]
    n = sum(p.column("_n")[0].as_py() for p in parts if p.num_rows)
    wmins = [p.column("_wmin")[0].as_py() for p in parts if p.num_rows]
    if any(w is not None and w < 0 for w in wmins):
        raise ValueError(f"weighted quantiles: negative weight in {weight_col!r}")
    # all-null blocks contribute None min/max — drop before folding
    los = [x for x in los if x is not None]
    his = [x for x in his if x is not None]
    if not n or not los:
        raise ValueError(f"quantiles_wide: no rows in {value_col!r}")
    lo, hi = min(los), max(his)

    # per-quantile state: target rank k (1-based) within [lo, hi]. lo/hi
    # stay PYTHON ints end-to-end: the full int64 hash domain spans more
    # than 2^63, so interval arithmetic in np.int64 would overflow
    states = [{"k": k_of(q, n), "lo": int(lo), "hi": int(hi),
               "done": None} for q in qs]

    for _ in range(max_passes):
        active = [s for s in states if s["done"] is None]
        if not active:
            break
        # dedup identical intervals (common: all qs start at [lo, hi])
        ivals = sorted({(s["lo"], s["hi"]) for s in active})
        widths = []
        for a, b in ivals:
            span = int(b) - int(a) + 1  # exact: Python ints, no np overflow
            widths.append(max(1, -(-span // max_buckets)))
        iv_ref = _ray.put((ivals, widths))

        def bucket_counts(t: pa.Table) -> pa.Table:
            iv, w = _ray.get(iv_ref)
            # null filtering at the Arrow level: a null-bearing int64 column
            # otherwise converts via float64 and corrupts values > 2^53
            # (the stages/joins.py ADVICE-r2 hazard)
            v_arr = pc.cast(t.column(value_col), pa.int64())
            if weight_col is None:
                v = pc.drop_null(v_arr).to_numpy(zero_copy_only=False)
                wt = None
            else:
                w_arr = pc.cast(t.column(weight_col), pa.int64())
                mask = pc.and_(pc.is_valid(v_arr), pc.is_valid(w_arr))
                v = pc.filter(v_arr, mask).to_numpy(zero_copy_only=False)
                wt = pc.filter(w_arr, mask).to_numpy(zero_copy_only=False)
            out_i, out_b, out_c = [], [], []
            for i, ((a, b), wd) in enumerate(zip(iv, w)):
                m = (v >= a) & (v <= b)
                sel = v[m]
                if not len(sel):
                    continue
                # subtract in uint64 (two's complement): sel - a overflows
                # int64 whenever the interval spans more than 2^63 — the
                # full-hash-domain case this function exists for. The true
                # difference is < 2^64, so the mod-2^64 result is exact.
                diff = (sel.astype(np.uint64)
                        - np.uint64(int(a) % (1 << 64)))
                bk = (diff // np.uint64(wd)).astype(np.int64)
                if wt is None:
                    vals, cnts = np.unique(bk, return_counts=True)
                else:
                    vals, inv = np.unique(bk, return_inverse=True)
                    cnts = np.zeros(len(vals), dtype=np.int64)
                    np.add.at(cnts, inv, wt[m])  # int64-exact weight sums
                out_i.extend([i] * len(vals))
                out_b.extend(vals.tolist())
                out_c.extend(cnts.astype(np.int64).tolist())
            return pa.table({
                "_iv": pa.array(out_i, pa.int64()),
                "_b": pa.array(out_b, pa.int64()),
                "_c": pa.array(out_c, pa.int64()),
            })

        partials = ds.map_batches(bucket_counts, batch_format="pyarrow")
        if max_buckets <= 65536:
            hist = _merge_hist_partials(
                _ray.get(partials.to_arrow_refs()))
        else:  # unbounded-bucket callers: keep the keyed shuffle
            hist = {}
            for r in partials.groupby(["_iv", "_b"]).sum("_c").take_all():
                hist.setdefault(r["_iv"], {})[r["_b"]] = r["sum(_c)"]
        for s in active:
            i = ivals.index((s["lo"], s["hi"]))
            wd = widths[i]
            h = hist.get(i, {})
            run = 0
            for b in sorted(h):
                if run + h[b] >= s["k"]:
                    s["k"] -= run  # rebase rank inside the bucket
                    s["lo"], s["hi"] = (s["lo"] + b * wd,
                                        min(s["hi"], s["lo"] + (b + 1) * wd - 1))
                    break
                run += h[b]
            else:  # pragma: no cover — counts sum < k is impossible
                raise AssertionError("rank fell outside histogram")
            if wd == 1:
                s["done"] = s["lo"]
    if any(s["done"] is None for s in states):  # pragma: no cover
        raise AssertionError("quantile intervals did not converge")
    return pa.table({
        name: pa.array([s["done"]], pa.int64())
        for name, s in zip(out_names, states)
    })



def _merge_hist_partials(parts) -> dict:
    """Merge per-block (interval, bucket, count) partial tables into
    {interval: {bucket: count}} ON THE DRIVER, vectorized (one np.unique
    over packed keys). Per-block partials are already np.unique-combined,
    so total volume is ≤ blocks × intervals × max_buckets rows of 3 ints —
    for the ≤2^16-bucket regime this is a trivially small collect, and it
    replaces a whole Ray groupby round per narrowing pass (the per-round
    shuffle overhead dominated the data at bench scale: ~1 s/round for
    ~10^5 rows)."""
    ivs, bs, cs = [], [], []
    for p in parts:
        if p.num_rows:
            ivs.append(p.column("_iv").to_numpy(zero_copy_only=False))
            bs.append(p.column("_b").to_numpy(zero_copy_only=False))
            cs.append(p.column("_c").to_numpy(zero_copy_only=False))
    hist: dict[int, dict[int, int]] = {}
    if not ivs:
        return hist
    iv = np.concatenate(ivs)
    b = np.concatenate(bs)
    c = np.concatenate(cs)
    key = iv * np.int64(1 << 40) + b  # bucket < 2^40 in the gated regime
    uk, inv = np.unique(key, return_inverse=True)
    cc = np.zeros(len(uk), dtype=np.int64)
    np.add.at(cc, inv, c)
    u_iv = (uk >> np.int64(40)).astype(np.int64)
    u_b = (uk & np.int64((1 << 40) - 1)).astype(np.int64)
    for i, bb, n in zip(u_iv.tolist(), u_b.tolist(), cc.tolist()):
        hist.setdefault(i, {})[bb] = n
    return hist


def exact_quantiles_wide_by(
    ds,
    value_col: str,
    qs: list[float],
    *,
    by_col: str,
    out_names: list[str] | None = None,
    max_buckets: int = 65536,
    max_passes: int = 8,
    weight_col: str | None = None,
) -> pa.Table:
    """Per-group exact quantiles over an int64 column of UNBOUNDED distinct
    cardinality — the GROUP BY form of :func:`exact_quantiles_wide` (the
    grouped histogram of :func:`exact_quantiles` needs bounded distinct
    values; this needs only bounded GROUPS). Same histogram-narrowing
    search run for every (group, quantile) simultaneously: each pass is
    ONE scan whose combiner emits (group, interval, bucket, count) rows —
    exchange ∝ groups × buckets × blocks, never data. Driver state is
    O(groups × qs). Groups must be modest in number (the usual GROUP BY
    contract — languages, sources, shards); same quantile_disc rule,
    SQL-oracle-able. → Table(by_col, *out_names) sorted by group.

    With ``weight_col`` (non-negative int64): WEIGHTED per-group quantiles —
    qs must then be rational ``(num, den)`` tuples and the target is the
    smallest v with ``cumweight(≤v) ≥ ⌈(num/den)·W_g⌉`` (integer-exact at
    any W; see ``weighted_quantiles_wide``). Bucket histograms sum weights
    (int64-exact) instead of counts.
    """
    if out_names is None:
        out_names = [_default_qname(q) for q in qs]

    import ray as _ray

    # pass 0: per-group total (count or weight sum) / min / max via one
    # combiner + tiny groupby
    def minmax(t: pa.Table) -> pa.Table:
        if weight_col is None:
            g = (t.select([by_col, value_col])
                 .group_by(by_col)
                 .aggregate([(value_col, "min"), (value_col, "max"),
                             (value_col, "count")]))
            return g.rename_columns([by_col, "_lo", "_hi", "_n"])
        sel = t.select([by_col, value_col, weight_col]).drop_null()
        wmin = pc.min(sel.column(weight_col)).as_py()
        if wmin is not None and wmin < 0:
            raise ValueError(
                f"weighted quantiles: negative weight in {weight_col!r}")
        g = (sel.group_by(by_col)
             .aggregate([(value_col, "min"), (value_col, "max"),
                         (weight_col, "sum")]))
        return g.rename_columns([by_col, "_lo", "_hi", "_n"])

    from ray.data.aggregate import Max, Min, Sum

    grows = (
        ds.map_batches(minmax, batch_format="pyarrow")
        .groupby(by_col)
        .aggregate(Min("_lo", alias_name="_lo"),
                   Max("_hi", alias_name="_hi"),
                   Sum("_n", alias_name="_n"))
        .take_all()
    )
    if not grows:
        raise ValueError(f"exact_quantiles_wide_by: no rows in {value_col!r}")
    # states: one narrowing search per (group, quantile)
    states = []
    for r in grows:
        for q in qs:
            if weight_col is None:
                k = max(1, math.ceil(q * r["_n"]))
            else:
                num, den = q
                k = max(1, -(-num * int(r["_n"]) // den))
            states.append({
                "g": r[by_col], "q": q,
                "k": k,
                "lo": int(r["_lo"]), "hi": int(r["_hi"]), "done": None,
            })

    for _ in range(max_passes):
        active = [s for s in states if s["done"] is None]
        if not active:
            break
        ivals = sorted({(s["g"], s["lo"], s["hi"]) for s in active})
        widths = [max(1, -(-(int(b) - int(a) + 1) // max_buckets))
                  for _, a, b in ivals]
        iv_ref = _ray.put((ivals, widths))

        def bucket_counts(t: pa.Table) -> pa.Table:
            iv, w = _ray.get(iv_ref)
            # row-level null filter FIRST: dropping nulls from the value
            # column alone would misalign it with the group column (and a
            # numpy conversion with nulls rides float64 — the joins.py
            # hazard)
            if weight_col is None:
                if t.column(value_col).null_count:
                    t = t.filter(pc.is_valid(t.column(value_col)))
                wv = None
            else:
                t = t.select([by_col, value_col, weight_col]).drop_null()
                wv = pc.cast(t.column(weight_col), pa.int64()).to_numpy(
                    zero_copy_only=False)
            # group codes via the Arrow dictionary-encode kernel (the old
            # per-row Python loop building rows_by_g dominated the stage —
            # ~3-5 s over the narrowing passes at sf0.1); per-interval
            # selection is then one vectorized mask on the code array
            enc = pc.dictionary_encode(
                t.column(by_col).combine_chunks())
            codes = enc.indices.to_numpy(zero_copy_only=False)
            code_of = {v: j for j, v in enumerate(
                enc.dictionary.to_pylist())}
            vv = pc.cast(t.column(value_col), pa.int64()).to_numpy(
                zero_copy_only=False)
            out_i, out_b, out_c = [], [], []
            for i, ((gval, a, b), wd) in enumerate(zip(iv, w)):
                gcode = code_of.get(gval)
                if gcode is None:
                    continue
                gi = np.nonzero(codes == gcode)[0]
                if not len(gi):
                    continue
                sel = vv[gi]
                m = (sel >= a) & (sel <= b)
                sel = sel[m]
                if not len(sel):
                    continue
                diff = (sel.astype(np.uint64)
                        - np.uint64(int(a) % (1 << 64)))
                bk = (diff // np.uint64(wd)).astype(np.int64)
                if wv is None:
                    vals, cnts = np.unique(bk, return_counts=True)
                else:
                    vals, inv = np.unique(bk, return_inverse=True)
                    cnts = np.zeros(len(vals), dtype=np.int64)
                    np.add.at(cnts, inv, wv[gi][m])
                out_i.extend([i] * len(vals))
                out_b.extend(vals.tolist())
                out_c.extend(cnts.astype(np.int64).tolist())
            return pa.table({
                "_iv": pa.array(out_i, pa.int64()),
                "_b": pa.array(out_b, pa.int64()),
                "_c": pa.array(out_c, pa.int64()),
            })

        partials = ds.map_batches(bucket_counts, batch_format="pyarrow")
        if max_buckets <= 65536:
            # bounded-bucket regime: vectorized driver merge — replaces a
            # whole Ray groupby round per pass (see _merge_hist_partials)
            hist = _merge_hist_partials(_ray.get(partials.to_arrow_refs()))
        else:
            hist = {}
            for r in partials.groupby(["_iv", "_b"]).sum("_c").take_all():
                hist.setdefault(r["_iv"], {})[r["_b"]] = r["sum(_c)"]
        for s in active:
            i = ivals.index((s["g"], s["lo"], s["hi"]))
            wd = widths[i]
            h = hist.get(i, {})
            run = 0
            for b in sorted(h):
                if run + h[b] >= s["k"]:
                    s["k"] -= run
                    s["lo"], s["hi"] = (s["lo"] + b * wd,
                                        min(s["hi"],
                                            s["lo"] + (b + 1) * wd - 1))
                    break
                run += h[b]
            else:  # pragma: no cover
                raise AssertionError("rank fell outside histogram")
            if wd == 1:
                s["done"] = s["lo"]
    if any(s["done"] is None for s in states):  # pragma: no cover
        raise AssertionError("quantile intervals did not converge")
    by_g: dict = {}
    for s in states:
        by_g.setdefault(s["g"], {})[s["q"]] = s["done"]
    keys = sorted(by_g)
    cols = {by_col: pa.array(keys)}
    for name, q in zip(out_names, qs):
        cols[name] = pa.array([by_g[g][q] for g in keys], pa.int64())
    return pa.table(cols)


def equidepth_histogram(ds, value_col: str, *, n_buckets: int,
                        max_buckets: int = 65536) -> "object":
    """Equi-depth (equal-frequency) histogram — the DB-statistics workhorse:
    bucket edges are the i/n_buckets exact discrete quantiles
    (quantile_disc rule, via the multi-pass histogram narrowing of
    :func:`exact_quantiles_wide`, so unbounded value cardinality is fine),
    and each row's bucket is the count of edges strictly below its value
    (``searchsorted left`` ≡ SQL ``len(list_filter(edges, e -> e < v))``).
    Heavy ties can leave interior buckets empty — they are emitted with
    n = 0 so the output always has exactly ``n_buckets`` rows.

    Scale shape: the narrowing passes are each ONE combiner scan; the
    final count pass is a per-batch bincount + one n_buckets-row shuffle.
    → Dataset ``(bucket, n)``, bucket-ascending.
    """
    qs = [i / n_buckets for i in range(1, n_buckets)]
    edges_t = exact_quantiles_wide(ds, value_col, qs,
                                   out_names=[f"e{i}" for i in range(1, n_buckets)],
                                   max_buckets=max_buckets)
    edges = np.array([edges_t.column(f"e{i}")[0].as_py()
                      for i in range(1, n_buckets)], dtype=np.int64)

    def counts(t: pa.Table) -> pa.Table:
        v = pc.drop_null(
            pc.cast(t.column(value_col), pa.int64())
        ).to_numpy(zero_copy_only=False)
        b = np.searchsorted(edges, v, side="left")
        cnt = np.bincount(b, minlength=n_buckets).astype(np.int64)
        return pa.table({
            "bucket": pa.array(np.arange(n_buckets, dtype=np.int64)),
            "n": pa.array(cnt),
        })

    return (
        ds.map_batches(counts, batch_format="pyarrow")
        .groupby("bucket")
        .sum("n")
        .map_batches(
            lambda t: t.rename_columns(["bucket", "n"]),
            batch_format="pyarrow",
        )
        .sort("bucket")
    )
