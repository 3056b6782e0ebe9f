"""Z-order (Morton) data layout: interleave two integer dimensions into one
sort key so that rows close in BOTH dimensions land close on disk.

Why it matters at scale: the sorted sink (`stages/sortedsink.py`) prunes
reads by key range; a 1-D sort can only prune on ONE column. Sorting by the
Morton key makes a 2-D box query prunable too — the box's rows all lie in
``[zkey(x_lo, y_lo), zkey(x_hi, y_hi)]`` (bit interleaving is monotone in
each coordinate), so the range read touches only the overlapping parts and
one exact vectorized filter trims the rest. The classic refinement (BIGMIN /
LITMAX interval splitting, Tropf & Herzog 1981) subdivides that interval to
skip interior gaps; the single-interval form implemented here is the
standard first tier and is already I/O ∝ curve-span, not corpus.

The key itself is a pure vectorized map — magic-mask bit spreading in
uint64, no shuffle; the layout cost is exactly one range-partitioned sort.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# (shift, mask) spreading sequences: after the steps, the value's low bits
# sit at every 2nd bit position. The 16-bit ladder stays under 2^32 at every
# intermediate step, so the SAME arithmetic is expressible in int64 SQL
# (BIGINT shifts never overflow) — keeping the operator SQL-oracle-able.
_SPREAD16 = [(8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333), (1, 0x55555555)]
_SPREAD32 = [
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]


def _spread(v: np.ndarray, bits: int) -> np.ndarray:
    x = v.astype(np.uint64, copy=True)
    steps = _SPREAD16 if bits <= 16 else _SPREAD32
    for sh, mask in steps:
        x = (x | (x << np.uint64(sh))) & np.uint64(mask)
    return x


def zorder_key(x: np.ndarray, y: np.ndarray, *, bits: int = 16) -> np.ndarray:
    """Morton key of two non-negative int arrays, each < 2^bits (bits ≤ 31).
    → int64 array < 2^(2·bits). Raises on out-of-range input — silent
    masking would interleave garbage."""
    if bits > 31:
        raise ValueError("zorder_key: bits must be ≤ 31 (2 dims × 31 + 1 ≤ 63)")
    lim = 1 << bits
    for name, arr in (("x", x), ("y", y)):
        if len(arr) and (arr.min() < 0 or arr.max() >= lim):
            raise ValueError(
                f"zorder_key: {name} outside [0, 2^{bits}) — rescale first"
            )
    return (_spread(x, bits) | (_spread(y, bits) << np.uint64(1))).astype(
        np.int64
    )


def add_zorder_key(ds, x_col: str, y_col: str, *, out_col: str = "zkey",
                   bits: int = 16):
    """Append the Morton key of (x_col, y_col) — a pure map, no shuffle.
    Feed the result to ``write_sorted_partitioned(key_col=out_col)`` for a
    2-D-prunable layout."""

    def fn(t: pa.Table) -> pa.Table:
        x = pc.cast(t.column(x_col), pa.int64()).to_numpy(zero_copy_only=False)
        y = pc.cast(t.column(y_col), pa.int64()).to_numpy(zero_copy_only=False)
        return t.append_column(out_col, pa.array(zorder_key(x, y, bits=bits)))

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=65536)


def zorder_box_range(x_lo: int, x_hi: int, y_lo: int, y_hi: int,
                     *, bits: int = 16) -> tuple[int, int]:
    """The Morton-key interval covering the 2-D box [x_lo,x_hi]×[y_lo,y_hi]
    (inclusive): every box row's key lies inside; interior gap rows are
    removed by the caller's exact filter after the pruned range read."""
    a = zorder_key(np.array([x_lo]), np.array([y_lo]), bits=bits)
    b = zorder_key(np.array([x_hi]), np.array([y_hi]), bits=bits)
    return int(a[0]), int(b[0])
