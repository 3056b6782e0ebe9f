"""Text-analysis batch stages over a documents table: language-ID, quality
scoring, token counting, fingerprinting (engine additions, SURVEY mandate)."""

from __future__ import annotations

import pyarrow as pa

from ..functions.textstats import (
    detect_lang,
    fingerprint,
    quality_features,
    quality_score,
    token_count_bpe,
    token_count_ws,
)


def annotate_text_batch(t: pa.Table, text_col: str = "text") -> pa.Table:
    """One pass per batch → appended columns: detected_lang, quality,
    n_tokens_ws, n_tokens_bpe, fingerprint."""
    texts = [x or "" for x in t.column(text_col).to_pylist()]
    return (
        t.append_column("detected_lang", pa.array([detect_lang(x) for x in texts], pa.string()))
        .append_column("quality", pa.array([quality_score(x) for x in texts], pa.float64()))
        .append_column("n_tokens_ws", pa.array([token_count_ws(x) for x in texts], pa.int64()))
        .append_column("n_tokens_bpe", pa.array([token_count_bpe(x) for x in texts], pa.int64()))
        .append_column(
            "fingerprint",
            pa.array([fingerprint(x) & 0x7FFFFFFFFFFFFFFF for x in texts], pa.int64()),
        )
    )


def quality_features_batch(t: pa.Table, text_col: str = "text") -> pa.Table:
    """Full feature vector per doc (keyed by whatever id columns exist)."""
    texts = [x or "" for x in t.column(text_col).to_pylist()]
    feats = [quality_features(x) for x in texts]
    out = {c: t.column(c) for c in t.column_names if c != text_col}
    if feats:
        for key in feats[0]:
            out[key] = pa.array([f[key] for f in feats], pa.float64())
    return pa.table(out)


def annotate_documents(ds, text_col: str = "text"):
    import functools

    return ds.map_batches(
        functools.partial(annotate_text_batch, text_col=text_col),
        batch_format="pyarrow",
    )
