"""The ``wordlist`` tool — file tree → regex extract → mutate → template →
distinct → sort → one word per line.

Reference lifecycle (``/root/reference/mainWordlist.go``): walk + read files
(:155-186), extractor dispatch (:188-216), normalize lower/trim (:165-175),
mutator registry (:106-122), template × word expansion + final dedup (:69-86),
sorted write with blank lines dropped (:88-104). The engine expresses it as a
stateless Dataset pipeline (SURVEY §3.3): ``read_binary_files`` → flat-map
extract → flat-map mutate → flat-map template → ``unique`` (shuffle distinct)
→ ``sort`` → text sink.
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray

from ..functions.extractors import expand_template, extract, normalize_word
from ..functions.mutators import MUTATORS
from ..util import distinct


def _file_label(path: str, input_root: str | None) -> str:
    # the reference labels with the walked path as-is (mainWordlist.go:170-172)
    return path if input_root is None else os.path.relpath(path, input_root)


def extract_words_batch(
    batch: pa.Table, *, extractor: str, show_file_name: bool, input_root: str | None
) -> pa.Table:
    """Batch flat-map: (path, bytes) → (word) rows, extractor + normalize +
    optional `` [filename]`` suffix. Stateless (regexes are module-compiled)
    → task pool, not actors: elastic and deadlock-free at any session size."""
    words: list[str] = []
    for path, data in zip(
        batch.column("path").to_pylist(), batch.column("bytes").to_pylist()
    ):
        text = bytes(data).decode("utf-8", "replace")
        label = _file_label(path, input_root) if show_file_name else ""
        for w in extract(text, extractor):
            words.append(normalize_word(w, label))
    return pa.table({"word": pa.array(words, pa.string())})


def _mutate_batch(t: pa.Table, mutator_name: str) -> pa.Table:
    fn = MUTATORS[mutator_name]
    out: list[str] = []
    for w in t.column("word").to_pylist():
        out.extend(fn(w))
    return pa.table({"word": pa.array(out, pa.string())})


def _template_batch(t: pa.Table, templates: list[str]) -> pa.Table:
    out: list[str] = []
    for w in t.column("word").to_pylist():
        for tpl in templates:
            out.append(expand_template(tpl, w))
    return pa.table({"word": pa.array(out, pa.string())})


def build_wordlist(
    input_dir: str,
    *,
    extractor: str = "word",
    mutator: str = "",
    template_file: str | None = None,
    show_file_name: bool = False,
):
    """→ sorted distinct Dataset of ``word`` (blank rows dropped)."""
    templates = ["<word>"]  # default template, mainWordlist.go:70
    if template_file:
        with open(template_file) as f:
            templates = f.read().split("\n")
    import functools

    ds = ray.data.read_binary_files(input_dir, include_paths=True)
    ds = ds.map_batches(
        functools.partial(
            extract_words_batch,
            extractor=extractor,
            show_file_name=show_file_name,
            input_root=None,
        ),
        batch_format="pyarrow",
    )
    if mutator:
        # dedup BEFORE mutating, matching permute-over-set semantics
        ds = distinct(ds, "word")
        ds = ds.map_batches(
            lambda t: _mutate_batch(t, mutator), batch_format="pyarrow"
        )
    ds = ds.map_batches(
        lambda t: _template_batch(t, templates), batch_format="pyarrow"
    )
    ds = ds.map_batches(
        lambda t: t.filter(pa.compute.not_equal(pa.compute.utf8_trim_whitespace(t.column("word")), "")),
        batch_format="pyarrow",
    )
    return distinct(ds, "word").sort("word")


def write_wordlist(ds, path: str) -> int:
    """One word per line, global sorted order (mainWordlist.go:88-104)."""
    n = 0
    with open(path, "w") as f:
        for b in ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
            col = b.column("word").to_pylist()
            for w in col:
                f.write(w + "\n")
            n += len(col)
    return n


def wordlist_oracle(
    input_dir: str,
    *,
    extractor: str = "word",
    mutator: str = "",
    template_file: str | None = None,
    show_file_name: bool = False,
) -> list[str]:
    """Serial oracle: the reference algorithm with plain sets (for tests)."""
    from ..functions.mutators import permute

    templates = ["<word>"]
    if template_file:
        with open(template_file) as f:
            templates = f.read().split("\n")
    words: set[str] = set()
    for root, _dirs, files in sorted(os.walk(input_dir)):
        for fn in sorted(files):
            p = os.path.join(root, fn)
            text = open(p, "rb").read().decode("utf-8", "replace")
            label = p if show_file_name else ""
            for w in extract(text, extractor):
                words.add(normalize_word(w, label))
    words = permute(words, mutator)
    final: set[str] = set()
    for tpl in templates:
        for w in words:
            final.add(expand_template(tpl, w))
    return sorted(w for w in final if w.strip())
