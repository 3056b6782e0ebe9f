"""Deterministic fuzz-payload generator (the reference's ``fuzzer`` tool).

Parity: grammar walk of ``genFuzzingOutput`` at
``/root/reference/mainFuzzer.go:87-118`` — for each of ``iterations``, emit the
concatenation over ``build_logic`` characters of (a random vector from the
char's vector class, or the literal char when the class is unknown); encoders
``NoEncode``/``UrlEncode``/``HtmlEncode`` at ``mainFuzzer.go:73-83`` (the
reference only wires ``NoEncode``, ``mainFuzzer.go:41``).

Documented deviation (SURVEY §7 hard part M19/T8): the reference consumes one
sequential Go ``math/rand`` stream seeded once (``rand.Seed(fi.Seed)``),
which is neither reproducible from Python nor parallelizable. The engine pins
**per-index seeding**: iteration ``i`` uses ``random.Random(hash64(f"{seed}:{i}"))``,
making every payload independent of execution order and partitioning — the
same-seed ⇒ same-payloads contract holds at any parallelism.
"""

from __future__ import annotations

import html
import random
from urllib.parse import quote_plus

from .urlnorm import hash64

ENCODERS = {
    "none": lambda s: s,  # NoEncode, mainFuzzer.go:77-79
    "url": quote_plus,  # UrlEncode, mainFuzzer.go:73-75
    "html": html.escape,  # HtmlEncode, mainFuzzer.go:81-83
}


def gen_payload(
    vectors: dict[str, list[str]],
    build_logic: str,
    seed: int,
    index: int,
    encoder: str = "none",
) -> str:
    """Payload for iteration ``index`` — pure function of (config, index)."""
    rng = random.Random(hash64(f"{seed}:{index}"))
    enc = ENCODERS[encoder]
    parts: list[str] = []
    for ch in build_logic:
        vecs = vectors.get(ch)
        parts.append(enc(rng.choice(vecs)) if vecs else enc(ch))
    return "".join(parts)


def gen_payloads(
    vectors: dict[str, list[str]],
    build_logic: str,
    seed: int,
    iterations: int,
    encoder: str = "none",
) -> list[str]:
    """All ``iterations`` payloads, in index order (serial-oracle form)."""
    return [
        gen_payload(vectors, build_logic, seed, i, encoder) for i in range(iterations)
    ]
