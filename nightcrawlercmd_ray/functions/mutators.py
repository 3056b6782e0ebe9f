"""Mutator registry — the reference's ``MutatorFunc`` extension surface.

Parity: registry ``mutators["username"]`` at ``/root/reference/mainWordlist.go:15,24,57``;
``usernameMutator`` semantics at ``mainWordlist.go:124-153``; ``permute`` (apply
mutator to every word, union results) at ``mainWordlist.go:106-122``.
"""

from __future__ import annotations

import re
from collections.abc import Callable

MutatorFunc = Callable[[str], list[str]]

_WORD_RE = re.compile(r"\w+")


def username_mutator(line: str) -> list[str]:
    """All username variants of a ``first middle last``-style line:

    - words joined with each of ``"" _ . -``;
    - for each word position (when >1 word): words-before + first letter of the
      word + words-after, and the variant with the word dropped entirely.
    """
    words = _WORD_RE.findall(line)
    out: list[str] = []
    for sep in ("", "_", ".", "-"):
        out.append(sep.join(words))
    for i, middle in enumerate(words):
        prev, last = words[:i], words[i + 1 :]
        if not prev and not last:
            continue
        head, tail = "".join(prev), "".join(last)
        out.append(head + middle[0] + tail)
        out.append(head + tail)
    return out


MUTATORS: dict[str, MutatorFunc] = {"username": username_mutator}


def register_mutator(name: str, fn: MutatorFunc) -> None:
    """User-extension point (SURVEY §2.10)."""
    MUTATORS[name] = fn


def permute(words: set[str] | list[str], mutator_name: str) -> set[str]:
    """Apply a registered mutator to every word; union of all outputs.
    Empty name = identity — ``mainWordlist.go:106-110``."""
    if not mutator_name:
        return set(words)
    fn = MUTATORS[mutator_name]
    out: set[str] = set()
    for w in words:
        out.update(fn(w))
    return out
