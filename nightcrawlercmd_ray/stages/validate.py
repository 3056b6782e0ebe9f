"""HTML validation against a tag/attribute whitelist (the reference's
``htmlcheck`` stage, M13).

Parity: rules file format is the reference's ``config/tags.json``
(``Tags: [{Name, Attrs, IsSelfClosing}]`` + ``Groups: [{Name, Attrs}]``),
loaded once per validator (``mainReport.go:358-359``); per-page validation +
line annotation consumed at ``mainReport.go:119-127``; report columns
``reason, tag, attribute, line`` at ``mainReport.go:302-329``.

The htmlcheck internals are un-vendored, so the engine pins its own spec:

- a tag whose lowercased name is not in the whitelist → ``InvTag``;
- an attribute not allowed for its tag → ``InvAttribute``. Allowed =
  the tag's own ``Attrs`` ∪ the empty-``Name`` tag's ``Attrs`` (global
  attributes) ∪ all ``Groups`` attrs; ``data-*`` and ``aria-*`` are allowed;
  matching is case-insensitive;
- ``line`` is the 1-based source line of the start tag (stdlib parser pos).

Used as a stateful actor-pool stage: rules parsed once per actor in
``__init__``, batches validated in ``__call__``.
"""

from __future__ import annotations

import json
from html.parser import HTMLParser

import pyarrow as pa


class TagRules:
    def __init__(self, tags_json: dict | list):
        # reference file shape: {"Groups": [...], "Tags": [...]}
        if isinstance(tags_json, list):
            tags_list, groups = tags_json, []
        else:
            tags_list = tags_json.get("Tags", [])
            groups = tags_json.get("Groups", [])
        self.tags: dict[str, set[str]] = {}
        self.global_attrs: set[str] = set()
        for t in tags_list:
            name = (t.get("Name") or "").lower()
            attrs = {a.lower() for a in (t.get("Attrs") or [])}
            if name == "":
                self.global_attrs |= attrs
            else:
                self.tags[name] = attrs
        self.group_attrs: set[str] = set()
        for g in groups:
            self.group_attrs |= {a.lower() for a in (g.get("Attrs") or [])}

    @classmethod
    def from_file(cls, path: str) -> "TagRules":
        with open(path) as f:
            return cls(json.load(f))

    def check(self, tag: str, attrs: list[str]) -> list[tuple[str, str, str]]:
        """→ [(reason, tag, attribute)] for one start tag."""
        tag = tag.lower()
        if tag not in self.tags:
            return [("InvTag", tag, "")]
        allowed = self.tags[tag]
        errs = []
        for a in attrs:
            al = a.lower()
            if (
                al not in allowed
                and al not in self.global_attrs
                and al not in self.group_attrs
                and not al.startswith("data-")
                and not al.startswith("aria-")
            ):
                errs.append(("InvAttribute", tag, al))
        return errs


class _ValidatingParser(HTMLParser):
    def __init__(self, rules: TagRules):
        super().__init__(convert_charrefs=True)
        self.rules = rules
        self.errors: list[tuple[str, str, str, int]] = []

    def handle_starttag(self, tag, attrs):
        line, _ = self.getpos()
        for reason, t, a in self.rules.check(tag, [k for k, _ in attrs]):
            self.errors.append((reason, t, a, line))

    handle_startendtag = handle_starttag


def validate_html(rules: TagRules, html: bytes | str) -> list[tuple[str, str, str, int]]:
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", "replace")
    p = _ValidatingParser(rules)
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass
    return p.errors


class HtmlValidatorStage:
    """Actor-pool stage: ``pages(url, html)`` batches → ``invalid_tags`` rows
    (url, reason, tag, attribute, line). Rules load once per actor."""

    def __init__(self, tags_file: str):
        self.rules = TagRules.from_file(tags_file)

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls, reasons, tags, attrs, lines = [], [], [], [], []
        for url, html in zip(
            batch.column("url").to_pylist(), batch.column("html").to_pylist()
        ):
            for reason, tag, attr, line in validate_html(self.rules, html):
                urls.append(url)
                reasons.append(reason)
                tags.append(tag)
                attrs.append(attr)
                lines.append(line)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "reason": pa.array(reasons, pa.string()),
                "tag": pa.array(tags, pa.string()),
                "attribute": pa.array(attrs, pa.string()),
                "line": pa.array(lines, pa.int32()),
            }
        )
