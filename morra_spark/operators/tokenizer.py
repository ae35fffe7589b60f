"""Offset-preserving tokenizer.

The reference consumes pre-tokenized CoNLL-U and has no tokenizer of its
own (SURVEY.md §2 "not in the reference"); this one is pinned by the
per-turn text-equality invariant (BASELINE.json input_hint): every token
carries ``(start, len)`` into the original ``text``, so
``text[start:start+len] == form`` holds byte-exactly and reassembly can
reproduce ``text`` by slicing — never by joining on spaces.

Token rule: word characters with an optional apostrophe-suffix glued on
(``Haddad's`` is ONE token, lemmatized by the ``'s``-strip suffix rule),
else any single non-space symbol.
"""

from __future__ import annotations

import re

TOKEN_RE = re.compile(r"\w+(?:'\w+)?|[^\w\s]")


def tokenize_one(text: str) -> list[tuple[int, int, str]]:
    """[(start, len, form), ...] for one text. C-regex scan, no copies."""
    return [(m.start(), m.end() - m.start(), m.group()) for m in TOKEN_RE.finditer(text)]


def detokenize(text: str, spans: list[tuple[int, int]]) -> str:
    """Reconstruct the covered text by slicing the original — the
    round-trip check used by the text-fidelity invariant tests."""
    if not spans:
        return ""
    lo = spans[0][0]
    hi = spans[-1][0] + spans[-1][1]
    return text[lo:hi]
