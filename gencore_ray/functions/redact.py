"""PII redaction kernels (training-data hygiene).

Replaces emails / IPv4 addresses / international phone numbers with
typed placeholder tags before text ships to training. Patterns are
RE2-safe AND ASCII-explicit (``[0-9]`` not ``\\d`` — Python's ``\\d``
is unicode-wide, RE2's is ASCII; using the explicit class makes the
DuckDB ``regexp_replace`` oracle replay the kernel exactly).

This is a pure per-row ``map_batches`` stage: no state, no shuffle;
at corpus scale it fuses into whatever pass already reads the text.
"""

from __future__ import annotations

import re

import numpy as np

# order matters: emails contain dots+digits that the later patterns
# could otherwise chew on
_PATTERNS: list[tuple[str, re.Pattern, str]] = [
    ("email",
     re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
     "<EMAIL>"),
    ("ipv4",
     re.compile(r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"),
     "<IP>"),
    ("phone",
     re.compile(r"\+[0-9]{7,15}"),
     "<PHONE>"),
]

def redact_pii(texts) -> tuple[np.ndarray, dict[str, np.ndarray]]:
    """-> (redacted texts, {kind: bool flag array}).

    Flags are computed on the ORIGINAL text (a doc is flagged even if
    a later pattern would have rewritten the match)."""
    n = len(texts)
    flags = {name: np.zeros(n, dtype=bool) for name, _, _ in _PATTERNS}
    out = np.empty(n, dtype=object)
    for i, orig in enumerate(texts):
        orig = orig or ""
        t = orig
        for name, pat, repl in _PATTERNS:
            if pat.search(orig):
                flags[name][i] = True
            t = pat.sub(repl, t)
        out[i] = t
    return out, flags
