"""Description blacklist / filter chains (reference operators M1/M2/M4).

Semantics contract (DescriptionScoreCalculator.java:25-55):

* ``passes_blacklist(desc, blacklist)`` — TRUE iff desc is non-empty AND no
  regex in the list ``find()``s a match.  Regexes are applied in file order
  with short-circuit on the first hit.
* ``apply_filters(desc, filters)`` — every match of every filter regex is
  replaced by a single space (preserving word boundaries), then runs of >= 2
  whitespace characters are condensed to one space and the result trimmed.

The shipped regex lists (``ahrd_ray/data/*.txt``) are byte-equal copies of the
reference's ``test/resources`` lists and form the verbatim contract; all
patterns in them are valid simultaneously as Java, Python and RE2 regexes.
"""

from __future__ import annotations

import re
from functools import lru_cache


@lru_cache(maxsize=256)
def _compile(pattern: str) -> re.Pattern:
    return re.compile(pattern)


def compile_chain(patterns: tuple[str, ...] | list[str]) -> list[re.Pattern]:
    return [_compile(p) for p in patterns]


def passes_blacklist(description: str | None, blacklist: list[str | re.Pattern]) -> bool:
    """M1 — DescriptionScoreCalculator.passesBlacklist (java :25-33)."""
    if description is None or description == "":
        return False
    for pat in blacklist:
        rx = pat if isinstance(pat, re.Pattern) else _compile(pat)
        if rx.search(description):
            return False
    return True


def apply_filters(description: str, filters: list[str | re.Pattern]) -> str:
    """M2 — DescriptionScoreCalculator.filter (java :45-55)."""
    out = description
    for pat in filters:
        rx = pat if isinstance(pat, re.Pattern) else _compile(pat)
        out = rx.sub(" ", out)
    out = re.sub(r"\s{2,}", " ", out)
    return out.strip()


def token_passes_blacklist(token: str | None, blacklist: list[str | re.Pattern]) -> bool:
    """M4 — TokenScoreCalculator.tokenPassesBlacklist (java :32-43)."""
    if token is None or token == "":
        return False
    for pat in blacklist:
        rx = pat if isinstance(pat, re.Pattern) else _compile(pat)
        if rx.search(token):
            return False
    return True
