"""Content scalar features over strings.

Parity with ``lib/pdf/extract/language.rb``: transliteration table,
letter/cap/year ratios, word count. Division semantics follow Ruby float
division (``x / 0.0`` → inf, ``0 / 0.0`` → NaN) because downstream scoring
(spatial.rb:160) special-cases NaN diffs.

``name_ratio`` (language.rb:74) is gazetteer-backed and lives in
:mod:`pdfextract_ray.kernel.names` — it needs per-actor state.
"""

from __future__ import annotations

import re
from itertools import filterfalse

_TRANSLIT = {
    # Remove ligatures (language.rb:10-18)
    "ﬀ": "ff",
    "ﬁ": "fi",
    "ﬂ": "fl",
    "ﬃ": "ffi",
    "ﬄ": "ffl",
    "ﬅ": "ft",
    "ﬆ": "st",
    "ᵫ": "ue",
    # Normalise some punctuation (language.rb:20-29)
    "‘": "'",
    "’": "'",
    "–": "-",
    "—": "-",
    "“": '"',
    "”": '"',
    "▯": "(",
    "´": "",
    "±": "-",
}

_WS_RE = re.compile(r"\s+")
# Ruby `count("A-Z0-9\-[],.\"'()")` char set (language.rb:40-42)
_LETTER_SET = frozenset(
    [chr(c) for c in range(ord("A"), ord("Z") + 1)]
    + [chr(c) for c in range(ord("0"), ord("9") + 1)]
    + ["-", "[", "]", ",", ".", '"', "'", "(", ")"]
)
_YEAR_RE = re.compile(r"[^\d]\d{4}[^\d]")


def _ruby_div(num: float, den: float) -> float:
    if den == 0:
        return float("nan") if num == 0 else float("inf")
    return num / den


# str.translate applies exactly the same per-char mapping (multi-char
# replacements included) at C speed; unmapped chars pass through
_TRANSLIT_TABLE = {ord(k): v for k, v in _TRANSLIT.items()}


def transliterate(s: str) -> str:
    # language.rb:5-38 — per-char mapping then whitespace collapse (no strip).
    return _WS_RE.sub(" ", s.translate(_TRANSLIT_TABLE))


# deleting the member chars and differencing lengths counts them at
# C speed; exactly equivalent to the per-char set-membership scan
_LETTER_DEL = {ord(c): None for c in _LETTER_SET}


def letter_ratio(s: str) -> float:
    # language.rb:40-42
    n = len(s) - len(s.translate(_LETTER_DEL))
    return _ruby_div(n, float(len(s)))


_UPPERS_RE = re.compile(r"[A-Z]")
# delete-and-diff counts A-Z occurrences at C speed (same trick as
# letter_ratio); identical to len(_UPPERS_RE.findall(s)) by definition
_UPPER_DEL = {c: None for c in range(ord("A"), ord("Z") + 1)}
# an uppercase letter is exempt iff it is the first char other than
# whitespace/dots after a '.' (or string start) — the state-machine
# equivalent below, verified by a differential property test
_EXEMPT_RE = re.compile(r"(?:\A|\.)[\s.]*[A-Z]")


def cap_ratio(s: str, n_words: int | None = None) -> float:
    # language.rb:45-61 — caps not at sentence start, per word.
    # ``n_words`` lets a caller that already split ``s`` skip the re-split
    # (must equal len(s.split())).
    cap_count = (len(s) - len(s.translate(_UPPER_DEL))) - len(_EXEMPT_RE.findall(s))
    if n_words is None:
        n_words = len(s.split())
    return _ruby_div(cap_count, float(n_words))


def cap_ratio_scan(s: str) -> float:
    """Reference state-machine implementation (language.rb:45-61),
    kept for the differential test against the regex fast path."""
    sentence_end = True
    cap_count = 0
    for c in s:
        if c == ".":
            sentence_end = True
        elif "A" <= c <= "Z":
            if not sentence_end:
                cap_count += 1
            sentence_end = False
        elif not c.isspace():
            sentence_end = False
    return _ruby_div(cap_count, float(len(s.split())))


def year_ratio(s: str, words: list[str] | None = None) -> float:
    # language.rb:63-71 — words containing a 4-digit run flanked by
    # non-digits WITHIN the word (so "(2004)" counts, bare "2004" doesn't).
    # ``words`` lets a caller that already split ``s`` skip the re-split
    # (must equal s.split()).
    if words is None:
        words = s.split()
    # C-speed filter+search (no per-word generator frame) — identical
    # predicate, ~5% of kernel time in the 400-doc profile. The
    # filterfalse(str.isalpha) pre-screen is exact: an all-alphabetic
    # word contains no digit, so _YEAR_RE (which requires \d{4}) can
    # never match it — only non-pure-alpha words reach the regex.
    n = len(list(filter(_YEAR_RE.search, filterfalse(str.isalpha, words))))
    return _ruby_div(n, float(len(words)))


def word_count(s: str) -> int:
    # language.rb:77-79
    return len(s.split())
