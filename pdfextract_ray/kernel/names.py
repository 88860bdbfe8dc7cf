"""Family-name detection (gazetteer lookup).

Parity with ``lib/pdf/extract/names.rb:9-50`` (``NamesDatabase``): per
word, the capitalized form (plus capitalization after hyphens) is looked
up in a family-name table; ambiguous entries weigh 0.0, unambiguous 1.0;
``name_frequency = sum / word_count`` (0 when sum is 0).

Two parity notes:

- The reference's SQLite blob ``familynames.db`` is absent from the
  checkout (``.MISSING_LARGE_BLOBS``); we ship a deterministic synthetic
  gazetteer (``pdfextract_ray/data/gazetteer.txt``, common public
  surnames, a handful flagged ambiguous).
- The reference's stopword filter is inert: Ruby operator precedence in
  ``if not @@stop_words.include? word && word.length > 1`` (names.rb:31)
  makes the condition always true, so EVERY word is looked up. We
  replicate that (no stopword skip) for behavioral parity; the stopword
  list is still shipped for the quality-scoring operators.

This is actor-pool state in the Ray layer: the gazetteer loads once per
actor in ``__init__`` (the analogue of the process-global SQLite handle,
names.rb:18).
"""

from __future__ import annotations

import os
import re

_DATA_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")

AMBIGUOUS_WEIGHT = 0.0
UNAMBIGUOUS_WEIGHT = 1.0

_HYPHEN_CAP_RE = re.compile(r"-(.)")


def load_gazetteer(path: str | None = None) -> dict[str, bool]:
    """name → is_ambiguous. File format: ``Name,0|1`` per line."""
    path = path or os.path.join(_DATA_DIR, "gazetteer.txt")
    gaz: dict[str, bool] = {}
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            name, _, amb = line.partition(",")
            gaz[name] = amb.strip() == "1"
    return gaz


def load_stopwords(path: str | None = None) -> frozenset[str]:
    path = path or os.path.join(_DATA_DIR, "stopwords.txt")
    with open(path, "r", encoding="utf-8") as f:
        return frozenset(w.strip() for w in f.read().split(",") if w.strip())


def _query_form(word: str) -> str:
    # names.rb:33-35 — Ruby String#capitalize (first char upper, rest
    # lower) then upcase the char following each hyphen.
    w = word.capitalize()
    return _HYPHEN_CAP_RE.sub(lambda m: "-" + m.group(1).upper(), w)


def detect_names(content: str, gazetteer: dict[str, bool]) -> float:
    """Return name_frequency for ``content`` (names.rb:22-49)."""
    words = content.split()
    total = 0.0
    for word in words:
        # names.rb:29-35: downcase → capitalize → upcase-after-hyphen.
        # Python str.capitalize() == Ruby downcase+capitalize; the hyphen
        # pass only matters when a hyphen is present.
        q = word.capitalize()
        if "-" in q:
            q = _HYPHEN_CAP_RE.sub(lambda m: "-" + m.group(1).upper(), q)
        amb = gazetteer.get(q)
        if amb is not None:
            total += AMBIGUOUS_WEIGHT if amb else UNAMBIGUOUS_WEIGHT
    if total == 0:
        return 0.0
    return total / float(len(words))
