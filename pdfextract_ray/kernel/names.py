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
    """Parity artifact: the reference ships data/stopwords.txt and loads
    it (names.rb:18) but its live scoring path never consults the set —
    the accessor exists so a user of the reference's API finds the same
    surface here; nothing internal calls it either (same inert quirk)."""
    path = path or os.path.join(_DATA_DIR, "stopwords.txt")
    with open(path, "r", encoding="utf-8") as f:
        return frozenset(w.strip() for w in f.read().split(",") if w.strip())


def _query_form(word: str) -> str:
    # names.rb:33-35 — Ruby String#capitalize (first char upper, rest
    # lower) then upcase the char following each hyphen. The SINGLE
    # definition of the lookup form; detect_names' memo calls it on its
    # cold path only (unseen words), so the hot path stays memo-speed.
    w = word.capitalize()
    if "-" in w:
        w = _HYPHEN_CAP_RE.sub(lambda m: "-" + m.group(1).upper(), w)
    return w


class NamesDatabase:
    """Gazetteer-backed detector (names.rb:9-50) — the default."""

    # word-weight memo shared ACROSS calls: the weight is a pure function
    # of (word, gazetteer), the extraction actor passes the same
    # gazetteer object for its whole life, and prose repeats words
    # heavily across documents too. Keyed by gazetteer IDENTITY (a
    # different dict resets the memo); bounded against pathological
    # vocabularies.
    _memo_gaz: dict | None = None
    _memo: dict[str, float] = {}
    _MEMO_MAX = 1_000_000

    @staticmethod
    def detect_names(content: str, gazetteer: dict[str, bool] | None = None,
                     words: list[str] | None = None) -> float:
        # ``words`` lets a caller that already split ``content`` skip the
        # re-split (must equal content.split())
        if words is None:
            words = content.split()
        if not words:
            return 0.0
        gazetteer = gazetteer or {}
        if NamesDatabase._memo_gaz is not gazetteer:
            NamesDatabase._memo_gaz = gazetteer
            NamesDatabase._memo = {}
        memo = NamesDatabase._memo
        try:
            # warm path: every word already weighted — one C-speed pass,
            # float additions in the same word order as the scalar loop
            total = sum(map(memo.get, words))
        except TypeError:
            # at least one unseen word: seed the memo, then re-sum
            if len(memo) > NamesDatabase._MEMO_MAX:
                memo.clear()
            for word in words:
                if word not in memo:
                    amb = gazetteer.get(_query_form(word))
                    memo[word] = 0.0 if amb is None else \
                        (AMBIGUOUS_WEIGHT if amb else UNAMBIGUOUS_WEIGHT)
            total = sum(map(memo.get, words))
        if total == 0:
            return 0.0
        return total / float(len(words))


class NamesService:
    """HTTP name-detection backend (names.rb:52-68 ``NamesService``):
    POST the content, parse ``{"name_frequency": x}``; ANY failure —
    network absent, non-200, bad JSON — returns 0.0, exactly like the
    reference's bare ``rescue``. ``url``/``timeout`` are class attrs so
    a deployment can point at its own service."""

    url = "http://localhost:8399/detect"
    timeout = 2.0

    @classmethod
    def detect_names(cls, content: str,
                     gazetteer: dict[str, bool] | None = None) -> float:
        import json
        import urllib.request
        try:
            req = urllib.request.Request(
                cls.url, data=content.encode("utf-8"), method="POST")
            with urllib.request.urlopen(req, timeout=cls.timeout) as resp:
                if resp.status == 200:
                    return float(json.loads(resp.read())
                                 .get("name_frequency", 0.0))
        except Exception:
            pass
        return 0.0


class NoDetection:
    """names.rb:70-74 — always 0.0."""

    @staticmethod
    def detect_names(content: str,
                     gazetteer: dict[str, bool] | None = None) -> float:
        return 0.0


# names.rb:76-86: module-level pluggable detector (``Names.detector=``)
_detector = NamesDatabase

_BACKENDS = {
    "database": NamesDatabase,
    "service": NamesService,
    "none": NoDetection,
}


def resolve_detector(spec):
    """Map a backend selector to a detector: the strings
    ``"database"``/``"service"``/``"none"``, or any object exposing
    ``detect_names`` passes through unchanged."""
    if isinstance(spec, str):
        try:
            return _BACKENDS[spec]
        except KeyError:
            raise ValueError("unknown names backend %r (expected one of %s)"
                             % (spec, sorted(_BACKENDS))) from None
    return spec


def set_detector(detector) -> None:
    """Swap the active backend (class or instance exposing
    ``detect_names(content, gazetteer=None)``).

    PROCESS-LOCAL: this mutates a module global in the calling process
    only — Ray workers import the module fresh and never see it. For
    distributed extraction, select the backend via
    ``Settings(names_backend=...)`` (serialized to every actor) instead.
    """
    global _detector
    _detector = detector


def get_detector():
    return _detector


def detect_names(content: str, gazetteer: dict[str, bool],
                 backend: str | None = None,
                 words: list[str] | None = None) -> float:
    """Return name_frequency for ``content`` via the active detector
    (names.rb:84-86). ``backend`` (from ``Settings.names_backend``)
    overrides the process-local default when given — that is the path
    that works inside Ray workers. The default ``NamesDatabase`` path
    is the byte-identical live-path math. ``words`` (an already-computed
    ``content.split()``) is forwarded only to the in-process gazetteer
    backend — pluggable detectors keep the 2-arg contract."""
    det = _detector if backend is None else resolve_detector(backend)
    if words is not None and det is NamesDatabase:
        return det.detect_names(content, gazetteer, words)
    return det.detect_names(content, gazetteer)
