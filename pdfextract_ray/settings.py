"""Tunable settings for the extraction kernel.

The reference declares 12 float-coerced tunables via a global registry
(``lib/pdf/extract/pdf.rb:5-50``); defaults below are taken verbatim from
the declaration sites (``model/chunks.rb:8-24``, ``model/regions.rb:6-11``,
``analysis/zones.rb:8-12``, ``analysis/columns.rb:4-14``,
``analysis/sections.rb:9-13``, ``analysis/titles.rb:6-10``,
``references/references.rb:8-30``).

A frozen dataclass is closure-captured by batch functions / actor classes;
Ray serializes it once per task submission, never per batch.
"""

from __future__ import annotations

from dataclasses import dataclass, fields, replace
from typing import Any, Mapping


@dataclass(frozen=True)
class Settings:
    # chunks (model/chunks.rb:8-24)
    char_slop: float = 0.2
    word_slop: float = 4.0
    overlap_slop: float = 0.9
    # regions (model/regions.rb:6-11)
    line_slop: float = 1.0
    # zones (analysis/zones.rb:8-12)
    body_ratio: float = 0.9
    # columns (analysis/columns.rb:4-14)
    column_sample_count: float = 8.0
    max_column_count: float = 3.0
    # sections (analysis/sections.rb:9-13)
    width_ratio: float = 0.9
    # titles (analysis/titles.rb:6-10)
    title_slop: float = 0.2
    # references (references/references.rb:8-30)
    reference_flex: float = 0.2
    min_sequence_count: float = 3.0
    max_reference_order: float = 1000.0
    min_lateness: float = 0.5
    # names (names.rb:76-86 ``Names.detector=``): backend selector that
    # survives serialization to Ray workers — "database" | "service" |
    # "none"; None inherits the process-local module default
    # (names.set_detector), which only affects the driver process.
    names_backend: str | None = None

    _STR_FIELDS = frozenset({"names_backend"})

    def with_overrides(self, overrides: Mapping[str, Any] | None) -> "Settings":
        """Reference coerces every override with ``value.to_f``
        (pdf.rb:29-36); we mirror with float() for the numeric tunables.
        String selectors pass through — including JSON ``null`` → None
        (``str(None)`` would smuggle the string ``"None"`` into the
        backend registry and fail confusingly at extraction time), and
        a non-None backend is validated EAGERLY so a typo fails at
        config-parse time, not mid-job on a worker."""
        if not overrides:
            return self

        # validate keys BEFORE coercing values: an unknown key with a
        # non-numeric value would otherwise die inside float() with a
        # message that never names the real problem (the typo'd key)
        known = {f.name for f in fields(self)}
        unknown = sorted(set(overrides) - known)
        if unknown:
            raise ValueError("unknown setting(s) %s — valid settings: %s"
                             % (", ".join(unknown), ", ".join(sorted(known))))

        def coerce(k: str, v: Any):
            if k in self._STR_FIELDS:
                if v is None:
                    return None
                v = str(v)
                if k == "names_backend":
                    from pdfextract_ray.kernel.names import resolve_detector
                    resolve_detector(v)  # raises ValueError on unknown
                return v
            return float(v)

        return replace(self, **{k: coerce(k, v)
                                for k, v in overrides.items()})


DEFAULT_SETTINGS = Settings()
