"""Reference-section selection and citation splitting.

Parity with ``lib/pdf/extract/references/references.rb``: sections are
kept when their ``reference_score`` is within ``reference_flex`` of the
document's best (computed over ALL sections, references.rb:196-198) after
dropping early (``lateness < min_lateness``) and year-free sections
(references.rb:201-206); each kept section splits by the first applicable
strategy — numbered sequence → delimiter learning
(references.rb:80-153), multiple line indents → hanging-margin split
(references.rb:66-71), multiple line spacings → spacing split
(references.rb:73-78); finally pseudo-references matching the header
patterns are dropped (references.rb:225-229).

The disabled SVM path (score.rb, "TODO Enable classification",
references.rb:210-211) is not in the live path and is not ported.
"""

from __future__ import annotations

import math
import re

from pdfextract_ray.kernel import spatial
from pdfextract_ray.settings import Settings

_DELIM_SCAN_RE = re.compile(r"[^\d]?\d+[^\d]")
_DIGITS_RE = re.compile(r"\d+")
_PSEUDO_RE = (re.compile(r"references?"), re.compile(r"submitted for publication"),
              re.compile(r"additional contributions"))

# accepted learned delimiter chars (references.rb:115)
_OK_BEFORE = (None, "[", " ")
_OK_AFTER = (None, ".", "]", " ")


def _partition_by(items: list, pred) -> list[list]:
    # references.rb:32-44 — each part STARTS with a matching item; a
    # leading non-matching run forms its own part; empties dropped.
    matching: list = []
    parts: list[list] = []
    for item in items:
        if pred(item):
            parts.append(matching)
            matching = []
        matching.append(item)
    parts.append(matching)
    return [p for p in parts if p]


def _frequencies(lines: list[dict], key: str) -> list[dict]:
    # references.rb:46-64 — counts keyed by floor(value) in first-seen
    # order; stable ascending sort by count then REVERSED (so ties order
    # by latest-first-seen), matching Ruby sort_by + reverse.
    fs: dict[int, int] = {}
    for line in lines:
        val = math.floor(line[key])
        fs[val] = fs.get(val, 0) + 1
    ary = [{"value": k, "count": v} for k, v in fs.items()]
    return list(reversed(sorted(ary, key=lambda item: item["count"])))


def _select_delimiter(lines: list[dict], key: str) -> int:
    # references.rb:66-68 — the SECOND most frequent floor value.
    return _frequencies(lines, key)[1]["value"]


def _split_on_lines(lines: list[dict], key: str) -> list[dict]:
    # split_by_margin / split_by_line_spacing (references.rb:66-78) share
    # this shape, differing only in the delimiting key.
    delim = _select_delimiter(lines, key)
    idx = 0
    while idx < len(lines) and math.floor(lines[idx][key]) != delim:
        idx += 1
    lines = lines[idx:]
    parts = _partition_by(lines, lambda line: math.floor(line[key]) == delim)
    return [{"content": " ".join(line["content"] for line in part)} for part in parts]


def split_by_margin(lines: list[dict]) -> list[dict]:
    return _split_on_lines(lines, "x_offset")


def split_by_line_spacing(lines: list[dict]) -> list[dict]:
    return _split_on_lines(lines, "spacing")


def _multi_margin(lines: list[dict]) -> bool:
    # references.rb:155-157
    return len({math.floor(l["x_offset"]) for l in lines}) > 1


def _multi_spacing(lines: list[dict]) -> bool:
    # references.rb:159-161
    return len({math.floor(l["spacing"]) for l in lines}) > 1


def numeric_sequence(content: str, settings: Settings) -> bool:
    # references.rb:163-184 — count consecutive increments among numbers
    # below max_reference_order; the first such number must also appear in
    # the first 31 chars.
    max_order = settings.max_reference_order
    last_n = -1
    first_n = -1
    seq_count = 0
    for m in _DIGITS_RE.finditer(content):
        n = int(m.group(0))
        if n < max_order:
            if last_n == -1:
                last_n = n
                if first_n == -1:
                    first_n = n
            elif last_n + 1 == n:
                last_n += 1
                seq_count += 1
    if seq_count < settings.min_sequence_count:
        return False
    return re.search(str(first_n), content[:31]) is not None


def _ruby_partition(s: str, pattern: re.Pattern) -> tuple[str, str, str]:
    m = pattern.search(s)
    if m is None:
        return (s, "", "")
    return (s[:m.start()], m.group(0), s[m.end():])


def split_by_delimiter(s: str, settings: Settings) -> list[dict]:
    # references.rb:80-153 — learn the most frequent before/after chars
    # around an incrementing numeric sequence, then re-partition at
    # `before? digits after` matches, tracking the sequence.
    max_order = settings.max_reference_order
    before: dict[str, int] = {}
    after: dict[str, int] = {}
    last_n = -1

    for m in _DELIM_SCAN_RE.finditer(s):
        mtxt = m.group(0)
        n = int(_DIGITS_RE.search(mtxt).group(0))
        if n < max_order:
            if last_n == -1 or n == last_n + 1:
                before[mtxt[0]] = before.get(mtxt[0], 0) + 1
                after[mtxt[-1]] = after.get(mtxt[-1], 0) + 1
                last_n = n if last_n == -1 else last_n + 1

    b_c = max(before.items(), key=lambda kv: kv[1])[0] if before else None
    a_c = max(after.items(), key=lambda kv: kv[1])[0] if after else None

    if b_c not in _OK_BEFORE or a_c not in _OK_AFTER:
        return []

    pattern = re.compile(
        (re.escape(b_c) + "?" if b_c is not None else "")
        + r"\d+"
        + (re.escape(a_c) if a_c is not None else "")
    )

    last_n = -1
    current_ref = ""
    refs: list[dict] = []
    parts = _ruby_partition(s, pattern)

    while parts[1]:
        n = int(_DIGITS_RE.search(parts[1]).group(0))
        if n < max_order and last_n == -1:
            last_n = n
        elif n == last_n + 1:
            current_ref += parts[0]
            refs.append({"content": current_ref.strip(), "order": last_n})
            current_ref = ""
            last_n += 1
        else:
            current_ref += parts[0] + parts[1]
        parts = _ruby_partition(parts[2], pattern)

    refs.append({"content": (current_ref + parts[0]).strip(), "order": last_n})
    return refs


def build_references(sections: list[dict], settings: Settings) -> list[dict]:
    if not sections:
        return []

    max_score = max(s["reference_score"] for s in sections)
    min_permittable = max_score - (max_score * settings.reference_flex)

    kept = [s for s in sections
            if not (s["lateness"] < settings.min_lateness or s["year_ratio"] == 0)]

    refs: list[dict] = []
    for section in kept:
        if section["reference_score"] >= min_permittable:
            content = spatial.get_text_content(section)
            if numeric_sequence(content, settings):
                refs.extend(split_by_delimiter(content, settings))
            elif _multi_margin(section["lines"]):
                refs.extend(split_by_margin(section["lines"]))
            elif _multi_spacing(section["lines"]):
                refs.extend(split_by_line_spacing(section["lines"]))

    out = []
    for ref in refs:
        norm = ref["content"].lower().strip()
        if any(p.search(norm) for p in _PSEUDO_RE):
            continue
        out.append(ref)
    return out
