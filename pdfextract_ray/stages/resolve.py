"""Reference resolution enrichment (offline mock of the reference's
HTTP resolver chain).

The reference resolves each extracted citation against external
services (``references/resolved_references.rb:6-20``,
``references/resolve.rb:9-25`` — CrossRef search top-1 DOI + score;
alternates FreeCite / SimpleTextQuery, chained ``resolve.rb:124-130``),
the only stage with external I/O. In this offline engine the resolver
is a deterministic mock with the same interface and the same Ray
shape: an I/O-bound enrichment as an actor pool with fractional
``num_cpus`` (many in-flight lookups per core; swap ``MockResolver``
for an HTTP client to go live). A resolver CHAIN is supported like the
reference's ``Resolve.resolvers=`` (first non-None wins).

``render_bibtex`` is the BibView analogue (``view/bib_view.rb:9-44``):
refs with a DOI and score >= 1 render as BibTeX entries — offline, from
the resolved fields, no network fetch.
"""

from __future__ import annotations

import hashlib
import re

import pyarrow as pa

_YEAR_RE = re.compile(r"\((\d{4})\)")
_AUTHOR_RE = re.compile(r"^([A-Z][A-Za-z'\-]+)")


class MockResolver:
    """Deterministic stand-in for one external resolver service."""

    name = "mock"

    def resolve(self, content: str) -> dict | None:
        norm = " ".join(content.split()).lower()
        if len(norm) < 20:
            return None  # too short to resolve — exercises chain fallback
        digest = hashlib.sha1(norm.encode("utf-8")).hexdigest()
        score = 1 + (int(digest[:4], 16) % 100) / 25.0  # [1, 5)
        return {"doi": "10.5555/%s" % digest[:12], "score": round(score, 2)}


class NoResolution:
    """Terminal chain element (reference's failure mode: unresolved)."""

    name = "none"

    def resolve(self, content: str) -> dict | None:
        return None


class ResolveReferences:
    """Actor-pool enrichment: exploded reference rows → +doi, +score.

    Run with fractional num_cpus (I/O-bound in the live version):
    ``map_batches(ResolveReferences, concurrency=N, num_cpus=0.25)``.
    """

    def __init__(self, resolvers: list | None = None) -> None:
        self.resolvers = resolvers if resolvers is not None else [MockResolver()]

    def __call__(self, batch: pa.Table) -> pa.Table:
        dois: list[str | None] = []
        scores: list[float | None] = []
        resolved_by: list[str | None] = []
        for content in batch["ref_content"].to_pylist():
            hit = None
            via = None
            for r in self.resolvers:
                hit = r.resolve(content or "")
                if hit is not None:
                    via = r.name
                    break
            dois.append(hit["doi"] if hit else None)
            scores.append(hit["score"] if hit else None)
            resolved_by.append(via)
        return batch.append_column("doi", pa.array(dois, pa.string())) \
                    .append_column("score", pa.array(scores, pa.float64())) \
                    .append_column("resolved_by", pa.array(resolved_by, pa.string()))


def render_bibtex_batch(batch: pa.Table) -> pa.Table:
    """BibView analogue: one BibTeX entry per resolved ref with
    score >= 1 (bib_view.rb:17-29 keeps exactly those)."""
    entries: list[str | None] = []
    for content, doi, score in zip(batch["ref_content"].to_pylist(),
                                   batch["doi"].to_pylist(),
                                   batch["score"].to_pylist()):
        if doi is None or score is None or score < 1:
            entries.append(None)
            continue
        year_m = _YEAR_RE.search(content or "")
        auth_m = _AUTHOR_RE.match(content or "")
        key = doi.rsplit("/", 1)[-1]
        fields = ['  doi = {%s}' % doi,
                  '  note = {%s}' % (content or "").replace("{", "(").replace("}", ")")]
        if auth_m:
            fields.insert(0, '  author = {%s}' % auth_m.group(1))
        if year_m:
            fields.append('  year = {%s}' % year_m.group(1))
        entries.append("@article{%s,\n%s\n}" % (key, ",\n".join(fields)))
    return batch.append_column("bibtex", pa.array(entries, pa.string()))
