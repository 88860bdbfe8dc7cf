"""Freeze golden fixtures for the tiny corpus (FIXTURES.md §3).

Runs the pure-Python kernel over the first 16 sf0.001-derived corpus
rows and writes expected outputs under tests/golden/. Mirrors the
reference's accept-as-golden snapshot strategy (test/catalog:87-100).

Run ONLY for intentional semantic changes; commit the diff explicitly.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdfextract_ray.kernel.document import run_document
from pdfextract_ray.kernel.names import load_gazetteer
from pdfextract_ray.sources.corpus import corpus_table_local

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "tests", "golden")


def url_key(url: str) -> str:
    return hashlib.md5(url.encode()).hexdigest()[:12]


def canon_float(x):
    if isinstance(x, float):
        return round(x, 9)
    return x


def main() -> None:
    os.makedirs(os.path.join(GOLDEN_DIR, "text"), exist_ok=True)
    gaz = load_gazetteer()
    corpus = corpus_table_local("/root/testdata/sf0.001", limit=48)

    summary = {}
    for i in range(corpus.num_rows):
        url = corpus.column("url")[i].as_py()
        html = corpus.column("html")[i].as_py()
        r = run_document(html, gazetteer=gaz)
        key = url_key(url)

        with open(os.path.join(GOLDEN_DIR, "text", key + ".txt"), "wb") as f:
            f.write(r.text.encode("utf-8"))

        summary[url] = {
            "key": key,
            "title": r.title,
            "title_font": r.title_font,
            "n_pages": r.n_pages,
            "n_tokens": r.n_tokens,
            "n_chunks": r.n_chunks,
            "n_regions": len(r.regions),
            "references": r.references,
            "sections": [
                {k: canon_float(v) for k, v in s.items()
                 if k in ("letter_ratio", "year_ratio", "cap_ratio", "name_ratio",
                          "word_count", "lateness", "reference_score")}
                for s in r.sections
            ],
            "region_spans": [
                {"page": reg["page"], "x": round(reg["x"], 2), "y": round(reg["y"], 2),
                 "width": round(reg["width"], 2), "height": round(reg["height"], 2),
                 "n_lines": len(reg["lines"])}
                for reg in r.regions
            ],
            "zones": [
                {k: (round(v, 2) if isinstance(v, float) else v) for k, v in z.items()}
                for z in r.zones
            ],
            "text_md5": hashlib.md5(r.text.encode("utf-8")).hexdigest(),
        }

    with open(os.path.join(GOLDEN_DIR, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True, ensure_ascii=False)
    print("froze %d docs -> %s" % (corpus.num_rows, GOLDEN_DIR))


if __name__ == "__main__":
    main()
