"""Per-line language segmentation (stages/langlines.py): verdict
semantics, DuckDB mirror parity, keep-majority rewrite idempotence,
CLI both modes."""

import glob
import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from pdfextract_ray.stages.langlines import (KeepMajorityLines, LangLines,
                                             keep_majority_lines,
                                             lang_segments)

EN = "the cat and the dog with food for all of us is here"
DE = "der hund und die katze ist nicht hier"
FR = "le chien et la vache est une bete"


def _t(texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts, pa.string())})


def test_per_line_counts_and_majority():
    t = _t(["\n".join([EN, EN, DE]),      # majority en 2/3
            "\n".join([DE, FR]),          # tie de/fr -> order: de
            "no markers here\n12345",     # both lines und
            None])                        # null -> '' -> one und line
    out = LangLines()(t).to_pandas().set_index("doc_id")
    assert out.loc[0, "n_lines"] == 3 and out.loc[0, "n_en"] == 2 \
        and out.loc[0, "n_de"] == 1
    assert out.loc[0, "majority_lang"] == "en"
    assert out.loc[0, "majority_frac"] == round(2 / 3, 6)
    assert out.loc[1, "majority_lang"] == "de"   # tie -> marker order
    assert out.loc[2, "majority_lang"] == "und" \
        and out.loc[2, "n_und"] == 2
    assert out.loc[3, "n_lines"] == 1 and out.loc[3, "n_und"] == 1


def test_keep_majority_rewrite_and_idempotence():
    mixed = "\n".join([EN, DE, EN])
    t = _t([mixed, DE])
    t = t.append_column("extra", pa.array([7, 8], pa.int64()))
    out = KeepMajorityLines()(t)
    texts = out["text"].to_pylist()
    assert texts[0] == "\n".join([EN, EN])   # DE line removed
    assert texts[1] == DE                    # single-lang untouched
    assert out["extra"].to_pylist() == [7, 8]  # columns ride through
    # idempotent: second pass keeps every line
    again = KeepMajorityLines()(out)
    assert again["text"].to_pylist() == texts


@pytest.mark.usefixtures("ray_session")
def test_matches_duckdb_mirror(ray_session):
    from pdfextract_ray.pipelines.queries import _LANG_SEGMENTS_SQL
    sf = "/root/testdata/sf0.001"
    got = lang_segments(
        ray.data.read_parquet("%s/documents.parquet" % sf,
                              columns=["doc_id", "text"])) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                "read_parquet('%s/documents.parquet')" % sf)
    want = con.sql(_LANG_SEGMENTS_SQL).df() \
        .sort_values("doc_id").reset_index(drop=True)
    assert len(got) == len(want) > 0
    for c in got.columns:
        assert got[c].tolist() == want[c].tolist(), c


@pytest.mark.usefixtures("ray_session")
def test_cli_lang_lines_both_modes(tmp_path):
    from pdfextract_ray.__main__ import main

    src = str(tmp_path / "docs.parquet")
    pq.write_table(_t(["\n".join([EN, DE, EN]), FR]), src)

    rep = str(tmp_path / "report")
    assert main(["lang-lines", src, "--out", rep]) == 0
    t = pq.read_table(glob.glob(os.path.join(rep, "*.parquet"))) \
        .sort_by("doc_id")
    assert t.column("majority_lang").to_pylist() == ["en", "fr"]

    cln = str(tmp_path / "clean")
    assert main(["lang-lines", src, "--keep-majority",
                 "--out", cln]) == 0
    t2 = pq.read_table(glob.glob(os.path.join(cln, "*.parquet"))) \
        .sort_by("doc_id")
    assert t2.column("text").to_pylist() == ["\n".join([EN, EN]), FR]

def test_matches_python_mirror_fuzz():
    """Hypothesis-style fuzz (deterministic corpus here): LangLines ==
    a pure-Python per-line mirror on exotic inputs — unicode
    separators, empty lines, marker collisions across languages
    ('la' is both fr and es: verdict order decides)."""
    import random

    from pdfextract_ray.stages.textstats import _LANG_MARKERS, ascii_words
    rng = random.Random(20260820)
    pool = (list(_LANG_MARKERS["en"]) + list(_LANG_MARKERS["de"])
            + list(_LANG_MARKERS["fr"]) + list(_LANG_MARKERS["es"])
            + ["xxx", "123", "", " ", "　", "la", "und"])
    docs = []
    for _ in range(60):
        lines = []
        for _ in range(rng.randint(0, 6)):
            lines.append(" ".join(rng.choice(pool)
                                  for _ in range(rng.randint(0, 8))))
        docs.append("\n".join(lines))
    docs += [None, "", "\n\n", " the and of is with for"]

    def mirror(text):
        order = list(_LANG_MARKERS) + ["und"]
        counts = {k: 0 for k in order}
        for line in (text or "").split("\n"):
            words = ascii_words(line.lower())
            hits = [sum(1 for w in words if w in _LANG_MARKERS[k])
                    for k in _LANG_MARKERS]
            m = max(hits) if hits else 0
            if m == 0:
                counts["und"] += 1
            else:
                counts[list(_LANG_MARKERS)[hits.index(m)]] += 1
        n_lines = sum(counts.values())
        maj = max(order, key=lambda k: (counts[k], -order.index(k)))
        return (n_lines, counts, maj,
                round(counts[maj] / n_lines, 6) if n_lines else 0.0)

    t = _t(docs)
    out = LangLines()(t).to_pandas().set_index("doc_id")
    for i, s in enumerate(docs):
        n_lines, counts, maj, frac = mirror(s)
        row = out.loc[i]
        assert row["n_lines"] == n_lines, (i, s)
        for k, v in counts.items():
            assert row["n_%s" % k] == v, (i, k, s)
        assert row["majority_lang"] == maj, (i, s)
        assert row["majority_frac"] == frac, (i, s)
