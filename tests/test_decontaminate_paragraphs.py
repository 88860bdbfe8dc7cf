"""Tests for the two session-4 training-data operators:

- ``decontaminate`` — benchmark n-gram-overlap scan (GPT-3/C4-style
  eval-set decontamination) with a broadcast eval-shingle set;
- ``paragraph_dedup`` — cross-document span-level exact-dedup stats
  over non-overlapping 16-word windows (the C4 span-dedup unit).

Each gets (a) kernel-semantics unit tests, (b) a brute-force parity
check of the distributed plan over a planted corpus, and (c) a DuckDB
parity test of the full registered oracle SQL on adversarial ASCII
whitespace (the crc32 oracle mirror is byte-exact only for ASCII text,
same contract as the shingle oracles — see queries._CRC_EXPR_SQL)."""

import zlib
from collections import Counter

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

from pdfextract_ray.stages import dedup as D
from pdfextract_ray.stages.textstats import ascii_words

WORDS = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
         "lambda mu nu xi omicron pi rho sigma tau upsilon").split()


def _doc(n_words: int, seed: int) -> str:
    rng = np.random.RandomState(seed)
    return " ".join(WORDS[i] for i in rng.randint(0, len(WORDS), n_words))


# ------------------------------------------------------------ paragraphs

def test_paragraph_hashes_windowing():
    # 35 words -> windows [0:16], [16:32], [32:35] (remainder kept)
    text = " ".join(f"w{i}" for i in range(35))
    hs = D.paragraph_hashes(text)
    assert len(hs) == 3
    words = text.split()
    expect = [zlib.crc32(" ".join(words[i:i + 16]).encode()) for i in (0, 16, 32)]
    assert hs == expect
    # within-doc repeats are NOT deduplicated (they count globally)
    rep = " ".join(["same"] * 32)
    assert len(D.paragraph_hashes(rep)) == 2
    assert D.paragraph_hashes(rep)[0] == D.paragraph_hashes(rep)[1]
    assert D.paragraph_hashes("") == []
    assert D.paragraph_hashes("   \t\n  ") == []
    # tokenization matches the pinned ASCII contract, lowercased
    assert D.paragraph_hashes("A  b\tC") == \
        [zlib.crc32(" ".join(ascii_words("a  b\tc")).encode())]


def test_paragraph_dedup_distributed_matches_bruteforce(ray_session):
    import ray.data
    import functools
    base = _doc(40, seed=1)
    rows = [{"doc_id": i, "text": _doc(50, seed=100 + i)} for i in range(8)]
    # plant: docs 20/21 share their first 16-word window; doc 22
    # repeats one window within itself twice
    shared = " ".join(WORDS[:16])
    rows += [{"doc_id": 20, "text": shared + " " + base},
             {"doc_id": 21, "text": shared + " " + _doc(40, seed=2)},
             {"doc_id": 22, "text": shared + " " + shared}]

    # brute force
    counts: Counter = Counter()
    per_doc = {}
    for r in rows:
        hs = D.paragraph_hashes(r["text"])
        per_doc[r["doc_id"]] = hs
        counts.update(hs)
    want = {d: (len(hs), sum(1 for h in hs if counts[h] > 1))
            for d, hs in per_doc.items()}

    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    mask = D.default_shard_mask()
    exploded = ds.map_batches(
        functools.partial(D.paragraph_explode_batch, shard_mask=mask),
        batch_format="pyarrow")
    out = exploded.groupby("shard") \
        .map_groups(D.paragraph_flags_shard, batch_format="pandas") \
        .to_pandas().groupby("doc_id")[["n_paras", "n_dup_paras"]].sum()
    got = {int(d): (int(r["n_paras"]), int(r["n_dup_paras"]))
           for d, r in out.iterrows()}
    assert got == want
    # the planted facts hold: 20/21/22's shared window is duplicated
    assert want[20][1] >= 1 and want[21][1] >= 1
    # doc 22 = shared + shared + (len%16 remainder windows)
    assert want[22][1] >= 2


def test_paragraph_oracle_sql_matches_kernel_adversarial():
    from pdfextract_ray.pipelines.queries import _build_paragraph_dedup_sql
    texts = [
        " ".join(f"t{i}" for i in range(40)),          # 3 windows
        "\tUPPER lower\x0bMiXeD\f x " * 20,            # \v \f separators
        "a" * 5,                                        # single word
        " ".join(["dup"] * 48),                         # all-identical windows
        "one  two\r\nthree four " * 10,                 # CRLF runs
        " ".join(f"t{i}" for i in range(16)),          # exactly one window
    ]
    rows = pa.table({"doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
                     "text": texts})
    con = duckdb.connect()
    con.register("documents", rows)
    oracle = con.sql(_build_paragraph_dedup_sql()).df() \
        .sort_values("doc_id").reset_index(drop=True)

    counts: Counter = Counter()
    hs_by_doc = {}
    for d, t in zip(rows["doc_id"].to_pylist(), texts):
        hs = D.paragraph_hashes(t)
        hs_by_doc[d] = hs
        counts.update(hs)
    mine = pd.DataFrame([
        {"doc_id": d, "n_paras": len(hs),
         "n_dup_paras": sum(1 for h in hs if counts[h] > 1)}
        for d, hs in hs_by_doc.items() if hs])
    mine["dup_frac"] = mine["n_dup_paras"].astype(float) / mine["n_paras"]
    mine = mine.sort_values("doc_id").reset_index(drop=True)
    assert list(oracle["doc_id"]) == list(mine["doc_id"])
    for col in ["n_paras", "n_dup_paras", "dup_frac"]:
        assert list(oracle[col]) == list(mine[col]), col


# --------------------------------------------------------- decontaminate

def test_eval_shingle_batch_collects_only_eval_rows():
    t = pa.table({
        "doc_id": pa.array([0, 1, 37, 40], pa.int64()),
        "text": [_doc(30, 0), _doc(30, 1), _doc(30, 2), _doc(30, 3)],
    })
    out = D.eval_shingle_batch(t, eval_mod=37)
    want = set(int(v) for v in D._shingle_hashes(t["text"][0].as_py())) | \
        set(int(v) for v in D._shingle_hashes(t["text"][2].as_py()))
    got = out["h32"].to_pylist()
    assert got == sorted(want)          # distinct + sorted
    assert out.schema.field("h32").type == pa.int64()


def test_decontaminate_scan_matches_bruteforce(ray_session):
    import ray
    # doc 0 is the eval doc; doc 5 copies half of it (contaminated),
    # doc 6 is clean, doc 7 is a verbatim copy (fully contaminated)
    ev_text = _doc(60, seed=7)
    half = " ".join(ev_text.split()[:30])
    rows = pa.table({
        "doc_id": pa.array([0, 5, 6, 7], pa.int64()),
        "text": [ev_text, half + " " + _doc(30, seed=9),
                 "zebra quokka wombat " * 20, ev_text],
    })
    ev = D.eval_shingle_batch(rows, eval_mod=37)
    eval_sorted = np.unique(ev["h32"].to_numpy(zero_copy_only=False))
    scan = D.DecontaminateScan(ray.put(eval_sorted), eval_mod=37)
    out = scan(rows).to_pandas().set_index("doc_id")
    assert 0 not in out.index           # eval rows excluded from output
    ev_set = set(int(v) for v in eval_sorted)
    for d in (5, 6, 7):
        hs = D._shingle_hashes(rows["text"][list(rows["doc_id"].to_pylist()).index(d)].as_py())
        n_hit = sum(1 for h in set(int(v) for v in hs) if h in ev_set)
        # scan counts DISTINCT-per-doc shingles (shingle_hashes is distinct)
        assert out.loc[d, "n_shingles"] == len(hs)
        assert out.loc[d, "n_contaminated"] == n_hit
    assert bool(out.loc[5, "is_contaminated"])
    assert not bool(out.loc[6, "is_contaminated"])
    assert out.loc[7, "n_contaminated"] == out.loc[7, "n_shingles"]


def test_decontaminate_oracle_sql_matches_kernel():
    from pdfextract_ray.pipelines.queries import _build_decontaminate_sql
    ev_text = _doc(40, seed=3)
    rows = pa.table({
        "doc_id": pa.array([0, 37, 2, 3], pa.int64()),   # 0,37 = eval
        "text": [ev_text, _doc(40, seed=4),
                 " ".join(ev_text.split()[:20]) + " " + _doc(20, seed=5),
                 "unrelated words entirely " * 10],
    })
    con = duckdb.connect()
    con.register("documents", rows)
    oracle = con.sql(_build_decontaminate_sql()).df() \
        .sort_values("doc_id").reset_index(drop=True)

    ev_set: set = set()
    for d, t in zip(rows["doc_id"].to_pylist(), rows["text"].to_pylist()):
        if d % 37 == 0:
            ev_set.update(int(v) for v in D._shingle_hashes(t))
    recs = []
    for d, t in zip(rows["doc_id"].to_pylist(), rows["text"].to_pylist()):
        if d % 37 == 0:
            continue
        hs = [int(v) for v in D._shingle_hashes(t)]
        hit = sum(1 for h in hs if h in ev_set)
        recs.append({"doc_id": d, "n_shingles": len(hs),
                     "n_contaminated": hit, "is_contaminated": hit > 0})
    mine = pd.DataFrame(recs).sort_values("doc_id").reset_index(drop=True)
    assert list(oracle["doc_id"]) == list(mine["doc_id"])
    for col in ["n_shingles", "n_contaminated", "is_contaminated"]:
        assert list(oracle[col]) == list(mine[col]), col


# ------------------------------------------------- removal variant (C4)

def test_remove_duplicate_paragraphs_matches_bruteforce(ray_session):
    import ray.data

    shared = " ".join(WORDS[:16])
    rows = [{"doc_id": i, "text": _doc(50, seed=200 + i)} for i in range(6)]
    rows += [
        {"doc_id": 30, "text": shared + " " + _doc(40, seed=11)},
        {"doc_id": 31, "text": shared + " " + _doc(40, seed=12)},
        # within-doc repeat: second occurrence must be removed too
        {"doc_id": 32, "text": shared + " " + shared},
        {"doc_id": 33, "text": ""},
        # case variation: hashing is case-insensitive, rebuild keeps case
        {"doc_id": 34, "text": shared.upper() + " " + _doc(40, seed=13)},
    ]

    # brute force: global first occurrence per hash in (doc_id, widx) order
    first_of: dict[int, tuple[int, int]] = {}
    for r in sorted(rows, key=lambda r: r["doc_id"]):
        for w, h in enumerate(D.paragraph_hashes(r["text"])):
            first_of.setdefault(h, (r["doc_id"], w))
    want = {}
    for r in rows:
        words = ascii_words(r["text"])
        hs = D.paragraph_hashes(r["text"])
        kept: list[str] = []
        removed = 0
        for w, h in enumerate(hs):
            if first_of[h] == (r["doc_id"], w):
                kept.extend(words[w * D.PARA_WORDS:(w + 1) * D.PARA_WORDS])
            else:
                removed += 1
        want[r["doc_id"]] = (" ".join(kept), len(hs), removed)

    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    out = D.remove_duplicate_paragraphs(ds).to_pandas().set_index("doc_id")
    got = {int(d): (r["clean_text"], int(r["n_paras"]), int(r["n_removed"]))
           for d, r in out.iterrows()}
    assert got == want
    # planted facts: 30 keeps its shared window (global first), 31 loses
    # it, 32's second copy goes, 34's UPPER copy goes but keeps case in
    # what remains, empty doc passes through
    assert got[30][2] == 0 and got[31][2] == 1
    assert got[32][2] >= 1
    assert got[33] == ("", 0, 0)
    assert got[34][2] >= 1 and got[34][0].islower()


def test_remove_duplicate_paragraphs_no_duplicates_passthrough(ray_session):
    import ray.data
    rows = [{"doc_id": i, "text": _doc(50, seed=300 + i)} for i in range(5)]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    out = D.remove_duplicate_paragraphs(ds).to_pandas().set_index("doc_id")
    assert int(out["n_removed"].sum()) == 0
    for r in rows:
        assert out.loc[r["doc_id"], "clean_text"] == \
            " ".join(ascii_words(r["text"]))
