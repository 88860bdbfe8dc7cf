"""From-scratch byte-level BPE (stages/bpe.py): trainer determinism,
fast-vs-definitional encoder parity, frozen-table stability, the Ray
counting stage, and `pack --bpe` / `token-stats` CLI wiring."""

import glob
import os
import random

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pdfextract_ray.stages.bpe import (BpeEncoder, encode_slow, load_merges,
                                       save_merges, token_counts_bpe,
                                       train_bpe_merges)
from pdfextract_ray.stages.textstats import ascii_words

CORPUS = ["the cat sat on the mat with the hat",
          "the cats sat on mats with hats",
          "catalog of the catapult category",
          "university institute department"] * 3


def test_trainer_deterministic():
    m1 = train_bpe_merges(CORPUS, n_merges=64)
    m2 = train_bpe_merges(list(CORPUS), n_merges=64)
    assert m1 == m2 and len(m1) > 0


def test_trainer_count_floor():
    """Pairs occurring once are never merged (count >= 2 floor)."""
    merges = train_bpe_merges(["xy"], n_merges=10)
    assert merges == []
    merges = train_bpe_merges(["xy xy"], n_merges=10)
    assert merges == [(b"x", b"y")]


def test_fast_encoder_equals_definitional_replay():
    """Greedy min-rank encode == replaying the merges list in training
    order — on trained tables this equivalence is a theorem (a merge's
    operands only arise from earlier merges); fuzz it over random
    corpora and words both seen and unseen."""
    rng = random.Random(20260820)
    alphabet = "abcdef"
    for trial in range(25):
        corpus = [" ".join("".join(rng.choice(alphabet)
                                   for _ in range(rng.randint(1, 8)))
                           for _ in range(rng.randint(2, 30)))
                  for _ in range(rng.randint(1, 6))]
        merges = train_bpe_merges(corpus, n_merges=rng.randint(1, 40))
        enc = BpeEncoder(merges)
        probes = [w for c in corpus for w in c.split()][:10] + [
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 12)))
            for _ in range(10)] + ["", "zzz", "aaaaaaaaaaaa"]
        for w in probes:
            wb = w.encode()
            assert enc.encode(wb) == encode_slow(wb, merges), (
                trial, w, merges)


def test_encode_roundtrip_bytes():
    """Token symbols always concatenate back to the word bytes (byte
    coverage: no unknown tokens, any input encodes)."""
    merges = train_bpe_merges(CORPUS, n_merges=64)
    enc = BpeEncoder(merges)
    for w in ("the", "category", "überraschung", "日本語", "x" * 100):
        wb = w.encode("utf-8")
        assert b"".join(enc.encode(wb)) == wb


def test_n_tokens_contracts():
    enc = BpeEncoder(train_bpe_merges(CORPUS, n_merges=64))
    assert enc.n_tokens("") == 0
    assert enc.n_tokens(None) == 0
    text = "the cat sat"
    assert enc.n_tokens(text) == sum(
        len(enc.encode(w.encode())) for w in ascii_words(text))
    # caching changes nothing
    assert enc.n_tokens(text) == enc.n_tokens(text)


def test_frozen_table_loads_and_pins():
    """The bundled frozen table is non-trivial and gives stable,
    sub-word-length counts on English-ish words."""
    merges = load_merges()
    assert len(merges) >= 256
    enc = BpeEncoder(merges)
    for w in ("university", "institute", "department"):
        n = enc.n_tokens_word(w.encode())
        assert 1 <= n < len(w), (w, n)
    # byte-fallback on arbitrary content: always encodes, never more
    # tokens than bytes
    assert 1 <= enc.n_tokens_word(b"\xff\xfe\x00") <= 3


def test_frozen_table_fast_equals_slow_on_corpus_words():
    """The shipped frozen table, not just synthetic trained ones:
    greedy min-rank == definitional replay over every distinct word of
    the sf0.001 corpus plus gazetteer/stopword vocabulary samples."""
    import pyarrow.parquet as pq
    merges = load_merges()
    enc = BpeEncoder(merges)
    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["text"])
    vocab = set()
    for s in t["text"].to_pylist():
        if s:
            vocab.update(ascii_words(s))
    vocab.update(["university", "Smith", "Johnson", "catastrophe",
                  "überraschung", "x" * 40])
    assert vocab
    for w in sorted(vocab):
        wb = w.encode("utf-8")
        assert enc.encode(wb) == encode_slow(wb, merges), w


def test_save_load_roundtrip(tmp_path):
    merges = train_bpe_merges(CORPUS, n_merges=32)
    p = tmp_path / "m.txt"
    save_merges(merges, p)
    assert load_merges(p) == merges


@pytest.mark.usefixtures("ray_session")
def test_ray_stage_matches_driver_counts():
    import ray.data
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": ["the cat sat on the mat", "", None]})
    out = token_counts_bpe(ray.data.from_arrow(t)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    enc = BpeEncoder()
    assert list(out["n_tokens"]) == [enc.n_tokens("the cat sat on the mat"),
                                     0, 0]


@pytest.mark.usefixtures("ray_session")
def test_cli_token_stats_and_pack_bpe(tmp_path):
    from pdfextract_ray.__main__ import main

    texts = ["the quick brown fox jumps over the lazy dog " * (i + 1)
             for i in range(8)]
    src = str(tmp_path / "docs.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(8), pa.int64()),
        "text": texts}), src)

    out1 = str(tmp_path / "stats")
    assert main(["token-stats", src, "--out", out1]) == 0
    t = pq.read_table(glob.glob(os.path.join(out1, "*.parquet"))) \
        .sort_by("doc_id")
    enc = BpeEncoder()
    assert t.column("n_ws_tokens").to_pylist() == [
        len(ascii_words(s)) for s in texts]
    assert t.column("n_bpe_tokens").to_pylist() == [
        enc.n_tokens(s) for s in texts]

    # pack --bpe: budgets denominate in the SAME frozen-table counts
    out2 = str(tmp_path / "packs")
    budget = enc.n_tokens(texts[3])  # fits docs 0-3 individually
    assert main(["pack", src, "--bpe", "--budget", str(budget),
                 "--out", out2]) == 0
    pk = pq.read_table(glob.glob(os.path.join(out2, "*.parquet"))) \
        .sort_by("doc_id")
    assert pk.column("n_tokens").to_pylist() == [
        enc.n_tokens(s) for s in texts]
    # packing invariants on real counts: per-pack load = sum of member
    # counts; no non-oversized pack exceeds the budget
    import collections
    loads = collections.Counter()
    for row in pk.to_pylist():
        loads[row["pack_id"]] += row["n_tokens"]
    for row in pk.to_pylist():
        assert loads[row["pack_id"]] == row["pack_tokens"]
        if not row["oversized"]:
            assert row["pack_tokens"] <= budget
        else:
            assert row["n_tokens"] > budget

def test_frozen_table_fast_equals_slow_unicode_fuzz():
    """Arbitrary unicode words (multi-byte UTF-8, emoji, controls)
    against the FROZEN table: greedy == replay, and symbols always
    reassemble to the original bytes."""
    rng = random.Random(77)
    merges = load_merges()
    enc = BpeEncoder(merges)
    for _ in range(300):
        n = rng.randint(0, 12)
        w = "".join(chr(rng.choice([rng.randint(33, 126),
                                    rng.randint(0x80, 0x2FFF),
                                    rng.randint(0x1F300, 0x1F64F)]))
                    for _ in range(n))
        wb = w.encode("utf-8")
        syms = enc.encode(wb)
        assert syms == encode_slow(wb, merges), w
        assert b"".join(syms) == wb
