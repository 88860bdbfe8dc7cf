"""From-scratch byte-level BPE tokenizer (token counting for the
assembly/packing family).

Public algorithm only: byte-pair encoding per Sennrich, Haddow &
Birch, "Neural Machine Translation of Rare Words with Subword Units"
(ACL 2016), applied over raw UTF-8 bytes per word (the GPT-2 framing
of "no unknown tokens": base vocabulary = the 256 byte values, every
merge adds one symbol). Nothing is learned at run time — the engine
ships a FROZEN merges table (``pdfextract_ray/data/bpe_merges.txt``,
regenerated only by ``tools/train_bpe.py``), so token counts are a
pure deterministic function of the text bytes, stable across runs,
machines and cluster sizes.

Contracts (tests pin these):

- **pre-tokenization** is the package-wide tokenizer contract —
  :func:`textstats.ascii_words` (split on ASCII whitespace, case
  PRESERVED — unlike the lowercased shingle paths, token counts are
  case-sensitive the way a real trainer tokenizer is);
- a word is encoded over its UTF-8 bytes; base tokens are single
  bytes, merges combine adjacent symbols greedily by RANK (lowest
  merge index first, leftmost occurrence on rank ties) — the classic
  BPE encode, equivalent to replaying the merges list in order
  (equivalence is property-tested against :func:`encode_slow`);
- the document token count is the sum of per-word token counts
  (whitespace itself is never tokenized);
- ``n_tokens("")`` = 0; null text counts 0.

Scale shape: stateless-after-init actor stage
(:class:`TokenCountBpe`) — the merges table and rank dict are built
once per actor in ``__init__``; ``__call__`` encodes per batch with a
per-actor word→count cache (web text is Zipfian: the cache hit rate
makes the encode cost per batch sub-linear in words). No shuffle; the
output is (id, int) rows.

Trainer determinism: pair counts are tallied over the word-frequency
table; the next merge is the (count, pair) maximum with ties broken
by the lexicographically SMALLEST pair of byte strings — no dict
iteration order, no hashing, no RNG.
"""

from __future__ import annotations

from pathlib import Path

import pyarrow as pa

from pdfextract_ray.stages.textstats import ascii_words

DEFAULT_MERGES_PATH = (Path(__file__).resolve().parent.parent
                       / "data" / "bpe_merges.txt")


# ------------------------------------------------------------ training

def train_bpe_merges(texts, n_merges: int = 512) -> list[tuple[bytes, bytes]]:
    """Learn ``n_merges`` byte-pair merges from an iterable of texts.

    Deterministic: most-frequent pair first, ties by lexicographically
    smallest (left, right) byte strings. Intended for
    ``tools/train_bpe.py`` (offline, small sample) — run-time stages
    only ever LOAD the frozen table."""
    # word frequency table over the pinned pre-tokenizer
    wordfreq: dict[bytes, int] = {}
    for text in texts:
        if not text:
            continue
        for w in ascii_words(text):
            b = w.encode("utf-8")
            wordfreq[b] = wordfreq.get(b, 0) + 1
    # each word as a tuple of byte-symbols
    words: list[tuple[list[bytes], int]] = [
        ([bytes([c]) for c in w], f) for w, f in sorted(wordfreq.items())]
    merges: list[tuple[bytes, bytes]] = []
    for _ in range(n_merges):
        counts: dict[tuple[bytes, bytes], int] = {}
        for syms, f in words:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        # max count, ties -> lexicographically smallest pair
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if counts[best] < 2:
            break  # nothing left worth merging
        merges.append(best)
        merged = best[0] + best[1]
        for syms, _ in words:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == best[0] and syms[i + 1] == best[1]:
                    syms[i:i + 2] = [merged]
                else:
                    i += 1
    return merges


def save_merges(merges: list[tuple[bytes, bytes]], path) -> None:
    """One merge per line, both sides hex-encoded (unambiguous for any
    byte content, diff-friendly)."""
    lines = ["%s %s" % (a.hex(), b.hex()) for a, b in merges]
    Path(path).write_text("\n".join(lines) + "\n", encoding="ascii")


def load_merges(path=None) -> list[tuple[bytes, bytes]]:
    path = DEFAULT_MERGES_PATH if path is None else path
    merges = []
    for line in Path(path).read_text(encoding="ascii").splitlines():
        line = line.strip()
        if not line:
            continue
        a, b = line.split(" ")
        merges.append((bytes.fromhex(a), bytes.fromhex(b)))
    return merges


# ------------------------------------------------------------ encoding

def encode_slow(word: bytes, merges: list[tuple[bytes, bytes]]
                ) -> list[bytes]:
    """Reference encoder: replay the merges list IN TRAINING ORDER,
    each merge applied left-to-right until fixpoint. O(M*L) — the
    definitional implementation the fast encoder is tested against."""
    syms = [bytes([c]) for c in word]
    for left, right in merges:
        i = 0
        while i < len(syms) - 1:
            if syms[i] == left and syms[i + 1] == right:
                syms[i:i + 2] = [left + right]
            else:
                i += 1
    return syms


class BpeEncoder:
    """Greedy rank-based encoder over a frozen merges table, with a
    per-instance word cache (build one per actor, never per batch)."""

    def __init__(self, merges: list[tuple[bytes, bytes]] | None = None):
        self.merges = load_merges() if merges is None else merges
        self.ranks = {pair: i for i, pair in enumerate(self.merges)}
        self._cache: dict[bytes, int] = {}

    def encode(self, word: bytes) -> list[bytes]:
        """Token symbols for one word: repeatedly merge the
        lowest-rank adjacent pair (leftmost on equal rank) — the
        standard BPE encode, equal to :func:`encode_slow` because
        replaying merges in training order merges pairs in exactly
        increasing-rank order (a later merge's operands can only be
        produced by earlier merges)."""
        syms = [bytes([c]) for c in word]
        ranks = self.ranks
        while len(syms) > 1:
            best_rank = None
            best_i = -1
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            # merge EVERY occurrence of the chosen pair left-to-right
            # (matches one pass of the training-order replay)
            left, right = syms[best_i], syms[best_i + 1]
            i = 0
            while i < len(syms) - 1:
                if syms[i] == left and syms[i + 1] == right:
                    syms[i:i + 2] = [left + right]
                else:
                    i += 1
        return syms

    def n_tokens_word(self, word: bytes) -> int:
        n = self._cache.get(word)
        if n is None:
            n = len(self.encode(word))
            # bound the cache: Zipf head dominates hits; evicting the
            # whole dict at 1M distinct words keeps the actor's heap
            # flat on adversarial (all-unique-words) corpora
            if len(self._cache) >= 1_000_000:
                self._cache.clear()
            self._cache[word] = n
        return n

    def n_tokens(self, text: str | None) -> int:
        if not text:
            return 0
        return sum(self.n_tokens_word(w.encode("utf-8"))
                   for w in ascii_words(text))


class TokenCountBpe:
    """Actor-pool stage: (id, n_tokens) per row under the frozen BPE
    table. Merges load + rank build + cache live in ``__init__`` (once
    per actor); ``__call__`` is pure per-batch compute."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text",
                 merges_path=None, out_col: str = "n_tokens",
                 keep_cols=()):
        self.id_col, self.text_col, self.out_col = id_col, text_col, out_col
        self.keep_cols = tuple(keep_cols)
        self.enc = BpeEncoder(load_merges(merges_path)
                              if merges_path else None)

    def __call__(self, t: pa.Table) -> pa.Table:
        ns = [self.enc.n_tokens(s)
              for s in t[self.text_col].to_pylist()]
        cols = {self.id_col: t[self.id_col]}
        for c in self.keep_cols:
            cols[c] = t[c]
        cols[self.out_col] = pa.array(ns, pa.int64())
        return pa.table(cols)


def token_counts_bpe(docs, id_col: str = "doc_id", text_col: str = "text",
                     merges_path=None, out_col: str = "n_tokens",
                     keep_cols=(), concurrency=(1, 8)):
    """(id, [keep_cols...,] n_tokens) Dataset over a corpus — the
    real-token-count front end for ``pack --budget`` /
    ``doc_token_stats``."""
    cols = [id_col, text_col] + [c for c in keep_cols
                                 if c not in (id_col, text_col)]
    return docs.select_columns(cols).map_batches(
        TokenCountBpe,
        fn_constructor_kwargs={"id_col": id_col, "text_col": text_col,
                               "merges_path": merges_path,
                               "out_col": out_col,
                               "keep_cols": keep_cols},
        batch_format="pyarrow", concurrency=concurrency)
