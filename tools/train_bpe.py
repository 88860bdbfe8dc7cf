"""Regenerate the FROZEN BPE merges table
(pdfextract_ray/data/bpe_merges.txt).

Deterministic: trains on the sf0.001 documents table (sorted read,
no sampling, no RNG) with a fixed merge budget. Run ONLY for an
intentional tokenizer change — every token count downstream (pack
budgets, doc_token_stats) shifts with the table, so say so in the
commit message (same policy as tools/freeze_goldens.py).

Usage: python3 tools/train_bpe.py [--sf-dir /root/testdata/sf0.001]
                                  [--n-merges 512]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--n-merges", type=int, default=512)
    args = ap.parse_args()

    import pyarrow.parquet as pq

    from pdfextract_ray.stages.bpe import (DEFAULT_MERGES_PATH, save_merges,
                                           train_bpe_merges)

    t = pq.read_table("%s/documents.parquet" % args.sf_dir,
                      columns=["doc_id", "text"]).sort_by("doc_id")
    texts = [s for s in t["text"].to_pylist() if s]
    # the synthetic corpus has a ~31-word vocabulary — enrich the
    # training text with the package's own bundled deterministic word
    # lists (gazetteer surnames + stopwords, each repeated so pairs
    # clear the trainer's count>=2 floor) for real subword structure
    data = Path(__file__).resolve().parent.parent / \
        "pdfextract_ray" / "data"
    gaz = [ln.split(",")[0] for ln in
           (data / "gazetteer.txt").read_text().splitlines()
           if ln and not ln.startswith("#")]
    stop = (data / "stopwords.txt").read_text().strip().split(",")
    texts += [" ".join(gaz)] * 3 + [" ".join(stop)] * 3
    merges = train_bpe_merges(texts, n_merges=args.n_merges)
    save_merges(merges, DEFAULT_MERGES_PATH)
    print("wrote %d merges to %s" % (len(merges), DEFAULT_MERGES_PATH))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
