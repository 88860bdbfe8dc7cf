"""Oversized-document stress: the kernel must stay linear and the skew
router must isolate the giant row (north rule: skew-aware splitting)."""

import time

import pyarrow as pa

from pdfextract_ray.kernel.document import run_document


def _giant_html(n_paras: int = 400) -> bytes:
    words = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do".split()
    paras = ["<p>%s.</p>" % " ".join(words[(i + k) % len(words)] for k in range(100))
             for i in range(n_paras)]
    return ('<html><body data-columns="2"><header>site header</header>'
            "<footer>footer line</footer><h1>Giant Doc</h1>"
            + "".join(paras) + "</body></html>").encode()


def test_kernel_handles_giant_doc_linearly():
    html = _giant_html(400)
    t0 = time.time()
    r = run_document(html)
    dt = time.time() - t0
    assert r.n_pages > 30
    assert r.title == "Giant Doc"
    assert dt < 10.0  # linear-ish; a quadratic regression would blow this


def test_skew_router_isolates_giant_row(ray_session):
    import ray.data
    from datetime import datetime
    from pdfextract_ray.pipelines.extract_pipeline import extract_dataset

    ts = datetime(2024, 1, 1)
    rows = [{"url": "u%d" % i, "warc_ts": ts,
             "html": b"<p>small page %d</p>" % i, "lang": "en"} for i in range(20)]
    rows.append({"url": "giant", "warc_ts": ts, "html": _giant_html(300),
                 "lang": "en"})
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    out = extract_dataset(ds, concurrency=2, skew_threshold=50_000,
                          with_spans=False).to_pandas()
    assert len(out) == 21
    assert out["error"].isna().all()
    g = out[out["url"] == "giant"].iloc[0]
    assert g["n_pages"] > 20
