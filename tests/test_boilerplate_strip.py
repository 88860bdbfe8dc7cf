"""The north-rule behavior in one invariant: extracted main-content text
never contains the per-page header/footer site chrome, while the naive
``text`` column always does."""


def test_no_boilerplate_in_extracted_text(tiny_corpus, gazetteer):
    from pdfextract_ray.kernel.document import run_document

    header_marker = "digital library archive"
    footer_marker = "copyright example press"
    for i in range(tiny_corpus.num_rows):
        html = tiny_corpus.column("html")[i].as_py()
        naive = tiny_corpus.column("text")[i].as_py()
        assert header_marker in naive and footer_marker in naive
        r = run_document(html, gazetteer=gazetteer)
        assert header_marker not in r.text, tiny_corpus.column("url")[i].as_py()
        assert footer_marker not in r.text, tiny_corpus.column("url")[i].as_py()
        assert len(r.text) > 0
