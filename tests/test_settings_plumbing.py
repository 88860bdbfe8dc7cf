"""Settings overrides change behavior end-to-end (the reference's
--set reference_flex semantics, readme.md 'Problems' section)."""

from pdfextract_ray.kernel.references import build_references
from pdfextract_ray.settings import DEFAULT_SETTINGS, Settings


def _sections():
    # two sections: a strong reference section and a weak late one
    strong = {"reference_score": 10.0, "lateness": 1.0, "year_ratio": 0.2,
              "lines": [], "content": "1. a (1999) 2. b (2000) 3. c (2001) 4. d (2002)"}
    weak = {"reference_score": 5.0, "lateness": 0.9, "year_ratio": 0.1,
            "lines": [], "content": "1. x (1999) 2. y (2000) 3. z (2001) 4. w (2002)"}
    return [strong, weak]


def test_reference_flex_widens_selection():
    tight = build_references(_sections(), DEFAULT_SETTINGS)  # flex 0.2 → only strong
    loose = build_references(_sections(), Settings(reference_flex=0.6))
    assert len(loose) > len(tight) > 0


def test_min_lateness_filters_early_sections():
    secs = _sections()
    secs[0]["lateness"] = 0.3
    out = build_references(secs, Settings(min_lateness=0.5))
    # strong section now too early → only weak survives the filter, but
    # its score (5.0) is below min_permittable (8.0) → nothing
    assert out == []
    out2 = build_references(secs, Settings(min_lateness=0.1))
    assert len(out2) > 0


def test_float_coercion_like_reference():
    s = DEFAULT_SETTINGS.with_overrides({"reference_flex": "0.35",
                                         "max_reference_order": "500"})
    assert s.reference_flex == 0.35
    assert s.max_reference_order == 500.0


def test_cli_set_changes_output(tmp_path):
    """--set title_slop exercises the CLI override path without Ray."""
    from pdfextract_ray.kernel.document import run_document
    from pdfextract_ray.sources.corpus import corpus_table_local

    t = corpus_table_local("/root/testdata/sf0.001", limit=3)
    html = t.column("html")[2].as_py()
    base = run_document(html)
    # title_slop 1.0 → every top-half region passes the height cut; the
    # highest-y region (the running header) wins instead of the h1
    loose = run_document(html, settings=Settings(title_slop=1.0))
    assert base.title != loose.title
    assert "digital library archive" in (loose.title or "")


def test_names_backend_string_override_passthrough():
    s = DEFAULT_SETTINGS.with_overrides({"names_backend": "none"})
    assert s.names_backend == "none"
    assert s.reference_flex == DEFAULT_SETTINGS.reference_flex


def test_names_backend_threads_to_kernel(gazetteer):
    """names_backend travels inside Settings (worker-safe), unlike the
    process-local set_detector: 'none' zeroes every section name_ratio."""
    from pdfextract_ray.kernel.document import run_document
    from pdfextract_ray.sources.corpus import corpus_table_local
    html = corpus_table_local("/root/testdata/sf0.001", limit=3).column("html")[2].as_py()
    base = run_document(html, gazetteer=gazetteer)
    off = run_document(html, Settings(names_backend="none"), gazetteer=gazetteer)
    assert any(s["name_ratio"] > 0 for s in base.sections)
    assert all(s["name_ratio"] == 0.0 for s in off.sections)
    # service backend: no server in the sandbox -> bare-rescue 0.0 (names.rb)
    svc = run_document(html, Settings(names_backend="service"), gazetteer=gazetteer)
    assert all(s["name_ratio"] == 0.0 for s in svc.sections)


def test_resolve_detector_rejects_unknown():
    import pytest
    from pdfextract_ray.kernel.names import resolve_detector, NamesDatabase
    assert resolve_detector("database") is NamesDatabase
    assert resolve_detector(NamesDatabase) is NamesDatabase
    with pytest.raises(ValueError):
        resolve_detector("mongo")


def test_names_backend_null_override_stays_none():
    """JSON config {"names_backend": null} must stay None (inherit the
    process default), not become the string "None"."""
    from pdfextract_ray.settings import DEFAULT_SETTINGS
    s = DEFAULT_SETTINGS.with_overrides({"names_backend": None})
    assert s.names_backend is None


def test_names_backend_validated_eagerly():
    """A typo'd backend fails at config-parse time, not mid-job."""
    import pytest
    from pdfextract_ray.settings import DEFAULT_SETTINGS
    with pytest.raises(ValueError, match="unknown names backend"):
        DEFAULT_SETTINGS.with_overrides({"names_backend": "databse"})
