import pytest


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run (TESTDATA.md contract)."""
    import ray
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def gazetteer():
    from pdfextract_ray.kernel.names import load_gazetteer
    return load_gazetteer()


@pytest.fixture(scope="session")
def tiny_corpus():
    """48 deterministic corpus rows derived from sf0.001 documents."""
    from pdfextract_ray.sources.corpus import corpus_table_local
    return corpus_table_local("/root/testdata/sf0.001", limit=48)
