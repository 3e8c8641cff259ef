import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
        )
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_corpus(tmp_path_factory):
    """200-page synthetic corpus + gold tables, generated once per session."""
    from pdf_entity_extraction_ray.sources.corpus import write_corpus

    out = str(tmp_path_factory.mktemp("corpus"))
    write_corpus(out, n_pages=200, seed=42, n_per_type=25)
    return out
