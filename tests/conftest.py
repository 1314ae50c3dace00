"""Shared fixtures: ONE Ray session per pytest run."""

from __future__ import annotations

import pytest
import ray


@pytest.fixture(scope="session")
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_lake(tmp_path_factory):
    """A small deterministic transcript lake on disk (24 convs incl.
    one mega conversation), shared across tests."""
    from pdf_extractor_ray.datagen import write_lake

    d = tmp_path_factory.mktemp("lake")
    write_lake(str(d), n_convs=24, seed=42, convs_per_file=8, mega_every=24)
    return str(d)
