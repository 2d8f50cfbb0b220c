import glob

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

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
    ctx.execution_options.verbose_progress = False
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def pages_dir(tmp_path_factory):
    """Small deterministic pages_in corpus shared by the suite."""
    from studiocr_ray.fixtures import write_pages

    d = tmp_path_factory.mktemp("pages_in")
    write_pages(str(d), 120, seed=42, n_files=6)
    return str(d)


@pytest.fixture(scope="session")
def pages_table(pages_dir) -> pa.Table:
    return pa.concat_tables(
        pq.read_table(f) for f in sorted(glob.glob(pages_dir + "/*.parquet"))
    )
