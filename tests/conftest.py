import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))           # fixtures_html
sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))  # repo root


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
            # workers must be able to import the library and test helpers
            # (callables defined in test modules pickle by reference)
            runtime_env={
                "env_vars": {"PYTHONPATH": f"{repo}:{os.path.join(repo, 'tests')}"}
            },
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()
