import pytest


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session per pytest run (driver instruction). Only tests that
    exercise Ray Data stages request this fixture; pure-function tests stay
    Ray-free and fast."""
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
        )
    yield
    ray.shutdown()
