import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
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


@pytest.fixture(scope="session")
def minicorpus():
    """The 10-doc corpus from the reference's ReferenceMatchingTests
    (src/Infidex.Tests/ReferenceMatchingTests.cs:20-36 — public test code)."""
    return [
        (1, "The quick brown fox jumps over the lazy dog"),
        (2, "A journey of a thousand miles begins with a single step"),
        (3, "To be or not to be, that is the question"),
        (4, "All that glitters is not gold"),
        (5, "The fox was quick and clever in the forest"),
        (6, "Batman and Robin fight crime in Gotham City"),
        (7, "Superman flies faster than a speeding bullet"),
        (8, "Spider-Man swings through New York City"),
        (9, "Wonder Woman protects the innocent"),
        (10, "The Flash runs at incredible speeds"),
    ]
