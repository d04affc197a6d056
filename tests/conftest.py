"""Shared test fixtures.

Platform forcing (CPU + virtual 8-device mesh) happens in the repo-root
conftest.py, which runs before this module is imported.
"""

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
