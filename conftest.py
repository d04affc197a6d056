"""Repo-root pytest bootstrap.

Force the test suite onto a virtual 8-device CPU mesh (the standard JAX
substitute for multi-chip hardware, SURVEY.md §4) BEFORE any jax backend
initializes. The container sets ``JAX_PLATFORMS=axon`` (a tunneled TPU) in
the ambient environment; running hundreds of tiny test compiles through that
tunnel is both slow and wasteful, and tests must not depend on the real chip.
``bench.py`` and ``__graft_entry__.py`` are unaffected — they run on the TPU.
"""

import os
import sys

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

# Must be forced (not setdefault): the ambient env says "axon", and jax has
# already been imported by the container's sitecustomize, which baked the env
# var into jax.config — so update the config directly.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
