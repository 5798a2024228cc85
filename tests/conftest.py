"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip behavior is validated on CPU (xla_force_host_platform_device_count);
real-TPU performance is measured by bench.py, not the unit suite.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

# persistent XLA compilation cache: scan kernels compile once per shape
import jax

# the environment's axon plugin force-sets jax_platforms post-import;
# override it so the unit suite runs on the virtual CPU mesh
jax.config.update("jax_platforms", "cpu")
from coati_tpu.provenance import jax_cache_dir

jax.config.update("jax_compilation_cache_dir", jax_cache_dir(REPO))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def mg94_table():
    """Default mar-mg 183x15 marginal table (t=0.0133, w=0.2, default pi)."""
    from coati_tpu.models import marginal_p, mg94_p

    pi = (0.308, 0.185, 0.199, 0.308)
    return marginal_p(mg94_p(0.0133, 0.2, pi), pi).astype(np.float32)


# The full suite deterministically segfaulted/aborted inside XLA:CPU
# compile/cache-load (always at the same test, ~1000 compiled executables
# into the process; any large SUBSET of the suite passes). Dropping the
# in-memory executable caches at module boundaries keeps the loaded-code
# population bounded; the host-keyed persistent disk cache makes the
# recompiles cheap.
import pytest as _pytest


@_pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    yield
    import gc

    jax.clear_caches()
    gc.collect()
