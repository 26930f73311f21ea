"""Test configuration: force an 8-virtual-device CPU mesh (SURVEY.md §4.2).

All tests run on CPU with XLA_FLAGS forcing 8 host devices, so every
shard_map / collective code path is exercised without a pod slice; the
same program runs unchanged on real TPU meshes. Pallas kernels run in
interpret mode on CPU (the engine selects this automatically).

Set BWTPU_TEST_TPU=1 to run the suite on the real chip instead.
"""

import os

if not os.environ.get("BWTPU_TEST_TPU"):
    # Force CPU even if the ambient environment selects the TPU platform
    # (e.g. JAX_PLATFORMS=axon): running the unit suite over the TPU
    # tunnel turns every op into a remote RPC.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    # The container's sitecustomize pre-registers the axon TPU plugin and
    # re-exports JAX_PLATFORMS=axon at interpreter start; the config
    # update below out-ranks it.
    import jax

    jax.config.update("jax_platforms", "cpu")
    # Persistent compilation cache: the default tier is jit-compile
    # dominated (ring/engine program variants), and the programs are
    # identical run-to-run — cache them on disk so repeat runs (and
    # the two xdist workers, which share the dir) skip recompilation
    # (VERDICT r4 item 8: tier budget). Keyed by HLO; a code change
    # just misses and recompiles.
    _cache = os.path.join(os.path.dirname(__file__), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(12345)
