"""Repo-root pytest conftest: put the package on sys.path and pin the backend.

Tests run on an 8-device *virtual CPU* mesh (SURVEY.md §4.3): the axon TPU
tunnel serializes process access and is too slow for op-by-op test traffic,
and the virtual mesh exercises the real shard_map/collective code paths.
Note the env var JAX_PLATFORMS is NOT honored here — the axon plugin
overwrites it at import — so we must set the config programmatically.

Set RGBD_TPU_TESTS_ON_TPU=1 to run the suite against the real chip instead.
"""

import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.resolve()))

if os.environ.get("RGBD_TPU_TESTS_ON_TPU") != "1":
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
