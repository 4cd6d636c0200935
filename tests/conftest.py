"""Test configuration.

Tests run on CPU with 8 virtual XLA devices so that multi-chip sharding
logic (mesh/shard_map data parallelism) is exercised without TPU hardware,
per SURVEY.md §4(d), and so results are hermetic/deterministic. Pallas
kernels run in interpreter mode here; on-hardware validation happens via
`bench.py` / the driver's compile checks. Set BTR_TEST_TPU=1 to run the
suite on whatever accelerator is available instead.

Note: the hosted-TPU environment's sitecustomize force-updates
``jax_platforms`` to "axon,cpu" *after* env vars are read, so setting
JAX_PLATFORMS alone is not enough — we must update the config again here
(before any backend is initialised).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

if os.environ.get("BTR_TEST_TPU", "0") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
