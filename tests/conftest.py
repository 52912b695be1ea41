"""Test bootstrap: force an 8-device virtual CPU mesh.

Multi-device sharding tests run on virtual CPU devices
(``--xla_force_host_platform_device_count=8``); the axon sitecustomize forces
``jax_platforms=axon,cpu`` at interpreter start, so we override via
``jax.config`` (env vars alone are ignored once register() has run).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    )

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    from jsa_rag_tpu.parallel.mesh import make_mesh

    return make_mesh(n_data=2, n_index=4)


@pytest.fixture(scope="session")
def mesh_flat():
    from jsa_rag_tpu.parallel.mesh import make_mesh

    return make_mesh(n_data=1, n_index=8)
