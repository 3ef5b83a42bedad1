"""Test configuration: force JAX onto a virtual 8-device CPU platform BEFORE
jax initializes, so multi-chip sharding logic is exercised on any host
(mirrors how the driver validates `dryrun_multichip`)."""

import os

# jax may already be imported (environments that preload a TPU backend via
# sitecustomize); jax.config still wins as long as no backend is initialized.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def synth_superres_root(tmp_path_factory):
    """Session-scoped synthetic super-resolution dataset on disk."""
    from retrieval_fuse_tpu.data.synthetic import generate_synthetic_dataset
    root = tmp_path_factory.mktemp("synth_sr")
    generate_synthetic_dataset(root, n_train=6, n_val=2, seed=3)
    return root


@pytest.fixture(scope="session")
def synth_superres_config(synth_superres_root):
    from retrieval_fuse_tpu.data.synthetic import make_synthetic_config
    return make_synthetic_config(synth_superres_root, task="superresolution")


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
