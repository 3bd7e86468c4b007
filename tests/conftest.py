"""Test harness: run everything on a virtual 8-device CPU mesh.

Must set the env vars before jax is imported anywhere, so this conftest is the
first import in the test session. Real-TPU behavior is covered by bench.py and
__graft_entry__.py, which the driver runs on hardware.
"""

import os

# force (not setdefault): the driver environment pre-sets JAX_PLATFORMS=axon
# (the real-TPU tunnel), which makes every eager op a network round-trip
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pathlib
import sys

import pytest

import jax

# the axon sitecustomize (PYTHONPATH=/root/.axon_site) imports jax at
# interpreter startup with JAX_PLATFORMS=axon already read, so the env var
# alone doesn't stick — override the config explicitly
jax.config.update("jax_platforms", "cpu")

# compiles dominate test time on the 2-core CPU host; persist them across runs
jax.config.update("jax_compilation_cache_dir", "/tmp/lnb_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def real_model_dir():
    """Directory with the real Llama-3.1-8B files, or None (tests then skip).

    Mirrors the reference's skip-if-no-model guards
    (reference: cmd/main_test.go:52-55).
    """
    from llama_nuts_and_bolts_tpu.io.params import find_model_dir

    candidates = [
        os.environ.get("LNB_MODEL_DIR", ""),
        str(REPO_ROOT / "models-original" / "Meta-Llama-3.1-8B-Instruct"),
        "/root/models/Meta-Llama-3.1-8B-Instruct",
    ]
    return find_model_dir([c for c in candidates if c])


@pytest.fixture(scope="session")
def model_dir():
    d = real_model_dir()
    if d is None:
        pytest.skip("real Llama-3.1-8B-Instruct model files not available")
    return d
