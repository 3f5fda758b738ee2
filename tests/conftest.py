import os

# Tests run on CPU with a virtual 8-device mesh so sharding code paths are
# exercised without TPU hardware. XLA_FLAGS must be set before the first
# backend initialization; the platform choice additionally goes through
# jax.config because a site customization may have imported jax (and baked
# in JAX_PLATFORMS from the environment) before this conftest runs.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

GOLDEN = pathlib.Path(__file__).parent / "golden"


def _parse_golden(path):
    sections = {}
    cur = None
    with open(path) as fp:
        for line in fp:
            line = line.rstrip("\n")
            if line.startswith("SECTION "):
                cur = line.split()[1]
                sections[cur] = []
            elif cur is not None:
                sections[cur].append(line)
    return sections


@pytest.fixture(scope="session")
def golden():
    return _parse_golden(GOLDEN / "reference_golden.txt")


@pytest.fixture(scope="session")
def brdc_path():
    # The canonical RINEX file; copied from the reference data assets.
    p = GOLDEN / "brdc3540.14n"
    assert p.exists()
    return str(p)
