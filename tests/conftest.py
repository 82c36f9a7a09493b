"""Test configuration: CPU backend, float64, 8 virtual devices for sharding tests.

Parity strategy (SURVEY.md §4): the reference runs its test suite on float64;
we force x64 CPU jax and compare directly against the live reference
implementation (imported via tools/ref_shim) instead of storing binary goldens.
"""
import os
import sys
from pathlib import Path

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def ref_optiland():
    """Import the reference Optiland (numpy backend) for golden comparison.

    The reference is mounted at /root/reference in the development sandbox;
    on CI runners (or any checkout without it) the parity suites SKIP
    instead of erroring — they verify equivalence to the upstream
    implementation, which requires having it."""
    import tools.ref_shim  # noqa: F401
    from tools.ref_shim import REFERENCE_ROOT
    if not Path(REFERENCE_ROOT).exists():
        pytest.skip("reference Optiland not mounted (parity suites need "
                    f"{REFERENCE_ROOT})", allow_module_level=False)
    import optiland.backend as be
    be.set_backend("numpy")
    import optiland
    return optiland
