"""Root conftest: force CPU with 8 virtual devices for the test suite.

The session environment boots a TPU tunnel backend ('axon') from
sitecustomize in every Python process; tests always run on a virtual
8-device CPU mesh instead (multi-chip sharding is validated there, and the
driver separately exercises the real chip via __graft_entry__).  Env vars
must be set before the CPU client is created, and the platform override must
be applied through jax.config because sitecustomize already set it.
"""

import os
import re
import sys

flags = os.environ.get("XLA_FLAGS", "")
# REPLACE any pre-existing device-count flag: a leftover pin (e.g. =4
# from an experiment) would fail every 8-device mesh test obscurely
flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "", flags)
os.environ["XLA_FLAGS"] = (
    flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_ENABLE_X64"] = "1"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(__file__))
