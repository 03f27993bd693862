"""Test fixtures: force an 8-device virtual CPU platform so multi-chip
sharding paths are exercised without TPU hardware (SURVEY.md section 4:
1-vs-N determinism tests).

NOTE: on images whose sitecustomize pre-registers a TPU backend (PYTHONPATH
pointing at an axon site dir), these env vars are too late — use
./run_tests.sh, which clears PYTHONPATH first. Tests that require multiple
devices skip themselves when fewer are available."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)

# On the canonical path (run_tests.sh) the virtual multi-device mesh is
# mandatory: fail loudly rather than letting device-gated sharding tests
# silently skip (e.g. when sitecustomize pre-registered a 1-chip TPU
# backend despite JAX_PLATFORMS=cpu).
_required = int(os.environ.get("METAPDE_REQUIRE_DEVICES", "0"))
if _required and len(jax.devices()) < _required:
    raise RuntimeError(
        f"METAPDE_REQUIRE_DEVICES={_required} but only "
        f"{len(jax.devices())} JAX devices came up "
        f"(platform={jax.devices()[0].platform}); the sharding tests "
        "would silently skip. Use ./run_tests.sh, which clears PYTHONPATH."
    )
