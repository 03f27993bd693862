#!/bin/bash
# Run the test suite on a virtual 8-device CPU mesh.
#
# Default: the FAST tier (everything not marked @pytest.mark.slow).
#   ./run_tests.sh                 # fast tier
#   ./run_tests.sh --slow          # full suite incl. solver-convergence +
#                                  # training-loop tests (~45 min)
#   ./run_tests.sh tests/test_x.py # explicit selection (fast tier filter
#                                  # still applies unless --slow given)
#
# PYTHONPATH is cleared because this image's sitecustomize registers the
# axon TPU backend at interpreter start, which would override
# JAX_PLATFORMS=cpu and leave a single device.
#
# METAPDE_REQUIRE_DEVICES makes conftest.py FAIL (not skip) if the virtual
# mesh didn't come up — a run through this script must never silently lose
# its multi-device sharding coverage.
MARK=(-m "not slow")
if [ "${1:-}" = "--slow" ]; then
  MARK=()
  shift
fi
exec env PYTHONPATH= JAX_PLATFORMS=cpu \
    XLA_FLAGS="--xla_force_host_platform_device_count=8" \
    METAPDE_REQUIRE_DEVICES=8 \
    python -m pytest "${MARK[@]}" "${@:-tests/}" -q
