#!/bin/bash
# Run the test suite on a virtual 8-device CPU mesh.
#
# PYTHONPATH is cleared because this image's sitecustomize registers the
# axon TPU backend at interpreter start, which would override
# JAX_PLATFORMS=cpu and leave a single device.
exec env PYTHONPATH= JAX_PLATFORMS=cpu \
    XLA_FLAGS="--xla_force_host_platform_device_count=8" \
    python -m pytest "${@:-tests/}" -q
