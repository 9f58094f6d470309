#!/bin/bash
# Run the test suite on CPU with 8 virtual devices, bypassing the TPU relay
# (tests never need the real chip; this also keeps them runnable while a
# benchmark holds the TPU claim).
cd "$(dirname "$0")/.."
# build the native libraries on demand (the .so files are not checked in)
if { [ ! -f native/libespitch.so ] || [ ! -f native/libesadpcm.so ]; } \
        && command -v g++ >/dev/null; then
    make -C native >/dev/null 2>&1 || true
fi
exec env PALLAS_AXON_POOL_IPS= PYTHONPATH= JAX_PLATFORMS=cpu \
    XLA_FLAGS="--xla_force_host_platform_device_count=8" \
    python -m pytest tests/ "$@"
