#!/bin/bash
# Fast test runner: skip the axon TPU relay registration (adds ~23s per python process)
PALLAS_AXON_POOL_IPS= exec python -m pytest "$@"
