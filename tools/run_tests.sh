#!/usr/bin/env bash
# Committed suite runner (the reference locks its suite in with GitHub
# Actions, .github/workflows/CI.yml; this is the one-command local
# equivalent and the entry the CI workflow calls).
#
# The conftest already forces CPU + 8 virtual devices + f64; this script
# pins the process environment that must exist BEFORE the interpreter
# starts on axon-equipped machines (the sitecustomize imports jax at
# startup — PALLAS_AXON_POOL_IPS must be empty by then, CLAUDE.md).
set -euo pipefail
cd "$(dirname "$0")/.."
export PALLAS_AXON_POOL_IPS=
export JAX_PLATFORMS=cpu
export PYTHONPATH="$(pwd)${PYTHONPATH:+:$PYTHONPATH}"
exec python -m pytest tests/ -q "$@"
