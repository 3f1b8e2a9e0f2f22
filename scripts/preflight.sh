#!/usr/bin/env bash
# Preflight gate: MUST pass before any end-of-round / snapshot commit.
#
# Round 4 ended red because a snapshot commit changed behavior
# (frames.py eager validation, rollout.py n_eval guard) without re-running
# the suite (VERDICT r4, Missing #1). This script is the unskippable gate:
#   1. full CPU test suite on the virtual 8-device mesh (same as CI),
#   2. the two driver contracts the round driver itself exercises
#      (__graft_entry__.entry compile-check + dryrun_multichip on a
#      virtual mesh).
#
# Usage:  bash scripts/preflight.sh          (~35-40 min: full suite)
#         bash scripts/preflight.sh --fast   (suite minus tests marked slow)
set -euo pipefail
cd "$(dirname "$0")/.."

MARK=()
if [[ "${1:-}" == "--fast" ]]; then
  MARK=(-m "not slow")
fi

echo "== preflight 1/3: pytest tests/ =="
python -m pytest tests/ -q "${MARK[@]}"

echo "== preflight 2/3: __graft_entry__.entry() compile-check (CPU) =="
JAX_PLATFORMS=cpu python - << 'EOF'
import jax
jax.config.update("jax_platforms", "cpu")
import __graft_entry__ as g
fn, args = g.entry()
out = jax.jit(fn).lower(*args).compile()(*args)
print("entry() compiled + ran:", jax.tree_util.tree_map(lambda x: getattr(x, "shape", x), out))
EOF

echo "== preflight 3/3: dryrun_multichip(8) on virtual CPU mesh =="
XLA_FLAGS="--xla_force_host_platform_device_count=8" JAX_PLATFORMS=cpu \
python - << 'EOF'
import jax
jax.config.update("jax_platforms", "cpu")
import __graft_entry__ as g
g.dryrun_multichip(8)
print("dryrun_multichip(8): ok")
EOF

echo "== preflight: ALL GREEN =="
