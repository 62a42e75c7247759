#!/bin/bash
# Probe the tunneled TPU every ~2 min; the moment it answers, run the batched
# measurement session (scripts/tpu_session.sh) exactly once and exit.
# Every step is under timeout (never pkill; see CLAUDE.md).
set -u
cd "$(dirname "$0")/.."
SESSION=${1:-scripts/tpu_session.sh}
MARKER="bench/.$(basename "$SESSION" .sh)_done"
if [ -e "$MARKER" ]; then
    echo "session already ran ($MARKER exists)"; exit 0
fi
while true; do
    if timeout 90 python -c "import jax, jax.numpy as jnp; print(float(jnp.ones((8,128)).sum()))" >/dev/null 2>&1; then
        echo "=== TPU reachable at $(date -u +%FT%TZ); starting $SESSION ==="
        bash "$SESSION"
        touch "$MARKER"
        echo "=== watcher done ==="
        exit 0
    fi
    echo "tpu down at $(date -u +%FT%TZ); retrying in 120s"
    sleep 120
done
