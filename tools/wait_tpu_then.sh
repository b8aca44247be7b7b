#!/bin/bash
# Poll the TPU worker with a tiny matmul; when it answers, run the given
# command. Usage: wait_tpu_then.sh <max_wait_s> <command...>
set -u
cd "$(dirname "$0")/.."
MAX_WAIT=${1:-21600}
shift
START=$(date +%s)
while true; do
    if timeout 120 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((128,128), jnp.float32)
assert float(np.asarray((x@x).sum())) == 2097152.0
print('tpu-up')
" 2>/dev/null | grep -q tpu-up; then
        echo "worker up after $(( $(date +%s) - START )) s; launching: $*"
        exec "$@"
    fi
    if (( $(date +%s) - START > MAX_WAIT )); then
        echo "gave up after ${MAX_WAIT}s"
        exit 1
    fi
    sleep 150
done
