#!/bin/bash
# Environment bootstrap — the TPU-native analog of the reference's
# start_docker.bash (python_ordinary/bash_scripts/start_docker.bash),
# which launches its CUDA container. There is no container here: this
# verifies the JAX TPU/CPU runtime, builds the native library, and runs
# the installation self-check.
set -e
cd "$(dirname "$0")/.."

echo "== python/jax =="
if ! timeout "${TPU_PROBE_TIMEOUT:-60}" python - <<'EOF'
import jax
print("jax", jax.__version__, "backend", jax.default_backend())
print("devices:", jax.devices())
EOF
then
    echo "[warn] accelerator backend unreachable; checking CPU fallback"
    PYTHONPATH= JAX_PLATFORMS=cpu python -c \
        "import jax; print('jax', jax.__version__, 'cpu OK')"
fi

echo "== native library =="
./native/build.sh

echo "== installation self-check =="
PYTHONPATH= JAX_PLATFORMS=cpu python -m isogs_slam_tpu.scripts.test_installation

echo "environment ready"
