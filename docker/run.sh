#!/usr/bin/env bash
# Build and run the sadvio_tpu container (analog of reference docker/run.sh).
# On a Cloud TPU VM pass the TPU through with --privileged and the usual
# /dev/accel* devices; on CPU it runs the same pipeline on the host platform.
set -euo pipefail
cd "$(dirname "$0")/.."
docker build -t sadvio_tpu -f docker/Dockerfile .
docker run --rm -it --privileged \
    -v "$(pwd)/log_slam:/opt/sadvio_tpu/log_slam" \
    sadvio_tpu "$@"
