#!/usr/bin/env bash
# Build and run the sadvio_tpu container (analog of reference docker/run.sh).
# On a Cloud TPU VM pass the TPU through with --privileged and the usual
# /dev/accel* devices; on CPU it runs the same pipeline on the host platform.
#
# Modes:
#   ./docker/run.sh [args...]           run the container (default entry)
#   ./docker/run.sh compare DATASET_DIR [compare_euroc.py args...]
#       one-command comparison protocol: mounts the sequence, runs this
#       build (and the reference binary, if baked into the image at
#       $REF_BIN with $REF_CONFIG) on it, prints the ATE/fps table and
#       writes log_slam/compare_out/comparison.json on the host.
set -euo pipefail
cd "$(dirname "$0")/.."
docker build -t sadvio_tpu -f docker/Dockerfile .

if [[ "${1:-}" == "compare" ]]; then
    shift
    DATASET="$1"; shift
    REF_ARGS=()
    # the reference build location inside the image, when present
    # (see docker/Dockerfile notes; override via env)
    REF_BIN="${REF_BIN:-/opt/isae_slam/build/isae_slam}"
    REF_CONFIG="${REF_CONFIG:-/opt/isae_slam/ros/config}"
    docker run --rm -it --privileged \
        -v "$(realpath "$DATASET"):/data/sequence:ro" \
        -v "$(pwd)/log_slam:/opt/sadvio_tpu/log_slam" \
        --entrypoint python3 \
        sadvio_tpu tools/compare_euroc.py \
        --dataset /data/sequence \
        --out log_slam/compare_out \
        --ref-bin "$REF_BIN" --ref-config "$REF_CONFIG" \
        "$@"
    exit 0
fi

docker run --rm -it --privileged \
    -v "$(pwd)/log_slam:/opt/sadvio_tpu/log_slam" \
    sadvio_tpu "$@"
