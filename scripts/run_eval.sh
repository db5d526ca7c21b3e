#!/usr/bin/env bash
# Benchmark runners (reference evaluation/*/run_aether.sh equivalents).
# Usage: scripts/run_eval.sh <checkpoint_dir> [data_root] [output_root]
set -euo pipefail

CKPT=${1:?usage: run_eval.sh <checkpoint_dir> [data_root] [output_root]}
DATA=${2:-data}
OUT=${3:-outputs/eval}

# ---- video depth: sintel / kitti / bonn, scale alignment ----
for ds in sintel kitti bonn; do
  python -m aether_tpu.eval.video_depth \
    --eval_dataset "$ds" --data_root "$DATA" \
    --output_dir "$OUT/video_depth/$ds" \
    --checkpoint "$CKPT" --num_inference_step 4 --align scale --resume
done

# ---- relative pose: sintel / tum / scannet ----
for ds in sintel tum scannet; do
  python -m aether_tpu.eval.rel_pose \
    --eval_dataset "$ds" --data_root "$DATA" \
    --output_dir "$OUT/rel_pose/$ds" \
    --checkpoint "$CKPT" --num_inference_step 4 --resume
done
