#!/usr/bin/env bash
# Batch restoration at the canonical operating point (reference infer.sh).
python -m instantir_tpu.cli.infer \
    --sdxl_path "$SDXL_PATH" \
    --instantir_path "$INSTANTIR_PATH" \
    --vision_encoder_path "$VISION_ENCODER_PATH" \
    --test_path "$1" \
    --out_path "${2:-./output}" \
    --num_inference_steps 30 \
    --cfg 7.0 \
    --preview_start 0.1 \
    --creative_start 0.7 \
    --batch_size 6 \
    --seed 42 \
    "${@:3}"
