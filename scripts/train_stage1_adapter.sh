#!/usr/bin/env bash
# Stage-1 DCP adapter pretraining — canonical hyperparameters per the
# reference launcher (train_stage1_adapter.sh: batch 96, lr 1e-4 cosine).
# DP spans all local TPU devices automatically (no accelerate launcher).
python -m instantir_tpu.cli.train stage1 \
    --sdxl_path "$SDXL_PATH" \
    --vision_encoder_path "$VISION_ENCODER_PATH" \
    --data_config config_files/IR_dataset.yaml \
    --data_dir "$DATA_DIR" \
    --losses_config config_files/losses.yaml \
    --output_dir stage1_out \
    --train_batch_size 96 \
    --learning_rate 1e-4 \
    --lr_scheduler cosine \
    --lr_warmup_steps 1000 \
    --resolution 512 \
    --image_drop_rate 0.05 \
    --checkpointing_steps 2000 \
    --resume_from_checkpoint latest \
    --gradient_checkpointing \
    "$@"
