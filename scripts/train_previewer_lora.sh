#!/usr/bin/env bash
# Previewer LCM-LoRA distillation — reference train_previewer_lora.sh:
# batch 32, 1000 train T / 50 DDIM T, LoRA r=64 alpha=1.
python -m instantir_tpu.cli.train previewer \
    --sdxl_path "$SDXL_PATH" \
    --vision_encoder_path "$VISION_ENCODER_PATH" \
    --adapter_path stage1_out/adapter_ckpt.pt \
    --data_config config_files/IR_dataset.yaml \
    --data_dir "$DATA_DIR" \
    --losses_config config_files/losses.yaml \
    --output_dir previewer_out \
    --train_batch_size 32 \
    --learning_rate 1e-4 \
    --lr_scheduler constant \
    --num_ddim_timesteps 50 \
    --w_min 3.0 --w_max 15.0 \
    --resolution 512 \
    --checkpointing_steps 2000 \
    --resume_from_checkpoint latest \
    --gradient_checkpointing \
    "$@"
