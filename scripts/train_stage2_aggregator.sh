#!/usr/bin/env bash
# Stage-2 Aggregator training — reference train_stage2_aggregator.sh:
# batch 6, lr 1e-4, text_drop 0.85, cond_drop 0.15, image_drop 0, EMA adapter.
python -m instantir_tpu.cli.train stage2 \
    --sdxl_path "$SDXL_PATH" \
    --vision_encoder_path "$VISION_ENCODER_PATH" \
    --adapter_path stage1_out/adapter_ckpt.pt \
    --previewer_lora_path previewer_out/previewer_lora_weights.bin \
    --data_config config_files/IR_dataset.yaml \
    --data_dir "$DATA_DIR" \
    --losses_config config_files/losses.yaml \
    --output_dir stage2_out \
    --train_batch_size 6 \
    --learning_rate 1e-4 \
    --lr_scheduler constant \
    --resolution 512 \
    --image_drop_rate 0.0 \
    --text_drop_rate 0.85 \
    --cond_drop_rate 0.15 \
    --use_ema_adapter \
    --checkpointing_steps 2000 \
    --resume_from_checkpoint latest \
    --gradient_checkpointing \
    "$@"
