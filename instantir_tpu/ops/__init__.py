from instantir_tpu.ops.attention import dot_product_attention, attention_xla, flash_attention

__all__ = ["dot_product_attention", "attention_xla", "flash_attention"]
