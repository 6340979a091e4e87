from genrl_tpu.ops.pallas.flash_attention import flash_attention, naive_attention

__all__ = ["flash_attention", "naive_attention"]
