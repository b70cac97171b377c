from hsenet_tpu.ops.attention import multi_head_attention, sdpa_reference

__all__ = ["multi_head_attention", "sdpa_reference"]
