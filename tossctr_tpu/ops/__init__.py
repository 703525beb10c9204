from .topk_select import dare_select_ids, dare_topk_select, recency_log_decay
from .fm_cross import fm_cross_blocked, fm_cross_multihead
from .pallas_kernels import fm_cross_pallas
from .pallas_attention import fused_mha, fused_mha_qkv

__all__ = [
    "dare_select_ids",
    "dare_topk_select",
    "recency_log_decay",
    "fm_cross_blocked",
    "fm_cross_multihead",
    "fm_cross_pallas",
    "fused_mha",
    "fused_mha_qkv",
]
