from .topk_select import dare_topk_select, recency_log_decay
from .fm_cross import fm_cross_multihead

__all__ = ["dare_topk_select", "recency_log_decay", "fm_cross_multihead"]
