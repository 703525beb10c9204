from .ctr_model import CTRModel, build_model_spec
from .dare import DARE
from .qnn_alpha import QNNAlpha
from .feature_embed import NumericFeatureEmbedding, BinaryFeatureEmbedding

__all__ = [
    "CTRModel",
    "build_model_spec",
    "DARE",
    "QNNAlpha",
    "NumericFeatureEmbedding",
    "BinaryFeatureEmbedding",
]
