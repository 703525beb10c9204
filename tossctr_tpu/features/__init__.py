from .covis import CovisConfig, CovisJoiner, build_covis_features

__all__ = ["CovisConfig", "CovisJoiner", "build_covis_features"]
