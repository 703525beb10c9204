from .predict import infer_main, predict_ensemble, write_submission

__all__ = ["infer_main", "predict_ensemble", "write_submission"]
