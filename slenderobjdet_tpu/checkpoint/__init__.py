from .checkpointer import DetectionCheckpointer, import_d2_weights, load_model_weights

__all__ = ["DetectionCheckpointer", "import_d2_weights", "load_model_weights"]
