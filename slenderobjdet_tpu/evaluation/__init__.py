from .coco_api import COCO
from .coco_evaluation import COCOEvaluator
from .evaluator import inference_on_dataset
from .slender_cocoeval import SlenderCOCOeval

__all__ = ["COCO", "COCOEvaluator", "inference_on_dataset", "SlenderCOCOeval"]
