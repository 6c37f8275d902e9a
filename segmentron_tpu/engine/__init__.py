from .steps import TrainState, make_train_step, make_eval_step, make_predict_fn
from .trainer import Trainer
from .evaluator import Evaluator
from .tta import multi_scale_predict, predict_sliding, predict_whole

__all__ = [
    "TrainState",
    "make_train_step",
    "make_eval_step",
    "make_predict_fn",
    "Trainer",
    "Evaluator",
    "multi_scale_predict",
    "predict_sliding",
    "predict_whole",
]
