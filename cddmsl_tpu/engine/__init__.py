from .train_loop import TrainState, make_caption_pl_step, make_eval_step, make_train_step

__all__ = ["TrainState", "make_caption_pl_step", "make_eval_step", "make_train_step"]
