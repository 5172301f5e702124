from codenerf_tpu.eval.tto import (TTOState, init_tto_state, make_tto_step,
                                   BatchedTTOMetrics, init_batched_tto_state,
                                   make_batched_tto_step, select_per_object)
from codenerf_tpu.eval.render import make_image_renderer

__all__ = ["TTOState", "init_tto_state", "make_tto_step",
           "BatchedTTOMetrics", "init_batched_tto_state",
           "make_batched_tto_step", "select_per_object",
           "make_image_renderer"]
