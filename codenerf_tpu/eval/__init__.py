from codenerf_tpu.eval.tto import TTOState, init_tto_state, make_tto_step
from codenerf_tpu.eval.render import make_image_renderer

__all__ = ["TTOState", "init_tto_state", "make_tto_step",
           "make_image_renderer"]
