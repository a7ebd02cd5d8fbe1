from . import preprocess  # noqa: F401
from .encoders import (EncoderSpec, create_box_encoder, make_constant_encoder,
                       make_dummy_encoder, make_mars_encoder)  # noqa: F401
from .mars import MarsNet  # noqa: F401
from .mars_q import (make_mars_int8_encoder, mars_int8_apply,  # noqa: F401
                     quantize_mars)
from .registry import (COCO_LABELS, ScriptedDetector, create_detector,
                       load_labels)  # noqa: F401
