from .resnet import (ModelSpec, build_spec, calibrate_scales,  # noqa: F401
                     forward, init_model, model_summary,
                     quantize_float_model)
from .topology import NETWORK_PERTURBATIONS, stem_spec  # noqa: F401
