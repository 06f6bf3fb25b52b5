from .resnet import ModelSpec, build_spec, init_model, forward  # noqa: F401
from .topology import NETWORK_PERTURBATIONS, stem_spec  # noqa: F401
