from .layers import (
    linear_init, linear_apply, bidir_conv_init, bidir_conv_apply,
    add_knowledge,
)
from .gcn import Model, build_model, MODEL_REGISTRY
