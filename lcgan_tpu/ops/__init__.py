"""TPU-native op/layer library (≈ reference custom_layers.py, NHWC, Flax).

All spatial ops use NHWC layouts and HWIO kernels — the native TPU
convolution layout — and take a ``dtype`` compute precision (params are
always stored fp32; MXU accumulation is fp32 via ``preferred_element_type``).
"""

from lcgan_tpu.ops.equalized import EqualizedConv2d, EqualizedLinear, equalized_scale
from lcgan_tpu.ops.filters import avg_pool_2x2, box_filter_3x3, nearest_upsample_2x
from lcgan_tpu.ops.grid_sample import grid_sample_bicubic
from lcgan_tpu.ops.mapping import MappingNetwork, ProjectionHead
from lcgan_tpu.ops.mbstd import minibatch_stddev
from lcgan_tpu.ops.modulated import ModulatedConv2d, SynthesisLayer

__all__ = [
    "EqualizedConv2d",
    "EqualizedLinear",
    "equalized_scale",
    "avg_pool_2x2",
    "box_filter_3x3",
    "nearest_upsample_2x",
    "grid_sample_bicubic",
    "MappingNetwork",
    "ProjectionHead",
    "minibatch_stddev",
    "ModulatedConv2d",
    "SynthesisLayer",
]
