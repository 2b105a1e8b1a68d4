from .bias_act import bias_act, activation_funcs
from .upfirdn2d import (
    setup_filter,
    upfirdn2d,
    upsample2d,
    downsample2d,
    filter2d,
)
from .grid_sample import grid_sample_2d, grid_sample_3d
from .modulated_conv import modulated_conv2d, conv2d_resample
from .filtered_lrelu import filtered_lrelu
from .resize import resize_bilinear
from .knn import mean_sq_dist_to_knn
