from .math_utils import get_ray_limits_box, linspace_batch, normalize_vecs
from .ray_sampler import sample_rays
from .ray_marcher import mip_ray_march
from .renderer import (
    generate_planes,
    project_onto_planes,
    sample_from_planes,
    ImportanceRenderer,
)
