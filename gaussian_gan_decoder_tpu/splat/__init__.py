from .projection import build_rotation, build_cov3d, project_gaussians
from .rasterize import RasterizeConfig, rasterize, render_simple, reference_rasterize
