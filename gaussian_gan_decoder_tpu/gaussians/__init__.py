from .cameras import Camera, make_camera, projection_matrix
from .sh import SH_C0, eval_sh, rgb_to_sh, sh_to_rgb
from .model import GaussianScene, gaussian_scene_from_decoded
from . import ply
