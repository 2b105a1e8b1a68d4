from .pos_encoding import Embedder
from .heads import DecoderHead, GaussianDecoder
from .camera_sampling import (
    FOV_to_intrinsics,
    create_cam2world_matrix,
    sample_pose_gaussian,
    sample_pose_lookat,
    sample_pose_uniform,
    sample_camera_params,
)
from .surface import create_samples, marching_tetrahedra_sample, sigma_grid
from .target_pipeline import TargetSamplerConfig, sample_target
