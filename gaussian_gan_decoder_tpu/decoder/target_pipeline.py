"""Per-iteration distillation target sampler.

Functional re-design of TargetDataloader
(/root/reference/main/decoder_utils/target_dataloader.py:14-204). One call
produces everything the training step needs: target image from the FROZEN
generator, surface point cloud, camera, ws, truncation. Stateless —
latent reuse (`repeat_id`) and iteration-dependent truncation are driven
by explicit arguments/keys instead of internal counters.

The whole pipeline is jittable: camera sampling, frozen synthesis, sigma
grid, marching-tetrahedra surface sampling all run on device (the
reference pays a CPU marching-cubes round trip per step).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from ..models.triplane import TriPlaneGenerator
from ..utils import EasyDict
from .camera_sampling import sample_camera_params
from .surface import marching_tetrahedra_sample, sigma_grid


@dataclass(frozen=True)
class TargetSamplerConfig:
    cam_radius: float = 2.7
    truncation: float = 1.0
    truncation_ramp: int = 10_000
    init_truncation: float = 0.5
    camera_sampling: str = "uniform"      # 'uniform' | 'normal'
    vertical_stddev: float = 0.3          # units of pi (like the CLI flags)
    horizontal_stddev: float = 1.0
    fov_offset: float = 5.0
    fov_offset_scale: float = 12.0
    use_marching_cubes: bool = True
    bf16_probe: bool = False       # bf16 brick table for the FROZEN target
    # probes (~2^-8 feature err on a no-grad target; big speed win)
    int8_probe: bool = False       # int8 brick table for the frozen-target
    # probes (render passes + sigma grid share it): 256B rows gather
    # ~1.7x faster than bf16 512B rows at ~2^-7 relative feature error —
    # the probes gather ~8.7M table rows/step (2 render passes + 128^3
    # sigma grid), the dominant target-pipeline cost. Wins over bf16_probe.
    pallas_probe_build: bool = False  # Pallas table build (TPU; tri-grid)
    surface_thickness: float = 0.1
    shape_res: int = 128
    num_points: int = 500_000
    mc_level: float = 10.0
    face_capacity: int = 2 ** 20
    mt_two_stage: bool = True  # two-stage crossed-cube compaction in the
    # marching-tetrahedra pack (surface.py): ~7x smaller compaction sorts
    # + no 2-D case gather. Default ON per the PERFORMANCE.md protocol:
    # measured tetra stage 158.3 -> 92.3 ms, target pipeline 464.0 ->
    # 376.7 ms (r4 all-knobs ablate, /tmp/r4_measurements.txt); face-set
    # parity pinned by test_marching_tetrahedra_two_stage_parity.
    sigma_separable: bool = False  # separable lattice-resampling sigma
    # grid (surface.sigma_grid_separable): dense MXU interp matmuls
    # instead of ~3*R^3 table-row gathers. Default off until measured.
    sigma_chunk: int = 2 ** 18
    neural_rendering_resolution: int = 64


def truncation_at(cfg: TargetSamplerConfig, iteration) -> jax.Array:
    """Linear truncation ramp (ref target_dataloader.py:82-86)."""
    if cfg.truncation_ramp == 0:
        mag = jnp.asarray(1.0)
    else:
        mag = jnp.clip(jnp.asarray(iteration, jnp.float32) / cfg.truncation_ramp, 0, 1)
    return cfg.init_truncation * (1 - mag) + cfg.truncation * mag


def sample_target(
    key,
    generator: TriPlaneGenerator,
    gen_params,
    z: jax.Array,                         # (1, z_dim) — caller owns repeat_id
    iteration=None,
    camera_params: Optional[jax.Array] = None,
    cfg: TargetSamplerConfig = TargetSamplerConfig(),
    only_gan: bool = False,
    ws: Optional[jax.Array] = None,       # (1, num_ws, w_dim): skip mapping
    only_surface: bool = False,           # skip the target render (viewer /
    # PTI consumers that only need the surface vertices)
) -> EasyDict:
    """One target sample (ref get_data, target_dataloader.py:59-132).

    All generator evaluations are stop-gradient (frozen G)."""
    k_fov, k_cam, k_render, k_surf = jax.random.split(key, 4)
    result = EasyDict()

    if camera_params is None:
        fov_deg = (
            jax.random.uniform(k_fov, ()) * cfg.fov_offset_scale + cfg.fov_offset
        )
        camera_params, cam2world, h, v = sample_camera_params(
            k_cam, fov_deg,
            camera_sampling=cfg.camera_sampling,
            horizontal_stddev=cfg.horizontal_stddev,
            vertical_stddev=cfg.vertical_stddev,
            radius=cfg.cam_radius,
        )
        result.cam2world_pose = cam2world
        result.fov_deg = fov_deg
        result.cam_h = h
        result.cam_v = v

    truncation = (
        truncation_at(cfg, iteration) if iteration is not None else jnp.asarray(cfg.truncation)
    )
    result.truncation = truncation

    # frozen generator: ws with ZEROED camera conditioning (ref :90)
    if ws is None:
        ws = generator.mapping(
            gen_params, z, jnp.zeros_like(camera_params), truncation_psi=truncation
        )
    planes = generator.synthesis_planes(gen_params, ws, noise_mode="const")
    # ONE brick table for the render probes (coarse+importance) AND the
    # sigma grid below — all probe the same frozen planes. The separable
    # sigma grid samples the raw planes (no table): skip the build when
    # it is the only consumer, and never hand it a table it would ignore.
    probe_dtype = (jnp.int8 if cfg.int8_probe
                   else jnp.bfloat16 if cfg.bf16_probe else None)
    if only_surface and cfg.sigma_separable:
        table = None
    else:
        table = generator.build_sampling_table(
            planes, brick_dtype=probe_dtype,
            pallas_build=cfg.pallas_probe_build,
        )
        table = jax.lax.stop_gradient(table)
    sigma_table = None if cfg.sigma_separable else table
    if only_surface:
        planes = jax.lax.stop_gradient(planes)
        sigmas = jax.lax.stop_gradient(sigma_grid(
            generator, gen_params, planes, shape_res=cfg.shape_res,
            chunk=cfg.sigma_chunk, table=sigma_table,
            separable=cfg.sigma_separable))
        result.vertices = marching_tetrahedra_sample(
            k_surf, sigmas, level=cfg.mc_level, n_points=cfg.num_points,
            surface_thickness=cfg.surface_thickness,
            face_capacity=cfg.face_capacity, two_stage=cfg.mt_two_stage)
        result.gan_camera_params = camera_params
        result.ws = jax.lax.stop_gradient(ws)
        return result
    synth = generator.render_planes(
        gen_params, planes, ws, camera_params,
        neural_rendering_resolution=cfg.neural_rendering_resolution,
        noise_mode="const", key=k_render, plane_table=table,
    )
    synth = {k: jax.lax.stop_gradient(v) for k, v in synth.items()}
    planes = jax.lax.stop_gradient(planes)
    ws = jax.lax.stop_gradient(ws)

    # without_sr generators (tests / raw-resolution work) expose image_raw only
    image = synth["image"] if "image" in synth else synth["image_raw"]
    if only_gan:
        result.img = image
        return result

    img = jnp.clip((image + 1) / 2, 0, 1)

    sigmas = sigma_grid(
        generator, gen_params, planes, shape_res=cfg.shape_res,
        chunk=cfg.sigma_chunk, table=sigma_table,
        separable=cfg.sigma_separable,
    )
    sigmas = jax.lax.stop_gradient(sigmas)

    if cfg.use_marching_cubes:
        vertices = marching_tetrahedra_sample(
            k_surf, sigmas,
            level=cfg.mc_level,
            n_points=cfg.num_points,
            surface_thickness=cfg.surface_thickness,
            face_capacity=cfg.face_capacity,
            two_stage=cfg.mt_two_stage,
        )
    else:
        # sigma>10 voxel filter path (ref :120-122), fixed capacity via
        # uniform resampling of qualifying voxels
        from .surface import create_samples

        samples = create_samples(cfg.shape_res, generator.rk["box_warp"])[0]
        keep = sigmas.reshape(-1) > 10.0
        (idx,) = jnp.nonzero(keep, size=cfg.num_points, fill_value=0)
        vertices = samples[idx]

    result.img = img
    result.img_mask = synth.get("image_mask")
    result.vertices = vertices
    result.gan_camera_params = camera_params
    result.feature_planes = planes
    result.ws = ws
    result.z = z
    return result
