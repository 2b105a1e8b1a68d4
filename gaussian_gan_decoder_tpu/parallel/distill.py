"""Multi-chip distillation step: DP over latents/views via pjit shardings.

Upgrades the reference's strictly single-GPU decoder training
(/root/reference/main/train_pano2gaussian_decoder.py:118 — device='cuda:0',
one view per step) to a per-device view batch: each device draws its own
latent + camera, renders its own target and decode, and the parameter
gradient is the mean across devices. XLA emits the psum over ICI from the
sharding annotations — this is the TPU replacement for the reference GAN
loop's flattened-grad all_reduce (training_loop.py:286-299).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..decoder.heads import GaussianDecoder
from ..decoder.target_pipeline import TargetSamplerConfig
from ..losses import IRSE50, VGG16LPIPS
from ..splat.rasterize import RasterizeConfig
from ..train.distill import DistillConfig, TrainState, make_loss_fn, make_optimizer


def make_parallel_train_step(
    mesh: Mesh,
    decoder: GaussianDecoder,
    frozen_generator_params,
    vgg: VGG16LPIPS,
    vgg_params,
    irse: Optional[IRSE50] = None,
    irse_params=None,
    cfg: DistillConfig = DistillConfig(),
    target_cfg: TargetSamplerConfig = TargetSamplerConfig(),
    raster_cfg: RasterizeConfig = RasterizeConfig(),
):
    """Returns jitted step(state, keys (B,2), zs (B,1,z_dim), iteration)
    -> (state, metrics) with B sharded over mesh axis 'data'.

    Frozen nets (generator/VGG/IR-SE50) are closed over and replicated.
    """
    tx = make_optimizer(decoder, cfg)
    # belt-and-braces vs donate_argnums: if the caller's train state was
    # built to alias frozen_generator_params (init_train_state copies, but
    # hand-built states may not), donation would delete these buffers
    frozen_generator_params = jax.tree.map(jnp.copy, frozen_generator_params)
    loss_fn = make_loss_fn(
        decoder, frozen_generator_params, vgg, vgg_params, irse, irse_params,
        cfg, target_cfg, raster_cfg,
    )

    def batch_loss(params, keys, zs, iteration):
        losses, (metrics, _aux) = jax.vmap(
            lambda k, z: loss_fn(params, k, z, iteration)
        )(keys, zs)
        return jnp.mean(losses), jax.tree.map(jnp.mean, metrics)

    def step(state: TrainState, keys, zs, iteration):
        (_, metrics), grads = jax.value_and_grad(batch_loss, has_aux=True)(
            state.params, keys, zs, iteration
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(new_params, new_opt, state.step + 1), metrics

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        step,
        in_shardings=(repl, data, data, None),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )
