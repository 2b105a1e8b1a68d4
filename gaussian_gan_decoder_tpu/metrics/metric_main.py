"""Metric registry + sampling loops.

Re-design of /root/reference/PanoHead/metrics/metric_main.py:44-155
(registry with fid50k_full / kid50k / pr50k3 / is50k entries) and the
feature loops of metric_utils.py, including the eg3d fork's DECODER path
(eg3d/metrics/metric_utils.py:286-322 + calc_metrics.py:57-100): instead
of G(z, c) volume rendering, samples flow through decode -> splat render.

Feature embedder: metrics take any `feature_fn` / `logits_fn`; the
reference-comparable choice is the ported InceptionV3
(metrics/inception.py + a pytorch-fid state dict — see apps/calc_metrics
--inception). Without a classifier, is50k reports NaN (documented).
"""
from __future__ import annotations

import time
from typing import Callable, Dict

import numpy as np

from .feature_stats import stats_for_iterator
from .frechet import fid_from_stats
from .kernel import kid_from_features
from .precision_recall import precision_recall

_metric_dict: Dict[str, Callable] = {}


def register_metric(fn):
    _metric_dict[fn.__name__] = fn
    return fn


def list_metrics():
    return sorted(_metric_dict)


def calc_metric(metric: str, *, real_batches, gen_batches,
                feature_fn=None, logits_fn=None, **kwargs) -> Dict:
    """(ref metric_main.py:44-87) -> {'results': {...}, 'metric', 'total_time'}."""
    assert metric in _metric_dict, f"unknown metric {metric}; have {list_metrics()}"
    t0 = time.time()
    results = _metric_dict[metric](
        real_batches=real_batches, gen_batches=gen_batches,
        feature_fn=feature_fn, logits_fn=logits_fn, **kwargs,
    )
    return dict(results=results, metric=metric, total_time=time.time() - t0)


@register_metric
def fid50k_full(*, real_batches, gen_batches, feature_fn, num_items=50_000, **_):
    real = stats_for_iterator(real_batches, feature_fn, num_items)
    gen = stats_for_iterator(gen_batches, feature_fn, num_items)
    return {"fid50k_full": fid_from_stats(real, gen)}


@register_metric
def kid50k_full(*, real_batches, gen_batches, feature_fn, num_items=50_000, **_):
    real = stats_for_iterator(real_batches, feature_fn, num_items,
                              capture_all=True, capture_mean_cov=False)
    gen = stats_for_iterator(gen_batches, feature_fn, num_items,
                             capture_all=True, capture_mean_cov=False)
    return {"kid50k_full": kid_from_features(real.get_all(), gen.get_all())}


@register_metric
def pr50k3_full(*, real_batches, gen_batches, feature_fn, num_items=50_000, **_):
    real = stats_for_iterator(real_batches, feature_fn, num_items,
                              capture_all=True, capture_mean_cov=False)
    gen = stats_for_iterator(gen_batches, feature_fn, num_items,
                             capture_all=True, capture_mean_cov=False)
    p, r = precision_recall(real.get_all(), gen.get_all())
    return {"pr50k3_full_precision": p, "pr50k3_full_recall": r}


@register_metric
def is50k(*, gen_batches, logits_fn=None, num_items=50_000, num_splits=10, **_):
    if logits_fn is None:
        return {"is50k_mean": float("nan"), "is50k_std": float("nan")}
    probs = []
    n = 0
    for imgs in gen_batches:
        p = np.asarray(logits_fn(imgs))
        p = np.exp(p - p.max(axis=1, keepdims=True))
        p = p / p.sum(axis=1, keepdims=True)
        probs.append(p)
        n += p.shape[0]
        if n >= num_items:
            break
    probs = np.concatenate(probs)[:num_items]
    scores = []
    for s in np.array_split(probs, num_splits):
        kl = s * (np.log(s + 1e-12) - np.log(s.mean(axis=0, keepdims=True) + 1e-12))
        scores.append(np.exp(kl.sum(axis=1).mean()))
    return {"is50k_mean": float(np.mean(scores)), "is50k_std": float(np.std(scores))}


@register_metric
def eqt50k_int(*, G=None, G_params=None, key=None, num_items=50_000,
               batch_size=4, real_batches=None, gen_batches=None,
               feature_fn=None, logits_fn=None, **_):
    """Integer-translation equivariance PSNR (ref eg3d/metrics/
    metric_main.py:141-146 -> equivariance.compute_equivariance_metrics)."""
    from .equivariance import compute_equivariance_metrics

    psnr, = compute_equivariance_metrics(
        G, G_params, key, num_samples=num_items, batch_size=batch_size,
        compute_eqt_int=True)
    return {"eqt50k_int": psnr}


@register_metric
def eqt50k_frac(*, G=None, G_params=None, key=None, num_items=50_000,
                batch_size=4, real_batches=None, gen_batches=None,
                feature_fn=None, logits_fn=None, **_):
    """Fractional-translation equivariance PSNR (ref metric_main.py:148-153)."""
    from .equivariance import compute_equivariance_metrics

    psnr, = compute_equivariance_metrics(
        G, G_params, key, num_samples=num_items, batch_size=batch_size,
        compute_eqt_frac=True)
    return {"eqt50k_frac": psnr}


@register_metric
def eqr50k(*, G=None, G_params=None, key=None, num_items=50_000,
           batch_size=4, real_batches=None, gen_batches=None,
           feature_fn=None, logits_fn=None, **_):
    """Rotation equivariance PSNR (ref metric_main.py:155-160)."""
    from .equivariance import compute_equivariance_metrics

    psnr, = compute_equivariance_metrics(
        G, G_params, key, num_samples=num_items, batch_size=batch_size,
        compute_eqr=True)
    return {"eqr50k": psnr}


# ----------------------------------------------------------------------------
# sample streams


def generator_image_batches(gen, gen_params, key, batch_size: int, c_source,
                            truncation_psi: float = 1.0):
    """Infinite stream of GAN images in [0,255] (ref metric_utils.py
    compute_feature_stats_for_generator)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def sample(k, c):
        z = jax.random.normal(jax.random.fold_in(k, 0), (batch_size, gen.z_dim))
        out = gen.apply(gen_params, z, c, truncation_psi=truncation_psi,
                        key=jax.random.fold_in(k, 1))
        img = out["image"] if "image" in out else out["image_raw"]
        return jnp.clip((img + 1) * 127.5, 0, 255)

    i = 0
    while True:
        import jax as _jax

        c = next(c_source)
        yield np.asarray(sample(_jax.random.fold_in(key, i), c))
        i += 1


def decoder_image_batches(decoder, params, frozen_params, target_cfg, key,
                          c_source, image_size: int = 512,
                          raster_backend: str = "xla"):
    """Decoder-FID stream: z,c -> surface -> decode -> splat render
    (ref eg3d/metrics/metric_utils.py:286-322)."""
    import jax
    import jax.numpy as jnp

    from ..decoder.snapshot import render_with_decoder
    from ..decoder.target_pipeline import sample_target

    gen = decoder.generator
    i = 0
    while True:
        k = jax.random.fold_in(key, i)
        c = jnp.asarray(next(c_source))
        z = jax.random.normal(jax.random.fold_in(k, 0), (1, gen.z_dim))
        t = sample_target(jax.random.fold_in(k, 1), gen, frozen_params, z,
                          camera_params=c[:1], cfg=target_cfg)
        cam2world = c[0, :16].reshape(4, 4)
        focal = c[0, 16]
        fov = 2 * jnp.arctan(0.5 / focal)
        img, _ = render_with_decoder(
            decoder, params, z, c[:1], cam2world, t.vertices, fov,
            image_size=image_size, backend=raster_backend,
        )
        yield np.asarray(jnp.clip(img * 255.0, 0, 255))[None]
        i += 1


@register_metric
def ppl2_wend(*, mapping_fn=None, synthesis_fn=None, dist_fn=None, key=None,
              c_source=None, num_samples=50_000, batch_size=8,
              epsilon=1e-4, z_dim=512, c_dim=25, real_batches=None,
              gen_batches=None, feature_fn=None, logits_fn=None, **_):
    """Perceptual Path Length, W space, endpoint sampling
    (ref PanoHead/metrics/metric_main.py:121-126 + perceptual_path_length.py).

    mapping_fn(key, z, c) -> ws; synthesis_fn(ws, c) -> images (N,3,H,W)
    — BOTH endpoints of a pair must be synthesized under the SAME
    conditioning c (the reference renders them in one batched synthesis
    call); dist_fn(a, b) -> (N,) perceptual distances (e.g. VGG16-LPIPS).
    Endpoint sampling: t = 0 exactly (reference 'end' mode) with a t+eps
    sibling; PPL = filtered mean of dist / eps^2, filtered to the
    [1, 99] percentile band computed with the reference's lower/higher
    interpolation."""
    import jax
    import jax.numpy as jnp

    assert mapping_fn is not None and synthesis_fn is not None and dist_fn is not None
    key = key if key is not None else jax.random.PRNGKey(0)
    n_batches = max(1, num_samples // batch_size)
    dists = []
    for i in range(n_batches):
        k = jax.random.fold_in(key, i)
        kz0, kz1 = jax.random.split(k, 2)
        z0 = jax.random.normal(kz0, (batch_size, z_dim))
        z1 = jax.random.normal(kz1, (batch_size, z_dim))
        c = (jnp.asarray(next(c_source)) if c_source is not None
             else jnp.zeros((batch_size, c_dim)))
        w0 = mapping_fn(k, z0, c)
        w1 = mapping_fn(k, z1, c)
        # 'end' sampling: t = 0 (ref perceptual_path_length.py sampling
        # mode 'end'); the sibling lerps to t + eps
        wt0 = w0
        wt1 = w0 + (w1 - w0) * epsilon
        img0 = synthesis_fn(wt0, c)
        img1 = synthesis_fn(wt1, c)
        dists.append(np.asarray(dist_fn(img0, img1)) / (epsilon ** 2))
    d = np.concatenate(dists)
    lo = np.percentile(d, 1, method="lower")
    hi = np.percentile(d, 99, method="higher")
    d = d[(d >= lo) & (d <= hi)]
    return {"ppl2_wend": float(d.mean())}
