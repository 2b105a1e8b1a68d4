"""Metric machinery sanity: FID/KID/PR behave correctly on known
distributions; registry + decoder stream plumbing."""
import numpy as np
import pytest

from gaussian_gan_decoder_tpu.metrics import (
    FeatureStats,
    fid_from_stats,
    frechet_distance,
    kid_from_features,
    precision_recall,
)
from gaussian_gan_decoder_tpu.metrics.metric_main import calc_metric, list_metrics


def _stats(x):
    s = FeatureStats(capture_mean_cov=True)
    s.append(x)
    return s


def test_fid_zero_for_identical_and_grows_with_shift(rng):
    a = rng.randn(2000, 16)
    fid_same = fid_from_stats(_stats(a), _stats(a.copy()))
    assert abs(fid_same) < 1e-6
    b = a + 2.0
    fid_shift = fid_from_stats(_stats(a), _stats(b))
    assert abs(fid_shift - 16 * 4.0) < 1.0  # ||mu_diff||^2 = D * 2^2


def test_frechet_known_value():
    mu1, mu2 = np.zeros(4), np.ones(4)
    c = np.eye(4)
    # same covariance: FID = ||mu||^2
    np.testing.assert_allclose(frechet_distance(mu1, c, mu2, c), 4.0, atol=1e-8)


def test_kid_zero_same_positive_shifted(rng):
    a = rng.randn(800, 8)
    b = rng.randn(800, 8)
    kid_same = kid_from_features(a, a.copy(), num_subsets=10, max_subset_size=400)
    kid_diff = kid_from_features(a, b + 3, num_subsets=10, max_subset_size=400)
    # unbiased MMD^2 estimate fluctuates around 0 for same-distribution sets
    assert abs(kid_same) < 0.05
    assert kid_diff > 1.0


def test_precision_recall_overlap(rng):
    a = rng.randn(300, 4)
    p, r = precision_recall(a, a.copy() + rng.randn(300, 4) * 0.01)
    assert p > 0.9 and r > 0.9
    far = a + 100.0
    p2, r2 = precision_recall(a, far)
    assert p2 < 0.1 and r2 < 0.1


def test_registry_and_fid_pipeline(rng):
    assert "fid50k_full" in list_metrics()
    feats = lambda imgs: imgs.reshape(imgs.shape[0], -1)[:, :8]  # noqa: E731

    def batches(shift):
        while True:
            yield rng.randn(16, 2, 2, 2) + shift

    r = calc_metric(
        "fid50k_full", real_batches=batches(0.0), gen_batches=batches(0.0),
        feature_fn=feats, num_items=256,
    )
    assert r["results"]["fid50k_full"] < 0.5
    r2 = calc_metric(
        "fid50k_full", real_batches=batches(0.0), gen_batches=batches(5.0),
        feature_fn=feats, num_items=256,
    )
    assert r2["results"]["fid50k_full"] > 50.0


def test_ppl2_wend_smoke():
    """PPL registry entry: smooth generator -> finite small PPL; the value
    scales with the synthesis Lipschitz constant."""
    import jax
    import jax.numpy as jnp

    from gaussian_gan_decoder_tpu.metrics.metric_main import calc_metric

    W = jax.random.normal(jax.random.PRNGKey(0), (512, 3 * 8 * 8)) * 0.02

    def mapping_fn(key, z, c):
        return z

    def synthesis_fn(ws, c):
        # c: the shared per-pair conditioning (unused by this toy G)
        return jnp.tanh(ws @ W).reshape(-1, 3, 8, 8)

    def dist_fn(a, b):
        return jnp.mean((a - b) ** 2, axis=(1, 2, 3))

    out = calc_metric("ppl2_wend", real_batches=None, gen_batches=None,
                      mapping_fn=mapping_fn, synthesis_fn=synthesis_fn,
                      dist_fn=dist_fn, num_samples=64, batch_size=16)
    v = out["results"]["ppl2_wend"]
    assert jnp.isfinite(v) and v >= 0.0


def test_run_metric_pipeline_dry_run(tmp_path, capsys):
    """Batch runner (ref eg3d/run_metric_pipeline.py role): JSON argv
    lists -> subprocess commands; --dry_run prints without executing."""
    import json

    from gaussian_gan_decoder_tpu.apps.run_metric_pipeline import main

    batch = [["--checkpoint", "x.ckpt", "--metrics", "fid50k_full"],
             ["--network_pkl", "g.pkl", "--metrics", "kid50k"]]
    f = tmp_path / "batch.json"
    f.write_text(json.dumps(batch))
    results = main(["--batch", str(f), "--dry_run"])
    assert len(results) == 2
    assert all(r["returncode"] is None for r in results)
    out = capsys.readouterr().out
    assert "calc_metrics" in out and "fid50k_full" in out
