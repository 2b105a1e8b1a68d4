"""End-to-end media pipeline smoke tests: PTI -> projected-w video, and
the style-mixing interpolation grid (ref gen_videos_proj_withseg.py,
gen_interpolation.py)."""
import os

import numpy as np
import pytest


@pytest.mark.slow
def test_invert_to_proj_video_end_to_end(tmp_path):
    """apps/invert.py --smoke -> projected_w.npz + finetuned_generator ->
    apps/gen_videos_proj.py renders an orbit from them (the reference's
    projector_withseg -> gen_videos_proj_withseg chain)."""
    from PIL import Image

    from gaussian_gan_decoder_tpu.apps import gen_videos_proj, invert

    target = tmp_path / "target.png"
    rng = np.random.RandomState(0)
    Image.fromarray((rng.rand(32, 32, 3) * 255).astype(np.uint8)).save(target)

    outdir = tmp_path / "pti"
    invert.main([
        "--target", str(target), "--smoke", "--outdir", str(outdir),
        "--num_steps", "3", "--num_steps_pti", "3",
    ])
    assert (outdir / "projected_w.npz").exists()
    w = np.load(outdir / "projected_w.npz")["w"]
    assert w.ndim == 3 and np.isfinite(w).all()

    vdir = tmp_path / "video"
    gen_videos_proj.main([
        "--latents", str(outdir / "projected_w.npz"),
        "--finetuned", str(outdir / "finetuned_generator"),
        "--mode", "orbit", "--w_frames", "3",
        "--neural_rendering_resolution", "16",
        "--outdir", str(vdir),
    ])
    frames = sorted(f for f in os.listdir(vdir) if f.startswith("frame_"))
    assert len(frames) == 3
    traj = np.load(vdir / "trajectory.npy")
    assert traj.shape == (3, 16) and np.isfinite(traj).all()
    # camera actually orbits: translation moves between frames
    assert not np.allclose(traj[0], traj[1])


def test_interpolation_grid(tmp_path):
    from gaussian_gan_decoder_tpu.apps import gen_interpolation

    outdir = tmp_path / "interp"
    gen_interpolation.main([
        "--smoke", "--cuts", "0,2", "--outdir", str(outdir),
        "--neural_rendering_resolution", "16",
    ])
    files = os.listdir(outdir)
    assert any(f.startswith("img_interpolation_seed") for f in files)
    from PIL import Image

    img = np.asarray(Image.open(outdir / files[0]))
    # 3 rows (2 cuts + pure ws0) x 3 views at 16^2 raw resolution
    assert img.shape == (3 * 16, 3 * 16, 3)


def test_gen_samples_forid_random_views(tmp_path):
    """--random_views renders N per-seed random views saved individually
    (ref gen_samples_forID.py:181-190)."""
    import os

    from gaussian_gan_decoder_tpu.apps.gen_samples import main as gs_main

    out = str(tmp_path / "forid")
    gs_main(["--smoke", "--force_cpu", "--seeds", "0,1",
             "--random_views", "2", "--outdir", out])
    names = sorted(os.listdir(out))
    assert names == ["seed0000_0.png", "seed0000_1.png",
                     "seed0001_0.png", "seed0001_1.png"]


def test_calc_mbs_smoke(tmp_path):
    """MBS runs end-to-end on the smoke generator with the native GAN
    mask source; the shipped bcg-force makes the swap a no-op, so the
    metric is ~0 by construction (ref calc_mbs.py + triplane.py:184)."""
    from gaussian_gan_decoder_tpu.apps.calc_mbs import main as mbs_main

    mbs = mbs_main(["--smoke", "--force_cpu", "--n_sample", "4",
                    "--batch", "2"])
    assert mbs == mbs  # finite
    assert mbs < 1e-6
