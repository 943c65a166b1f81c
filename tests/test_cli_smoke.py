"""End-to-end CLI smoke: train.py -> orbax checkpoint -> sample.py, as
subprocesses on CPU (the verify-skill recipe).  Guards the CLI surface —
flag parsing, dataset dispatch, trainer wiring, checkpoint round-trip,
sampler restore — not numerics (covered elsewhere)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, cwd):
    env = dict(os.environ)
    env.update(JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="",
               XLA_FLAGS="--xla_force_host_platform_device_count=1")
    r = subprocess.run([sys.executable] + args, cwd=cwd, env=env,
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, f"{args}\nSTDOUT:{r.stdout[-2000:]}\n" \
                              f"STDERR:{r.stderr[-2000:]}"
    return r


@pytest.mark.slow
def test_train_then_sample_cli(tmp_path):
    # tiny synthetic latent memmap (image-size 64 -> latent 8)
    n, shape = 64, (4, 8, 8)
    feats = np.memmap(tmp_path / "latents.dat", np.float32, mode="w+",
                      shape=(n, *shape))
    labels = np.memmap(tmp_path / "labels.dat", np.int64, mode="w+",
                       shape=(n,))
    rng = np.random.default_rng(0)
    feats[:] = rng.standard_normal((n, *shape)).astype(np.float32)
    labels[:] = rng.integers(0, 4, n)
    feats.flush(); labels.flush()

    results = tmp_path / "results"
    _run(["train.py", "--exp", "smoke", "--results-dir", str(results),
          "--model", "DiM-S/2", "--image-size", "64", "--num-classes", "4",
          "--dataset", "latent_memmap", "--datadir", str(tmp_path),
          "--global-batch-size", "8", "--epochs", "1",
          "--block-type", "combined", "--bimamba-type", "none",
          "--cond-mamba", "--rms-norm", "--learnable-pe",
          "--use-attn-every-k-layers", "2", "--log-every", "2",
          "--save-content-every", "1", "--plot-every", "99",
          "--ckpt-every", "99", "--num-workers", "0"], REPO)
    content = results / "smoke" / "content"
    assert content.is_dir() and any(content.iterdir())
    log = (results / "smoke" / "log.txt").read_text()
    assert "loss=" in log

    out = tmp_path / "gen"
    _run(["sample.py", "ODE", "--ckpt", str(content),
          "--model", "DiM-S/2", "--image-size", "64", "--num-classes", "4",
          "--block-type", "combined", "--bimamba-type", "none",
          "--cond-mamba", "--rms-norm", "--learnable-pe",
          "--use-attn-every-k-layers", "2",
          "--sampling-method", "euler", "--num-sampling-steps", "4",
          "--global-batch-size", "2", "--sample-dir", str(out)], REPO)
    assert any(out.iterdir())


@pytest.mark.slow
def test_sample_pp_cli_matches_pp1(tmp_path):
    """sample.py --pp 2 (block stack staged over a 2-device 'stage' mesh)
    produces the same latents as --pp 1, via the real CLI + orbax restore."""
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, REPO)
    from dimsum_tpu.models.dim import DiM, DiM_models
    from dimsum_tpu.parallel import (
        create_optimizer, create_train_state,
    )
    from dimsum_tpu.utils.ckpt import save_checkpoint

    cfg = DiM_models["DiM-S8/2"](
        img_resolution=8, in_channels=4, num_classes=4, label_dropout=0.1,
        rms_norm=True, block_type="combined", cond_mamba=True,
        learnable_pe=True, use_attn_every_k_layers=4)
    model = DiM(cfg)
    x = jnp.zeros((1, 4, 8, 8))
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)),
                        jnp.zeros((1,), jnp.int32))["params"]
    state = create_train_state(params, create_optimizer())
    ckpt = tmp_path / "content"
    save_checkpoint(str(ckpt), state, 0)

    outs = {}
    for pp in (1, 2):
        out = tmp_path / f"gen_pp{pp}"
        env_extra = {"XLA_FLAGS": "--xla_force_host_platform_device_count=2"}
        args = ["sample.py", "ODE", "--ckpt", str(ckpt),
                "--model", "DiM-S8/2", "--image-size", "64",
                "--num-classes", "4", "--block-type", "combined",
                "--bimamba-type", "none", "--cond-mamba", "--rms-norm",
                "--learnable-pe", "--use-attn-every-k-layers", "4",
                "--sampling-method", "euler", "--num-sampling-steps", "4",
                "--global-batch-size", "2", "--seed", "7",
                "--cfg-scale", "1.0", "--pp", str(pp),
                "--sample-dir", str(out)]
        env = dict(os.environ)
        env.update(JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="", **env_extra)
        r = subprocess.run([sys.executable] + args, cwd=REPO, env=env,
                           capture_output=True, text=True, timeout=900)
        assert r.returncode == 0, f"pp={pp}\nSTDOUT:{r.stdout[-2000:]}\n" \
                                  f"STDERR:{r.stderr[-2000:]}"
        outs[pp] = np.load(out / "latents.npz")["latents"]

    np.testing.assert_allclose(outs[2], outs[1], rtol=2e-4, atol=2e-5)


@pytest.mark.slow
@pytest.mark.slow
def test_sample_ddp_streaming_cli(tmp_path):
    """sample_ddp.py --eval-streaming: generated batches stream straight
    into the detector (fid+kid+pr over ONE generator/detector pass, no PNG
    round-trip) -- the r4 50k-pipeline mode.  Asserts all three metrics
    report finite values and that no image files were written."""
    from PIL import Image

    rng = np.random.default_rng(0)
    real = tmp_path / "real"
    real.mkdir()
    for i in range(16):
        arr = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        Image.fromarray(arr).save(real / f"{i:03d}.png")

    out = tmp_path / "gen"
    _run(["sample_ddp.py", "ODE", "--model", "DiM-S/2",
          "--image-size", "64", "--num-classes", "4",
          "--block-type", "combined", "--bimamba-type", "none",
          "--cond-mamba", "--rms-norm", "--learnable-pe",
          "--use-attn-every-k-layers", "2",
          "--sampling-method", "euler", "--num-sampling-steps", "2",
          "--per-proc-batch-size", "4", "--num-fid-samples", "8",
          "--vae-ckpt", "random", "--sample-dir", str(out),
          "--eval-refdir", str(real), "--eval-streaming",
          "--eval-metric", "fid2k_full,kid50k_full,pr50k3_full"], REPO)
    pngs = list(out.glob("*.png"))
    assert not pngs, f"streaming mode wrote images: {pngs[:3]}"
    for metric, keys in [("fid2k_full", ["fid2k_full"]),
                         ("kid50k_full", ["kid50k_full"]),
                         ("pr50k3_full", ["pr50k3_full_precision",
                                          "pr50k3_full_recall"])]:
        report = out / f"metric-{metric}.jsonl"
        assert report.exists(), f"missing {report}"
        rec = json.loads(report.read_text().strip().splitlines()[-1])
        for k in keys:
            assert np.isfinite(rec["results"][k]), (metric, rec)


def test_calc_metrics_cli(tmp_path):
    """calc_metrics.py over two tiny PNG folders with the random-projection
    smoke detector: flag parsing, folder datasets, registry dispatch, and
    the jsonl report (reference eval_toolbox/calc_metrics.py CLI)."""
    from PIL import Image

    rng = np.random.default_rng(0)
    for name in ("real", "gen"):
        d = tmp_path / name
        d.mkdir()
        for i in range(16):
            arr = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"{i:03d}.png")
    run_dir = tmp_path / "out"
    _run(["calc_metrics.py", "--metrics", "fid2k_full",
          "--real-dir", str(tmp_path / "real"),
          "--gen-dir", str(tmp_path / "gen"),
          "--image-size", "32", "--batch-size", "8",
          "--cache-dir", str(tmp_path / "cache"),
          "--run-dir", str(run_dir)], REPO)
    report = run_dir / "metric-fid2k_full.jsonl"
    assert report.exists()
    rec = json.loads(report.read_text().strip().splitlines()[-1])
    assert np.isfinite(rec["results"]["fid2k_full"])
