"""Single-host sampler CLI, mirroring `/root/reference/dimsum/sample.py`.

Usage (reference scripts/sample.sh translates 1:1):
  python sample.py ODE --model DiM-L/2 --image-size 256 --ckpt <path> \
      --path-type GVP --num-classes 1001 --sampling-method dopri5 \
      --num-sampling-steps 250 --block-type combined --bimamba-type none \
      --rms-norm --fused-add-norm --learnable-pe --cond-mamba \
      --use-attn-every-k-layers 4 --cfg-scale 4.0

Differences from the reference: checkpoints may be reference .pt files
(auto-converted, "ema" key) or native orbax dirs; without --vae-ckpt the raw
latents are saved as .npz instead of decoded PNGs (zero-egress images).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

from dimsum_tpu.cli import (
    add_model_args, add_moe_args, add_ode_args, add_sde_args,
    add_transport_args, add_vae_args, build_transport,
)


def parse_args(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    mode = "ODE"
    if argv and argv[0] in ("ODE", "SDE"):
        mode = argv.pop(0)
    p = argparse.ArgumentParser()
    add_model_args(p)
    add_moe_args(p)
    add_transport_args(p)
    add_vae_args(p)
    if mode == "ODE":
        add_ode_args(p)
    else:
        add_sde_args(p)
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--params", type=str, default="ema",
                   choices=["ema", "raw"],
                   help="which weights to sample with from an orbax "
                        "checkpoint: the EMA shadow (reference protocol, "
                        "sample.py uses state_dict['ema']) or the raw "
                        "optimizer params (EMA-vs-raw comparisons)")
    p.add_argument("--global-batch-size", type=int, default=32)
    p.add_argument("--num-sampling-steps", type=int, default=250)
    p.add_argument("--cfg-scale", type=float, default=1.0)
    p.add_argument("--ada-cfg", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--sample-dir", type=str, default="samples")
    p.add_argument("--pp", type=int, default=1,
                   help="pipeline-parallel ways: stage the block stack "
                        "over a 'stage' mesh of N devices (GPipe "
                        "microbatches over ppermute; TPU extension, the "
                        "reference has no PP); requires depth/N %% 4 == 0")
    p.add_argument("--pp-microbatches", type=int, default=4)
    p.add_argument("--measure-time", action="store_true")
    p.add_argument("--compute-nfe", action="store_true")
    p.add_argument("--compute-ppl", type=str, default=None,
                   help="perceptual path length over the sampler: a "
                        "registered ppl metric name (ppl2_zend, ppl_zend, "
                        "ppl_zfull; see eval/ppl.py scope note)")
    p.add_argument("--ppl-detector", type=str, default=None,
                   help="TorchScript vgg16.pt path (return_lpips contract) "
                        "or 'random-lpips[:seed]' for the seeded random "
                        "stand-in (zero-egress smoke); required with "
                        "--compute-ppl")
    p.add_argument("--ppl-samples", type=int, default=None,
                   help="override the metric's sample count (smoke runs)")
    args = p.parse_args(argv)
    args.mode = mode
    return args


def load_params(args, model, cfg):
    import jax
    import jax.numpy as jnp

    template = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, cfg.in_channels, cfg.img_resolution,
                       cfg.img_resolution)),
            jnp.zeros((1,)), jnp.zeros((1,), jnp.int32)))["params"]
    if args.ckpt is None:
        print("WARNING: no --ckpt given; using random init", file=sys.stderr)
        return model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, cfg.in_channels, cfg.img_resolution,
                       cfg.img_resolution)),
            jnp.zeros((1,)), jnp.zeros((1,), jnp.int32))["params"]
    which = getattr(args, "params", "ema")
    if args.ckpt.endswith((".pt", ".pth", ".bin")):
        from dimsum_tpu.utils.ckpt import load_torch_checkpoint

        return load_torch_checkpoint(
            args.ckpt, key="ema" if which == "ema" else "model",
            params_template=template)
    # orbax: restore ema params from a native checkpoint dir
    from dimsum_tpu.utils.ckpt import restore_checkpoint
    from dimsum_tpu.parallel import create_optimizer, create_train_state

    params0 = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), template)
    state_t = create_train_state(params0, create_optimizer())
    state, step = restore_checkpoint(args.ckpt, state_t)
    if state is None:
        raise FileNotFoundError(f"no checkpoint in {args.ckpt}")
    print(f"restored step {step} from {args.ckpt} ({which} params)",
          file=sys.stderr)
    return state.ema_params if which == "ema" else state.params


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp

    from dimsum_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from dimsum_tpu.models.factory import create_model
    from dimsum_tpu.models.dim import forward_with_cfg, forward_with_adacfg
    from dimsum_tpu.transport import Sampler

    if args.label_dropout < 0:
        args.label_dropout = 0.1 if args.num_classes > 1 else 0.0
    model, cfg = create_model(args)
    params = load_params(args, model, cfg)
    transport = build_transport(args)
    sampler = Sampler(transport)

    use_cfg = args.cfg_scale > 1.0 and args.num_classes > 1

    apply_fn = model.apply
    if args.pp > 1:
        # pipeline-parallel sampling: the block stack staged over a
        # 'stage' mesh of --pp devices, embed/final replicated
        from jax.sharding import Mesh

        from dimsum_tpu.parallel.pipeline import dim_pipeline_forward

        devs = jax.devices()
        if len(devs) < args.pp:
            raise SystemExit(f"--pp {args.pp} needs {args.pp} devices, "
                             f"found {len(devs)}")
        pp_mesh = Mesh(np.asarray(devs[: args.pp]), axis_names=("stage",))
        # orbax restores commit params to one device; replicate them over
        # the stage mesh so the jitted pipeline can use all of it
        from jax.sharding import NamedSharding, PartitionSpec

        params = jax.device_put(
            params, NamedSharding(pp_mesh, PartitionSpec()))

        def apply_fn(variables, x, t, y=None, **kw):
            return dim_pipeline_forward(
                cfg, variables["params"], x, t, y, mesh=pp_mesh,
                num_microbatches=args.pp_microbatches)

    n = args.global_batch_size
    rng = jax.random.PRNGKey(args.seed)
    k_z, k_y, k_sde = jax.random.split(rng, 3)
    latent = cfg.img_resolution
    z = jax.random.normal(k_z, (n, cfg.in_channels, latent, latent))
    num_real = args.num_classes - (1 if args.num_classes > 1 else 0)
    y = jax.random.randint(k_y, (n,), 0, max(num_real, 1))
    if use_cfg:
        z = jnp.concatenate([z, z], 0)
        y = jnp.concatenate([y, jnp.full((n,), num_real)], 0).astype(
            jnp.int32)

        def model_fn_p(p, x, t, y=None):
            fwd = forward_with_adacfg if args.ada_cfg else forward_with_cfg
            return fwd(apply_fn, {"params": p}, x, t, y,
                       cfg_scale=args.cfg_scale,
                       in_channels=cfg.in_channels)
    else:
        def model_fn_p(p, x, t, y=None):
            return apply_fn({"params": p}, x, t, y)

    if args.mode == "ODE":
        sample_fn = sampler.sample_ode(
            sampling_method=args.sampling_method,
            num_steps=args.num_sampling_steps, atol=args.atol,
            rtol=args.rtol, reverse=args.reverse,
            return_nfe=args.compute_nfe)
    else:
        sample_fn = sampler.sample_sde(
            sampling_method=args.sampling_method,
            diffusion_form=args.diffusion_form,
            diffusion_norm=args.diffusion_norm, last_step=args.last_step,
            last_step_size=args.last_step_size,
            num_steps=args.num_sampling_steps)

    @jax.jit
    def run(params, z, y):
        # params threaded as an argument (NOT a closure constant) so the
        # weights are not baked into the compiled program
        def fn(x, t, **kw):
            return model_fn_p(params, x, t, **kw)

        return sample_fn(z, fn, rng=k_sde, y=y)

    out = run(params, z, y)
    nfe = None
    if args.compute_nfe and isinstance(out, tuple):
        out, nfe = out
        print(f"NFE: {int(nfe)}")
    samples = np.asarray(out)
    if use_cfg:
        samples = samples[:n]

    if args.mode == "ODE" and getattr(args, "likelihood", False):
        if use_cfg:
            raise SystemExit(
                "--likelihood requires --cfg-scale 1.0 (guided likelihood "
                "is ill-defined; the reference makes the same restriction)")
        # log-likelihood of the generated latents under the flow
        # (reference sample.py --likelihood; Hutchinson-trace reverse ODE)
        lik_fn = sampler.sample_ode_likelihood(
            num_steps=args.num_sampling_steps, atol=args.atol,
            rtol=args.rtol)

        @jax.jit
        def lik(params, xx, yy):
            def fn(x_, t_, **kw):
                return model_fn_p(params, x_, t_, **kw)

            return lik_fn(xx, fn, jax.random.PRNGKey(args.seed + 1),
                          y=yy)[0]

        logp = np.asarray(lik(params, jnp.asarray(samples), y[:n]))
        dims = float(np.prod(samples.shape[1:]))
        bpd = -logp / dims / np.log(2)
        print(f"log-likelihood: mean logp={logp.mean():.2f} "
              f"({bpd.mean():.4f} bits/dim)")

    if args.mode == "ODE" and getattr(args, "compute_ppl", None):
        from dimsum_tpu.eval import calc_metric, report_metric
        from dimsum_tpu.eval.features import make_lpips

        if not args.ppl_detector:
            raise SystemExit("--compute-ppl needs --ppl-detector (vgg16.pt "
                             "or 'random-lpips[:seed]' stand-in)")
        if not args.vae_ckpt:
            raise SystemExit("--compute-ppl needs --vae-ckpt to decode")
        from dimsum_tpu.models.vae import load_vae

        vae_m, vae_p = load_vae(args.vae_ckpt)
        # the vgg16.pt contract (reference perceptual_path_length.py:99)
        lpips = make_lpips(args.ppl_detector)

        @jax.jit
        def ppl_sample(params, z, y):
            def fn(x, t, **kw):
                return model_fn_p(params, x, t, **kw)

            lat = sample_fn(z, fn, rng=k_sde, y=y)
            if isinstance(lat, tuple):
                lat = lat[0]
            return vae_m.apply(vae_p, lat, method=vae_m.decode)

        def sampler_fn(z, yy):
            yy = (jnp.asarray(yy, jnp.int32) if yy is not None
                  else jnp.zeros((z.shape[0],), jnp.int32))
            return np.asarray(ppl_sample(params, jnp.asarray(z), yy))

        opts = dict(sampler_fn=sampler_fn, lpips_fn=lpips,
                    z_shape=(cfg.in_channels, latent, latent),
                    num_classes=num_real if args.num_classes > 1 else 0,
                    batch_size=max(args.global_batch_size // 2, 1),
                    seed=args.seed)
        if args.ppl_samples:
            opts["num_samples"] = args.ppl_samples
        result = calc_metric(args.compute_ppl, **opts)
        report_metric(result, run_dir=args.sample_dir)

    if args.measure_time:
        reps = 5
        run(params, z, y)
        t0 = time.perf_counter()
        for _ in range(reps):
            r = run(params, z, y)
        _ = np.asarray(r[0] if isinstance(r, tuple) else r)
        dt = (time.perf_counter() - t0) / reps
        print(f"sampling time: {dt:.3f}s / batch "
              f"({n / dt:.3f} img/s)")

    os.makedirs(args.sample_dir, exist_ok=True)
    if args.vae_ckpt:
        from dimsum_tpu.models.vae import load_vae
        from PIL import Image

        vae, vae_params = load_vae(args.vae_ckpt)
        imgs = jax.jit(lambda zz: vae.apply(vae_params, zz,
                                            method=vae.decode))(samples)
        imgs = np.asarray(imgs)
        imgs = np.clip((imgs + 1) / 2 * 255, 0, 255).astype(np.uint8)
        for i, im in enumerate(imgs):
            Image.fromarray(im.transpose(1, 2, 0)).save(
                os.path.join(args.sample_dir, f"{i:06d}.png"))
        print(f"wrote {len(imgs)} images to {args.sample_dir}")
    else:
        path = os.path.join(args.sample_dir, "latents.npz")
        np.savez(path, latents=samples, labels=np.asarray(y[:n]))
        print(f"no --vae-ckpt: wrote raw latents to {path}")


if __name__ == "__main__":
    main()
