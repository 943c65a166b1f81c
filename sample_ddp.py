"""Multi-chip FID-50K generation + metrics, mirroring
`/root/reference/dimsum/sample_ddp.py`.

The reference spawns one process per GPU with rank-strided sample indices
(:186-190); here a single process drives all local chips with the noise
batch sharded over the 'data' mesh axis -- one jitted program per batch,
collectives over ICI.  Outputs: per-image PNGs (with --vae-ckpt) or a
latents .npz, then the requested metrics.
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
from sample import load_params


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
    p.add_argument("--per-proc-batch-size", type=int, default=64,
                   help="per-chip batch size")
    p.add_argument("--num-fid-samples", type=int, default=50_000)
    p.add_argument("--num-sampling-steps", type=int, default=250)
    p.add_argument("--cfg-scale", type=float, default=1.0)
    p.add_argument("--global-seed", type=int, default=0)
    p.add_argument("--sample-dir", type=str, default="samples-50k")
    p.add_argument("--image-ext", type=str, default="png")
    p.add_argument("--use-even-classes", action="store_true")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel ways (GSPMD 'model' axis; TPU "
                        "extension over the reference's pure DP)")
    p.add_argument("--eval-refdir", type=str, default=None)
    p.add_argument("--eval-metric", type=str, default="fid50k_full",
                   help="comma-separated registered metrics")
    p.add_argument("--eval-detector", type=str, default=None,
                   help='detector spec: TorchScript .pt path (bit-parity, host CPU), "jax:<pth>" = flax InceptionV3 with converted torch weights (runs on TPU), "jax-random" = flax InceptionV3 with random params (relative trends, no weights needed), default random-projection (smoke only)')
    args = p.parse_args(argv)
    args.mode = mode
    return args


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp

    from dimsum_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from dimsum_tpu.models.factory import create_model
    from dimsum_tpu.models.dim import forward_with_cfg
    from dimsum_tpu.parallel import make_mesh
    from dimsum_tpu.transport import Sampler

    if args.label_dropout < 0:
        args.label_dropout = 0.1 if args.num_classes > 1 else 0.0
    model, cfg = create_model(args)
    params = load_params(args, model, cfg)
    transport = build_transport(args)
    sampler = Sampler(transport)

    n_dev = len(jax.devices())
    assert n_dev % args.tp == 0, f"--tp {args.tp} does not divide {n_dev}"
    use_tp = args.tp > 1
    if use_tp:
        mesh = make_mesh(data=n_dev // args.tp, model=args.tp)
    else:
        mesh = make_mesh(data=n_dev, model=1) if n_dev > 1 else None
    per_chip = args.per_proc_batch_size
    data_ways = n_dev // args.tp
    global_batch = per_chip * max(data_ways, 1)
    use_cfg = args.cfg_scale > 1.0 and args.num_classes > 1
    num_real_classes = args.num_classes - (1 if args.num_classes > 1 else 0)

    if args.mode == "ODE":
        sample_fn = sampler.sample_ode(
            sampling_method=args.sampling_method,
            num_steps=args.num_sampling_steps, atol=args.atol,
            rtol=args.rtol)
    else:
        sample_fn = sampler.sample_sde(
            sampling_method=args.sampling_method,
            diffusion_form=args.diffusion_form,
            diffusion_norm=args.diffusion_norm, last_step=args.last_step,
            last_step_size=args.last_step_size,
            num_steps=args.num_sampling_steps)

    def local_sample(params, z, y, rng):
        def batch_model_fn(x, t, y=None):
            if use_cfg:
                return forward_with_cfg(
                    model.apply, {"params": params}, x, t, y,
                    cfg_scale=args.cfg_scale, in_channels=cfg.in_channels)
            return model.apply({"params": params}, x, t, y)

        if use_cfg:
            z = jnp.concatenate([z, z], 0)
            y = jnp.concatenate(
                [y, jnp.full_like(y, num_real_classes)], 0)
        out = sample_fn(z, batch_model_fn, rng=rng, y=y)
        return out[: z.shape[0] // 2] if use_cfg else out

    if use_tp:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from dimsum_tpu.parallel import tp_shardings

        # GSPMD dp x tp: params sharded over 'model' by the TP rules, noise
        # batch over 'data'; the jitted sampler is the plain local function
        # and XLA inserts the collectives.
        params = jax.device_put(params, tp_shardings(mesh, params))
        batch_sh = NamedSharding(mesh, P("data"))

        def run(params, z, y, rng):
            return jax.jit(local_sample)(
                params, jax.device_put(z, batch_sh),
                jax.device_put(y, batch_sh), rng)
    elif mesh is not None:
        from jax import shard_map
        from jax.sharding import NamedSharding, PartitionSpec as P

        # replicate the weights across the mesh (they may have been
        # restored onto a single device)
        params = jax.device_put(params, NamedSharding(mesh, P()))
        run = jax.jit(shard_map(
            local_sample, mesh=mesh,
            in_specs=(P(), P("data"), P("data"), P()),
            out_specs=P("data"), check_vma=False))
    else:
        run = jax.jit(local_sample)

    vae = vae_params = decode = None
    if args.vae_ckpt:
        from dimsum_tpu.models.vae import load_vae

        vae, vae_params = load_vae(args.vae_ckpt)
        decode = jax.jit(lambda z: vae.apply(vae_params, z,
                                             method=vae.decode))

    os.makedirs(args.sample_dir, exist_ok=True)
    latent = cfg.img_resolution
    total = 0
    all_latents = []
    iters = -(-args.num_fid_samples // global_batch)
    rng = jax.random.PRNGKey(args.global_seed)
    t_start = time.time()
    for it in range(iters):
        rng, kz, ky, ks = jax.random.split(rng, 4)
        z = jax.random.normal(kz, (global_batch, cfg.in_channels, latent,
                                   latent))
        if args.use_even_classes and num_real_classes > 0:
            y = (jnp.arange(global_batch)
                 + it * global_batch) % num_real_classes
        else:
            y = jax.random.randint(ky, (global_batch,), 0,
                                   max(num_real_classes, 1))
        y = y.astype(jnp.int32)
        out = run(params, z, y, ks)
        if decode is not None:
            from PIL import Image

            imgs = np.asarray(decode(out))
            imgs = np.clip((imgs + 1) * 127.5, 0, 255).astype(np.uint8)
            for i, im in enumerate(imgs):
                if total + i >= args.num_fid_samples:
                    break
                Image.fromarray(im.transpose(1, 2, 0)).save(os.path.join(
                    args.sample_dir,
                    f"{total + i:06d}.{args.image_ext}"))
        else:
            all_latents.append(np.asarray(out))
        total += global_batch
        if it % 10 == 0:
            rate = min(total, args.num_fid_samples) / (time.time() - t_start)
            print(f"[{it+1}/{iters}] {total} samples ({rate:.2f} img/s)",
                  file=sys.stderr)

    if decode is None:
        lat = np.concatenate(all_latents)[: args.num_fid_samples]
        np.savez(os.path.join(args.sample_dir, "latents.npz"), latents=lat)
        print(f"wrote latents for {len(lat)} samples (no --vae-ckpt; "
              "metrics over pixels unavailable)", file=sys.stderr)
        return

    if args.eval_refdir:
        from dimsum_tpu.data import ImageFolderDataset
        from dimsum_tpu.eval import calc_metric, report_metric
        from dimsum_tpu.eval.features import detector_id, make_detector

        detector = make_detector(args.eval_detector)
        real = ImageFolderDataset(args.eval_refdir, cfg.img_resolution * 8,
                                  raw_uint8=True)
        gen = ImageFolderDataset(args.sample_dir, cfg.img_resolution * 8,
                                 raw_uint8=True)

        def gen_batches():
            for i in range(0, len(gen), 64):
                yield np.stack([gen[j][0]
                                for j in range(i, min(i + 64, len(gen)))])

        for metric in args.eval_metric.split(","):
            result = calc_metric(
                metric.strip(), real_dataset=real, gen_batches=gen_batches,
                detector=detector, cache_dir=os.path.join(
                    args.sample_dir, "..", "stats-cache"),
                dataset_id=args.eval_refdir,
                detector_id=detector_id(args.eval_detector))
            report_metric(result, run_dir=args.sample_dir)


if __name__ == "__main__":
    main()
