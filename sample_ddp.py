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
    p.add_argument("--params", type=str, default="ema",
                   choices=["ema", "raw"],
                   help="which weights to sample with (see sample.py)")
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
    p.add_argument("--eval-streaming", action="store_true",
                   help="stream generated batches straight into the "
                        "detector (one pass, shared feature stats across "
                        "metrics) instead of the PNG round-trip; add "
                        "--save-images to also keep the files; multi-host: "
                        "feature extraction shards over processes and the "
                        "stats allgather (rank 0 reports)")
    p.add_argument("--save-images", action="store_true",
                   help="with --eval-streaming: also write the PNGs")
    # multi-host (the reference's torchrun rank-strided generation,
    # sample_ddp.py:61,159-191): each process generates its own contiguous
    # slice of the 50k on its local chips with the reference's per-rank
    # seed, then rank 0 computes the metrics over the shared folder
    p.add_argument("--num-processes", type=int, default=1)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--coordinator", type=str, default="localhost:29513")
    p.add_argument("--eval-detector", type=str, default=None,
                   help='detector spec: TorchScript .pt path (bit-parity, host CPU), "jax:<pth>" = flax InceptionV3 with converted torch weights (runs on TPU), "jax-random" = flax InceptionV3 with random params (relative trends, no weights needed), default random-projection (smoke only)')
    args = p.parse_args(argv)
    args.mode = mode
    return args


def _rss_gb() -> float:
    """Host resident set size in GB (50k-lane telemetry: the r4 in-training
    eval RSS leak was only visible through exactly this counter)."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) / 1e6
    except OSError:
        pass
    return float("nan")


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp

    from dimsum_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from dimsum_tpu.models.factory import create_model
    from dimsum_tpu.models.dim import forward_with_cfg
    from dimsum_tpu.parallel import init_distributed, make_mesh
    from dimsum_tpu.transport import Sampler

    # multi-host: like the reference's per-GPU ranks (sample_ddp.py:61),
    # each process is an INDEPENDENT generator over its local chips (no
    # cross-host collectives during sampling); rank 0 evaluates at the end
    init_distributed(args.coordinator, args.num_processes, args.process_id)
    proc_id, n_proc = jax.process_index(), jax.process_count()
    is_main = proc_id == 0

    if args.label_dropout < 0:
        args.label_dropout = 0.1 if args.num_classes > 1 else 0.0
    model, cfg = create_model(args)
    params = load_params(args, model, cfg)
    transport = build_transport(args)
    sampler = Sampler(transport)

    local_devices = jax.local_devices()
    n_dev = len(local_devices)
    assert n_dev % args.tp == 0, f"--tp {args.tp} does not divide {n_dev}"
    use_tp = args.tp > 1
    if use_tp:
        mesh = make_mesh(data=n_dev // args.tp, model=args.tp,
                         devices=local_devices)
    else:
        mesh = (make_mesh(data=n_dev, model=1, devices=local_devices)
                if n_dev > 1 else None)
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

        @jax.jit
        def decode(z):
            # clip/scale/uint8 on device: 4x smaller device->host transfer
            # and no per-batch host math (measured 379 s of the r4 2k-sample
            # rehearsal's wall clock before this)
            img = vae.apply(vae_params, z, method=vae.decode)
            return jnp.clip((img + 1) * 127.5, 0, 255).astype(jnp.uint8)

    os.makedirs(args.sample_dir, exist_ok=True)
    latent = cfg.img_resolution
    # per-process slice: contiguous blocks, reference per-rank seed
    # (sample_ddp.py:64: seed = global_seed * world_size + rank)
    proc_samples = -(-args.num_fid_samples // n_proc)
    sample_offset = proc_id * proc_samples
    proc_samples = min(proc_samples, args.num_fid_samples - sample_offset)
    iters = -(-proc_samples // global_batch)
    rng = jax.random.PRNGKey(args.global_seed * n_proc + proc_id)
    timers = {"generate": 0.0, "decode": 0.0, "write": 0.0}
    t_start = time.time()
    save_images = not args.eval_streaming or args.save_images

    def latent_batches(skip: int = 0):
        """Generate on-device latent batches (this process's slice).

        skip: fast-forward past the first `skip` batches by advancing the
        rng chain WITHOUT any device work -- the resume path after a
        tunnel/host failure (feature chunks already on disk)."""
        nonlocal_rng = rng
        total = 0
        for it in range(iters):
            nonlocal_rng, kz, ky, ks = jax.random.split(nonlocal_rng, 4)
            if it < skip:
                total += global_batch
                continue
            z = jax.random.normal(kz, (global_batch, cfg.in_channels,
                                       latent, latent))
            if args.use_even_classes and num_real_classes > 0:
                y = (jnp.arange(global_batch) + sample_offset
                     + it * global_batch) % num_real_classes
            else:
                y = jax.random.randint(ky, (global_batch,), 0,
                                       max(num_real_classes, 1))
            y = y.astype(jnp.int32)
            t0 = time.time()
            out = jax.block_until_ready(run(params, z, y, ks))
            timers["generate"] += time.time() - t0
            yield out, total
            total += global_batch
            if it % 10 == 0:
                rate = ((min(total, proc_samples) - skip * global_batch)
                        / (time.time() - t_start))
                print(f"[proc {proc_id}] [{it+1}/{iters}] {total} samples "
                      f"({rate:.2f} img/s, rss {_rss_gb():.2f} GB)",
                      file=sys.stderr)

    def uint8_batches():
        """Generate, decode and (optionally) persist; yields uint8 NCHW."""
        for out, total in latent_batches():
            if decode is None:
                yield np.asarray(out)
                continue
            t0 = time.time()
            imgs = np.asarray(jax.block_until_ready(decode(out)))
            timers["decode"] += time.time() - t0
            if save_images:
                from PIL import Image

                t0 = time.time()
                for i, im in enumerate(imgs):
                    idx = sample_offset + total + i
                    if total + i >= proc_samples:
                        break
                    Image.fromarray(im.transpose(1, 2, 0)).save(
                        os.path.join(args.sample_dir,
                                     f"{idx:06d}.{args.image_ext}"))
                timers["write"] += time.time() - t0
            yield imgs[: proc_samples - total]

    def _barrier():
        if n_proc > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("sample_ddp_done")

    eval_opts = {}
    if args.eval_refdir:
        from dimsum_tpu.eval.features import detector_id, make_detector

        eval_opts = dict(
            detector=make_detector(args.eval_detector),
            cache_dir=os.path.join(args.sample_dir, "..", "stats-cache"),
            dataset_id=args.eval_refdir,
            detector_id=detector_id(args.eval_detector))

    if decode is None:
        lat = np.concatenate(list(uint8_batches()))[:proc_samples]
        suffix = f"_rank{proc_id}" if n_proc > 1 else ""
        np.savez(os.path.join(args.sample_dir, f"latents{suffix}.npz"),
                 latents=lat)
        print(f"wrote latents for {len(lat)} samples (no --vae-ckpt; "
              "metrics over pixels unavailable)", file=sys.stderr)
        _barrier()
        return

    if args.eval_streaming and args.eval_refdir:
        # ONE pass: images stream through the detector as they are
        # generated; feature stats shared across the requested metrics
        # (kills the PNG round-trip the reference does, sample_ddp:195-229).
        # Multi-host: each process streams ITS slice of the 50k, the
        # partial feature stats allgather (eval/dist_stats.py), rank 0
        # computes the metrics -- the reference's rank-sharded feature
        # pipeline (metric_utils.py:271-279) with zero disk I/O.
        from dimsum_tpu.data import ImageFolderDataset
        from dimsum_tpu.eval import (
            FeatureStats, calc_metrics_multiprocess, report_metric)

        real = ImageFolderDataset(args.eval_refdir, cfg.img_resolution * 8,
                                  raw_uint8=True)
        metric_list = args.eval_metric.split(",")
        need_all = any(not m.strip().startswith("fid") for m in metric_list)

        # Fused decode->detector: when the detector is the on-device flax
        # InceptionV3 and the images are not being saved, quantize to uint8
        # and extract features INSIDE one jitted program per batch -- only
        # (B, 2048) features ever cross the device->host tunnel instead of
        # (B, 3, 256, 256) images (the r4 rehearsal spent 298 s of 843 s in
        # decode+transfer at just 2k samples).  uint8 rounding on device is
        # the same op the unfused path runs, so features match the
        # decode->host->detector path (tests/test_fused_decode_features.py).
        from dimsum_tpu.eval.inception import (
            JaxInceptionDetector, preprocess_uint8)

        det = eval_opts.get("detector")
        gen_stats = None
        if (decode is not None and not save_images
                and isinstance(det, JaxInceptionDetector)):
            # params enter as jit ARGUMENTS: closed-over weight trees would
            # lower into the HLO as literals -- ~400 MB of program body that
            # the remote-compile relay rejects (HTTP 413)
            @jax.jit
            def decode_feats(vp, dp, z):
                img = vae.apply(vp, z, method=vae.decode)
                u8 = jnp.clip((img + 1) * 127.5, 0, 255).astype(jnp.uint8)
                return det.model.apply({"params": dp}, preprocess_uint8(u8))

            vae_dev = jax.device_put(vae_params)
            det_dev = jax.device_put(det.params)

            # Crash/tunnel-failure resumability: every batch's features
            # land in a per-rank chunk file as soon as they reach the
            # host; a restart fast-forwards the rng chain past the chunks
            # already on disk and regenerates nothing.  (The reference's
            # PNG folder is implicitly resumable; the streaming path must
            # not be worse.)  ~8 KB/sample -- 400 MB at 50k.
            feat_dir = os.path.join(args.sample_dir,
                                    f"feat-chunks-rank{proc_id}")
            os.makedirs(feat_dir, exist_ok=True)
            done = 0
            while os.path.exists(os.path.join(feat_dir,
                                              f"chunk{done:06d}.npy")):
                done += 1
            if done:
                print(f"[proc {proc_id}] resuming: {done}/{iters} feature "
                      f"chunks on disk", file=sys.stderr)

            for out, total in latent_batches(skip=done):
                t0 = time.time()
                feats = np.asarray(jax.block_until_ready(
                    decode_feats(vae_dev, det_dev, out)))
                timers["decode"] += time.time() - t0
                it = total // global_batch
                tmp = os.path.join(feat_dir, f".chunk{it:06d}.tmp.npy")
                np.save(tmp, feats)
                os.replace(tmp, os.path.join(feat_dir,
                                             f"chunk{it:06d}.npy"))

            gen_stats = FeatureStats(capture_all=need_all,
                                     capture_mean_cov=True,
                                     max_items=proc_samples)
            for it in range(iters):
                gen_stats.append(np.load(
                    os.path.join(feat_dir, f"chunk{it:06d}.npy")))

        results = calc_metrics_multiprocess(
            metric_list, real_dataset=real,
            gen_batches=uint8_batches, gen_stats=gen_stats,
            max_gen_items=proc_samples,
            **eval_opts)
        for result in results:
            report_metric(result, run_dir=args.sample_dir)
        t_feat = (time.time() - t_start - timers["generate"]
                  - timers["decode"] - timers["write"])
        print(f"[proc {proc_id}] wall-clock split: "
              f"generate {timers['generate']:.1f}s, "
              f"decode {timers['decode']:.1f}s, "
              f"features+metrics {t_feat:.1f}s, "
              f"write {timers['write']:.1f}s; final rss {_rss_gb():.2f} GB",
              file=sys.stderr)
        _barrier()
        return

    # disk path (reference behavior): drain the generator (writes PNGs),
    # then rank 0 evaluates over the folder
    for _ in uint8_batches():
        pass
    _barrier()

    if args.eval_refdir and is_main:
        from dimsum_tpu.data import ImageFolderDataset
        from dimsum_tpu.eval import calc_metric, report_metric

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
                **eval_opts)
            report_metric(result, run_dir=args.sample_dir)
    _barrier()


if __name__ == "__main__":
    main()
