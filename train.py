"""Training CLI, mirroring `/root/reference/dimsum/train.py`.

Flow-matching trainer: sharded train step over the 'data' mesh axis, EMA,
rolling "content" checkpoint + numbered snapshots, periodic sample grids,
optional in-training FID (needs detector weights on disk; see eval/).

The reference's per-GPU DDP processes become one process driving all local
chips: batches are host-assembled and sharded over the mesh; gradient
all-reduce is a single psum inside the jitted step.
"""

from __future__ import annotations

import argparse
import logging
import os
import time

import numpy as np

from dimsum_tpu.cli import (
    add_model_args, add_moe_args, add_transport_args, add_vae_args,
    build_transport,
)


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    add_model_args(p)
    add_moe_args(p)
    add_transport_args(p)
    add_vae_args(p)
    p.add_argument("--dataset", default="cifar10")
    p.add_argument("--exp", type=str, required=True)
    p.add_argument("--datadir", type=str, required=True)
    p.add_argument("--results-dir", type=str, default="results")
    p.add_argument("--epochs", type=int, default=1400)
    p.add_argument("--global-batch-size", type=int, default=256)
    p.add_argument("--global-seed", type=int, default=0)
    p.add_argument("--num-workers", type=int, default=4)
    p.add_argument("--log-every", type=int, default=100)
    p.add_argument("--ckpt-every", type=int, default=25,
                   help="epochs between numbered snapshots")
    p.add_argument("--save-content-every", type=int, default=5)
    p.add_argument("--plot-every", type=int, default=5)
    p.add_argument("--model-ckpt", type=str, default="")
    p.add_argument("--resume", action="store_true")
    # multi-host (the reference's torchrun + init_process_group,
    # train.py:145): one dimsum process per host, a single global mesh.
    # On TPU pods leave --num-processes unset (auto-detected); on CPU/GPU
    # pass all three explicitly per process.
    p.add_argument("--num-processes", type=int, default=1,
                   help="number of hosts/processes (multi-host training); "
                        "1 = single process driving all local chips")
    p.add_argument("--process-id", type=int, default=None,
                   help="this process's rank in [0, --num-processes)")
    p.add_argument("--coordinator", type=str, default="localhost:29512",
                   help="coordinator address host:port for "
                        "jax.distributed.initialize")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel ways: shard params over a 'model' "
                        "mesh axis via GSPMD (TPU extension; the reference "
                        "is data-parallel only)")
    p.add_argument("--grad-accum", type=int, default=1,
                   help="fold N micro-steps into one optimizer update "
                        "inside the jitted step (lax.scan over "
                        "microbatches); lets the reference's global-batch "
                        "704 ImageNet recipe (scripts/train.sh) run at "
                        "per-chip batches that exceed memory")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--max-grad-norm", type=float, default=2.0)
    p.add_argument("--ema-decay", type=float, default=0.9999,
                   help="EMA decay per optimizer step (the reference "
                        "hard-codes 0.9999, train.py:55; exposed here "
                        "because short runs need a shorter EMA horizon — "
                        "half-life = ln2/(1-decay) steps)")
    # reference-faithful dead flags: the reference defines these and an
    # adjust_learning_rate helper but never calls it (the call is commented
    # out at reference train.py:303), so training runs at constant lr.  The
    # schedule itself is available as parallel.warmup_cosine_schedule.
    p.add_argument("--no-lr-decay", action="store_true", default=False,
                   help="(reference-faithful no-op: lr is constant either "
                        "way, see reference train.py:117-130,303)")
    p.add_argument("--min-lr", type=float, default=1e-6,
                   help="(reference-faithful no-op, see --no-lr-decay)")
    p.add_argument("--warmup-epochs", type=int, default=5,
                   help="(reference-faithful no-op, see --no-lr-decay)")
    # eval group (in-training FID)
    p.add_argument("--eval-every", type=int, default=100)
    p.add_argument("--eval-refdir", type=str, default=None)
    p.add_argument("--eval-nsamples", type=int, default=1000)
    p.add_argument("--eval-bs", type=int, default=4)
    p.add_argument("--eval-cfg-scale", type=float, default=1.0)
    p.add_argument("--eval-detector", type=str, default=None,
                   help='in-training FID detector spec: TorchScript .pt path (bit-parity, host CPU), "jax:<pth>" = flax InceptionV3 with converted torch weights (runs on TPU), "jax-random" = flax InceptionV3 with random params (relative trends, no weights needed), default random-projection (smoke only)')
    return p.parse_args(argv)


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp

    from dimsum_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from dimsum_tpu.data import Loader, device_put_sharded_batch, get_dataset
    from dimsum_tpu.models.factory import create_model
    from dimsum_tpu.parallel import (
        create_optimizer, create_train_state, host_local_to_global,
        init_distributed, make_mesh, make_train_step, replicate_to_mesh,
    )
    from dimsum_tpu.utils.ckpt import (
        load_torch_checkpoint, restore_checkpoint, save_checkpoint,
    )

    # multi-host rendezvous before any device query (reference train.py:145)
    init_distributed(args.coordinator, args.num_processes, args.process_id)
    proc_id, n_proc = jax.process_index(), jax.process_count()
    is_main = proc_id == 0

    exp_dir = os.path.join(args.results_dir, args.exp)
    os.makedirs(exp_dir, exist_ok=True)
    # rank-0 writes the log file; other ranks log warnings to stderr only
    # (reference create_logger, train.py:82-97)
    logging.basicConfig(
        level=logging.INFO if is_main else logging.WARNING,
        format="[%(asctime)s] %(message)s",
        handlers=[logging.StreamHandler()] + (
            [logging.FileHandler(os.path.join(exp_dir, "log.txt"))]
            if is_main else []))
    logger = logging.getLogger("dimsum")
    logger.info(f"args: {vars(args)}")
    if n_proc > 1:
        logger.info(f"multi-host: process {proc_id}/{n_proc}, "
                    f"{jax.local_device_count()} local / "
                    f"{jax.device_count()} global devices")

    if args.label_dropout < 0:
        args.label_dropout = 0.1 if args.num_classes > 1 else 0.0
    use_labels = args.num_classes > 1

    n_dev = len(jax.devices())
    assert n_dev % args.tp == 0, f"--tp {args.tp} does not divide {n_dev}"
    use_tp = args.tp > 1
    assert not (use_tp and n_proc > 1), (
        "--tp with --num-processes > 1 is not wired (the reference is "
        "DP-only across hosts; use TP within one host)")
    if use_tp:
        # GSPMD (data, model) mesh: params sharded by tp_param_specs, batch
        # over 'data', XLA inserts the collectives.  The jitted step itself
        # is the mesh=None step.
        mesh = make_mesh(data=n_dev // args.tp, model=args.tp)
    else:
        mesh = make_mesh(data=n_dev, model=1) if n_dev > 1 else None

    model, cfg = create_model(
        args, ep_mesh=mesh if (use_tp and args.is_moe) else None)
    transport = build_transport(args)
    optimizer = create_optimizer(args.lr, weight_decay=0.0)
    assert args.global_batch_size % max(n_dev, 1) == 0

    dataset = get_dataset(args)
    use_latent = "latent" in args.dataset
    # each process loads only its stripe (the reference's DistributedSampler
    # contract, train.py:259); batches are its slice of the global batch
    assert args.global_batch_size % n_proc == 0
    loader = Loader(dataset, args.global_batch_size // n_proc, shuffle=True,
                    seed=args.global_seed, num_workers=args.num_workers,
                    shard_id=proc_id, num_shards=n_proc)
    logger.info(f"dataset: {len(dataset)} samples, "
                f"{len(loader)} steps/epoch, devices: {n_dev}")

    vae = vae_params = None
    if not use_latent and not args.vae_ckpt:
        raise SystemExit(
            "pixel-space dataset needs --vae-ckpt (local diffusers VAE "
            "weights); or precompute latents with preprocess.py")
    if args.vae_ckpt:
        # loaded even for latent datasets: sample grids and in-training FID
        # decode through it (reference train.py:196 loads it always)
        from dimsum_tpu.models.vae import load_vae

        vae, vae_params = load_vae(args.vae_ckpt)
        encode = jax.jit(lambda x, k: vae.apply(vae_params, x, k,
                                                method=vae.encode))

    rng = jax.random.PRNGKey(args.global_seed)
    latent = cfg.img_resolution
    init_x = jnp.zeros((1, cfg.in_channels, latent, latent))
    params = model.init(jax.random.PRNGKey(args.global_seed), init_x,
                        jnp.zeros((1,)), jnp.zeros((1,), jnp.int32))["params"]
    if args.model_ckpt:
        params = load_torch_checkpoint(args.model_ckpt, key="model",
                                       params_template=params, adapt=True)
        logger.info(f"warm-started from {args.model_ckpt}")
    if use_tp:
        from dimsum_tpu.parallel import tp_shardings

        params = jax.device_put(params, tp_shardings(mesh, params))
        logger.info(f"tensor-parallel: params sharded over model={args.tp}")
    if n_proc > 1:
        # every process computed identical params from the same seed; place
        # them as globally-replicated arrays so the sharded step sees one
        # logical copy (DDP's broadcast-at-wrap equivalent)
        params = replicate_to_mesh(params, mesh)
    state = create_train_state(params, optimizer)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    logger.info(f"model params: {n_params / 1e6:.1f}M")

    init_epoch, train_steps = 0, 0
    content_dir = os.path.join(exp_dir, "content")
    if args.resume:
        restored, step = restore_checkpoint(content_dir, state)
        if restored is not None:
            state = restored
            train_steps = int(state.step)
            init_epoch = train_steps // max(len(loader), 1)
            logger.info(f"resumed at step {train_steps} (epoch {init_epoch})")

    # tp: GSPMD jit (mesh=None step; shardings come from the placed arrays).
    # dp: shard_map over 'data' with injected per-shard keys.
    per_dev_batch = args.global_batch_size // max(n_dev, 1)
    if args.grad_accum > 1:
        assert per_dev_batch % args.grad_accum == 0, (
            f"per-device batch {per_dev_batch} not divisible by "
            f"--grad-accum {args.grad_accum}")
        logger.info(f"grad accumulation: {args.grad_accum} microbatches of "
                    f"{per_dev_batch // args.grad_accum}/device per update")
    train_step = make_train_step(model, transport, optimizer,
                                 mesh=None if use_tp else mesh,
                                 max_grad_norm=args.max_grad_norm,
                                 ema_decay=args.ema_decay,
                                 use_labels=use_labels,
                                 grad_accum=args.grad_accum)
    n_data_shards = (mesh.shape["data"] if (mesh is not None and not use_tp)
                     else 0)

    window_losses, log_steps, start_time = [], 0, time.time()
    for epoch in range(init_epoch, args.epochs + 1):
        loader.set_epoch(epoch)
        logger.info(f"beginning epoch {epoch}")
        for x, y in loader:
            batch = device_put_sharded_batch((x, y), mesh)
            x_dev, y_dev = batch
            if not use_latent:
                rng, k = jax.random.split(rng)
                x_dev = encode(x_dev, k)
            rng, k = jax.random.split(rng)
            if n_data_shards:
                # same key sequence on every process (same seed); each
                # contributes its local shards' rows of the key array
                k = jax.random.split(k, n_data_shards)
                if n_proc > 1:
                    from jax.sharding import PartitionSpec as P

                    local = n_data_shards // n_proc
                    k = host_local_to_global(
                        mesh, P("data"),
                        np.asarray(k)[proc_id * local:(proc_id + 1) * local])
            state, metrics = train_step(state, x_dev, y_dev, k)
            # device scalar, kept async: no per-step host sync
            window_losses.append(metrics["loss"])
            train_steps += 1
            log_steps += 1
            if train_steps % args.log_every == 0:
                # one transfer for the whole window (reference averages its
                # running_loss over the log window, train.py:326-342)
                avg_loss = float(jnp.stack(window_losses).mean())
                rate = log_steps / (time.time() - start_time)
                logger.info(
                    f"(step={train_steps:07d}) loss={avg_loss:.4f} "
                    f"grad_norm={float(metrics['grad_norm']):.3f} "
                    f"steps/sec={rate:.2f}")
                window_losses, log_steps = [], 0
                start_time = time.time()

        # collective-safe in multi-host: every process calls save (orbax
        # coordinates; replicated arrays are written once), while plots and
        # eval are rank-0-only host-side work over a numpy EMA snapshot
        if epoch % args.save_content_every == 0:
            save_checkpoint(content_dir, state, step=train_steps, keep=2)
            logger.info(f"saved content checkpoint at step {train_steps}")
        if epoch % args.ckpt_every == 0 and epoch > 0:
            save_checkpoint(os.path.join(exp_dir, "checkpoints"), state,
                            step=train_steps, keep=10)
            logger.info(f"saved snapshot at step {train_steps}")
        if epoch % args.plot_every == 0 and vae is not None and is_main:
            _plot_samples(args, model, state, transport, vae, vae_params,
                          exp_dir, epoch, cfg)
        if (args.eval_refdir and vae is not None and is_main
                and epoch % args.eval_every == 0 and epoch > 0):
            _in_training_fid(args, model, state, transport, vae, vae_params,
                             exp_dir, cfg, logger)

    logger.info("done")


_EVAL_GEN_CACHE = {}
_EVAL_DEV_CACHE = {}


def _eval_dev_params(tag, params):
    """Device-resident copy of an eval-time param tree, uploaded ONCE.

    Passing host numpy trees straight into the jitted sampler re-transfers
    them H2D on EVERY call (jax keeps no committed buffer for np args); on
    the axon tunnel those per-call staging uploads were the r4 eval leak
    (~4.2 GB host RSS per eval: 6 gen batches x ~0.7 GB of ema+vae
    params).  One device_put per (tag, tree identity) caps it."""
    import jax

    # Key on identity, but hold a strong reference to the host tree in the
    # cache entry: if the original tree were garbage-collected, a new tree
    # could reuse the same id() and alias a stale device copy.
    key = (tag, id(params))
    hit = _EVAL_DEV_CACHE.get(key)
    if hit is None or hit[0] is not params:
        # drop stale entries for this tag (e.g. last eval's ema snapshot)
        for k in [k for k in _EVAL_DEV_CACHE if k[0] == tag]:
            del _EVAL_DEV_CACHE[k]
        hit = (params, jax.device_put(params, jax.local_devices()[0]))
        _EVAL_DEV_CACHE[key] = hit
    return hit[1]


def _eval_ema_params(state):
    """EMA params on the first local device for rank-0 eval jits.

    Single-process: a device-to-device reshard (no host round trip).
    Multi-host (globally-sharded, non-addressable): host snapshot first."""
    import jax

    dev0 = jax.local_devices()[0]
    try:
        return jax.device_put(state.ema_params, dev0)
    except Exception:
        return jax.device_put(jax.tree.map(np.asarray, state.ema_params),
                              dev0)


def _eval_gen_fn(model, transport, vae, num_steps=50):
    """One jitted sample->decode program, reused across in-training evals.

    vae params enter as an ARGUMENT: a closure-captured tree would be baked
    into the executable as 300+ MB of constants, and rebuilding the jit per
    eval re-traced and re-staged those constants every time -- the r4
    overfit run leaked host RAM to death this way (oom-kill at 130 GB
    during the 5th eval)."""
    import jax

    from dimsum_tpu.transport import Sampler

    key = (model, transport, vae, num_steps)
    if key not in _EVAL_GEN_CACHE:
        fn = Sampler(transport).sample_ode(sampling_method="euler",
                                           num_steps=num_steps)

        @jax.jit
        def gen(params, vparams, z, y):
            def mf(x, t, **kw):
                return model.apply({"params": params}, x, t, **kw)

            lat = fn(z, mf, y=y)
            return vae.apply(vparams, lat, method=vae.decode)

        _EVAL_GEN_CACHE[key] = gen
    return _EVAL_GEN_CACHE[key]


def _log_rss(logger, tag):
    try:
        with open("/proc/self/statm") as f:
            rss_gb = int(f.read().split()[1]) * 4096 / 2**30
        logger.info(f"host RSS after {tag}: {rss_gb:.1f} GB")
    except OSError:
        pass


def _in_training_fid(args, model, state, transport, vae, vae_params,
                     exp_dir, cfg, logger):
    """fid2k-style eval during training (reference train.py:393-482)."""
    import jax


    from dimsum_tpu.data import ImageFolderDataset
    from dimsum_tpu.eval import calc_metric, report_metric, latents_to_uint8

    # rank-0-only jit must not span non-addressable devices: reshard the
    # EMA tree onto one local device, once per eval (not once per batch)
    ema_params = _eval_ema_params(state)
    vparams = _eval_dev_params("vae", vae_params)
    gen = _eval_gen_fn(model, transport, vae)

    def gen_batches():
        rng = jax.random.PRNGKey(0)
        n = 0
        while n < args.eval_nsamples:
            rng, kz, ky = jax.random.split(rng, 3)
            bs = args.eval_bs
            z = jax.random.normal(kz, (bs, cfg.in_channels,
                                       cfg.img_resolution,
                                       cfg.img_resolution))
            y = jax.random.randint(ky, (bs,), 0, max(args.num_classes, 1))
            imgs = np.asarray(gen(ema_params, vparams, z, y))
            n += bs
            yield latents_to_uint8(imgs)

    from dimsum_tpu.eval.features import detector_id, make_detector

    # one detector (and one compiled feature extractor) for the whole run
    dkey = ("detector", args.eval_detector)
    if dkey not in _EVAL_DEV_CACHE:
        _EVAL_DEV_CACHE[dkey] = make_detector(args.eval_detector)
    detector = _EVAL_DEV_CACHE[dkey]
    real = ImageFolderDataset(args.eval_refdir, args.image_size,
                              raw_uint8=True)
    result = calc_metric(
        "fid2k_full", real_dataset=real, gen_batches=gen_batches,
        detector=detector, cache_dir=os.path.join(exp_dir, "stats-cache"),
        dataset_id=args.eval_refdir,
        detector_id=detector_id(args.eval_detector))
    report_metric(result, run_dir=exp_dir)
    logger.info(f"in-training eval: {result['results']}")
    _log_rss(logger, "eval")


def _plot_samples(args, model, state, transport, vae, vae_params, exp_dir,
                  epoch, cfg):
    import jax
    from PIL import Image

    ema_params = _eval_ema_params(state)
    vparams = _eval_dev_params("vae", vae_params)
    n = min(args.eval_bs * 4, 16)
    # chunk generation so the sampler+decode live set scales down at high
    # res: a single 16-sample batch at 512-res OOMs next to the resident
    # L/2 train state (observed on one v5e chip); 4-sample chunks fit.
    chunk = max(1, n // max(1, (args.image_size // 256) ** 2))
    n = (n // chunk) * chunk
    rng = jax.random.PRNGKey(epoch)
    z = jax.random.normal(rng, (n, cfg.in_channels, cfg.img_resolution,
                                cfg.img_resolution))
    y = jax.random.randint(rng, (n,), 0, max(args.num_classes, 1))

    run = _eval_gen_fn(model, transport, vae)
    imgs = np.concatenate([
        np.asarray(run(ema_params, vparams, z[i:i + chunk],
                       y[i:i + chunk]))
        for i in range(0, n, chunk)], axis=0)
    imgs = np.clip((imgs + 1) / 2 * 255, 0, 255).astype(np.uint8)
    side = int(np.ceil(np.sqrt(n)))
    H, W = imgs.shape[2], imgs.shape[3]
    grid = np.zeros((side * H, side * W, 3), np.uint8)
    for i, im in enumerate(imgs):
        r, c = divmod(i, side)
        grid[r * H:(r + 1) * H, c * W:(c + 1) * W] = im.transpose(1, 2, 0)
    Image.fromarray(grid).save(
        os.path.join(exp_dir, f"samples_epoch{epoch:05d}.png"))


if __name__ == "__main__":
    main()
