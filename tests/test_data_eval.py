"""Data pipeline, eval metric, and VAE tests."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dimsum_tpu.data.datasets import (
    ImageFolderDataset, LatentMemmapDataset, center_crop_arr,
)
from dimsum_tpu.data.loader import Loader
from dimsum_tpu.eval.fid import (
    FeatureStats, compute_fid, compute_inception_score, compute_kid,
    compute_precision_recall, frechet_distance,
)
from dimsum_tpu.eval.features import RandomProjectionDetector
from dimsum_tpu.eval.metric_main import calc_metric, list_valid_metrics


# ------------------------------- data --------------------------------------


def test_latent_memmap_roundtrip(tmp_path):
    n, shape = 10, (4, 8, 8)
    path = str(tmp_path / "latents.dat")
    mm = np.memmap(path, dtype=np.float32, mode="w+", shape=(n, *shape))
    mm[:] = np.arange(n)[:, None, None, None]
    mm.flush()
    lpath = str(tmp_path / "labels.dat")
    lm = np.memmap(lpath, dtype=np.int64, mode="w+", shape=(n,))
    lm[:] = np.arange(n)
    lm.flush()
    ds = LatentMemmapDataset(path, lpath, num_samples=n, latent_shape=shape)
    x, y = ds[3]
    assert x.shape == shape and float(x[0, 0, 0]) == 3.0 and y == 3


def test_loader_epochs_and_sharding(tmp_path):
    n = 32
    path = str(tmp_path / "l.dat")
    mm = np.memmap(path, dtype=np.float32, mode="w+", shape=(n, 2, 2, 2))
    mm[:] = np.arange(n)[:, None, None, None]
    mm.flush()
    ds = LatentMemmapDataset(path, None, num_samples=n,
                             latent_shape=(2, 2, 2))
    loader = Loader(ds, batch_size=4, seed=1, num_workers=2)
    batches = list(loader)
    assert len(batches) == 8
    ids = sorted(int(b[0][i, 0, 0, 0]) for b in batches for i in range(4))
    assert ids == list(range(n))  # full epoch coverage, shuffled
    # epoch reshuffle differs
    loader.set_epoch(1)
    b2 = list(loader)
    order1 = [int(b[0][i, 0, 0, 0]) for b in batches for i in range(4)]
    order2 = [int(b[0][i, 0, 0, 0]) for b in b2 for i in range(4)]
    assert order1 != order2
    # sharding partitions the data
    l0 = Loader(ds, 4, seed=1, shard_id=0, num_shards=2)
    l1 = Loader(ds, 4, seed=1, shard_id=1, num_shards=2)
    ids0 = {int(b[0][i, 0, 0, 0]) for b in l0 for i in range(4)}
    ids1 = {int(b[0][i, 0, 0, 0]) for b in l1 for i in range(4)}
    assert not (ids0 & ids1) and len(ids0 | ids1) == n


def test_image_folder_dataset(tmp_path):
    from PIL import Image

    for cls in ("cat", "dog"):
        os.makedirs(tmp_path / cls)
        for i in range(3):
            arr = np.full((40, 40, 3), 40 * i, np.uint8)
            Image.fromarray(arr).save(tmp_path / cls / f"{i}.png")
    ds = ImageFolderDataset(str(tmp_path), image_size=32, use_labels=True)
    assert len(ds) == 6
    x, y = ds[0]
    assert x.shape == (3, 32, 32) and x.min() >= -1 and x.max() <= 1
    labels = {ds[i][1] for i in range(6)}
    assert labels == {0, 1}
    # xflip doubling
    ds2 = ImageFolderDataset(str(tmp_path), image_size=32, xflip=True)
    assert len(ds2) == 12
    np.testing.assert_allclose(ds2[0][0], ds2[6][0][:, :, ::-1])


def test_center_crop_shapes():
    from PIL import Image

    im = Image.fromarray(np.zeros((123, 77, 3), np.uint8))
    out = center_crop_arr(im, 32)
    assert out.shape == (32, 32, 3)


# ------------------------------- eval --------------------------------------


def test_feature_stats_streaming_matches_direct():
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((500, 16)).astype(np.float32)
    stats = FeatureStats()
    for i in range(0, 500, 64):
        stats.append(feats[i: i + 64])
    mean, cov = stats.get_mean_cov()
    np.testing.assert_allclose(mean, feats.mean(0), atol=1e-5)
    np.testing.assert_allclose(cov, np.cov(feats.T, bias=True), atol=1e-4)


def test_fid_zero_for_identical_and_positive_for_shifted():
    rng = np.random.default_rng(1)
    f = rng.standard_normal((2000, 8))
    s1, s2 = FeatureStats(), FeatureStats()
    s1.append(f)
    s2.append(f)
    assert abs(compute_fid(s1, s2)) < 1e-6
    s3 = FeatureStats()
    s3.append(f + 2.0)
    fid = compute_fid(s1, s3)
    assert abs(fid - 8 * 4.0) < 0.5  # mean shift 2 in 8 dims -> ~32


def test_frechet_distance_analytic():
    mu1, mu2 = np.zeros(4), np.ones(4)
    sig = np.eye(4)
    # identical covariances: FID = |mu1-mu2|^2
    assert abs(frechet_distance(mu1, sig, mu2, sig) - 4.0) < 1e-6


def test_kid_zero_same_distribution():
    rng = np.random.default_rng(2)
    a = rng.standard_normal((800, 8))
    b = rng.standard_normal((800, 8))
    kid_same = compute_kid(a, b, num_subsets=20, max_subset_size=200)
    kid_diff = compute_kid(a, b + 1.5, num_subsets=20, max_subset_size=200)
    assert abs(kid_same) < 0.5
    assert kid_diff > kid_same + 1.0


def test_inception_score_bounds():
    # uniform probs -> IS ~ 1; one-hot spread over classes -> IS ~ C
    n, c = 1000, 10
    uniform = np.full((n, c), 1.0 / c)
    m, _ = compute_inception_score(uniform)
    assert abs(m - 1.0) < 1e-3
    onehot = np.eye(c)[np.arange(n) % c] * 0.999 + 1e-4
    m2, _ = compute_inception_score(onehot)
    assert m2 > 8.0


def test_precision_recall_sanity():
    rng = np.random.default_rng(3)
    real = rng.standard_normal((400, 8))
    # same distribution -> high precision & recall
    gen_same = rng.standard_normal((400, 8))
    p, r = compute_precision_recall(real, gen_same)
    assert p > 0.7 and r > 0.7
    # far-away generated samples -> near-zero precision
    p2, r2 = compute_precision_recall(real, gen_same + 50.0)
    assert p2 < 0.05 and r2 < 0.05


class _ArrayDataset:
    def __init__(self, imgs):
        self.imgs = imgs

    def __len__(self):
        return len(self.imgs)

    def __getitem__(self, i):
        return self.imgs[i], 0


def test_calc_metric_pipeline():
    assert "fid50k_full" in list_valid_metrics()
    rng = np.random.default_rng(4)
    real_imgs = rng.integers(0, 255, (64, 3, 16, 16), dtype=np.uint8)
    gen_imgs = rng.integers(0, 255, (64, 3, 16, 16), dtype=np.uint8)

    def gen_batches():
        for i in range(0, 64, 16):
            yield gen_imgs[i: i + 16]

    det = RandomProjectionDetector(num_features=8)
    result = calc_metric("fid2k_full", real_dataset=_ArrayDataset(real_imgs),
                         gen_batches=gen_batches, detector=det)
    assert np.isfinite(result["results"]["fid2k_full"])


def test_stats_cache(tmp_path):
    rng = np.random.default_rng(5)
    imgs = rng.integers(0, 255, (32, 3, 8, 8), dtype=np.uint8)
    det = RandomProjectionDetector(num_features=8)
    from dimsum_tpu.eval.metric_main import dataset_feature_stats

    s1 = dataset_feature_stats(_ArrayDataset(imgs), det, batch_size=8,
                               cache_dir=str(tmp_path), dataset_id="d",
                               detector_id="r")
    files = list(tmp_path.glob("*.npz"))
    assert len(files) == 1
    s2 = dataset_feature_stats(_ArrayDataset(imgs), det, batch_size=8,
                               cache_dir=str(tmp_path), dataset_id="d",
                               detector_id="r")
    np.testing.assert_allclose(s1.get_mean_cov()[0], s2.get_mean_cov()[0])


# ------------------------------- vae ---------------------------------------


def test_vae_shapes_and_converter():
    from dimsum_tpu.models.vae import AutoencoderKL, convert_diffusers_vae

    vae = AutoencoderKL(ch=32, ch_mult=(1, 2))
    x = jnp.zeros((1, 3, 32, 32))
    params = vae.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))
    z = vae.apply(params, x, jax.random.PRNGKey(1), method=vae.encode)
    assert z.shape == (1, 4, 16, 16)  # one downsample for ch_mult len 2
    img = vae.apply(params, z, method=vae.decode)
    assert img.shape == (1, 3, 32, 32)

    # converter: synthesize a diffusers-style state dict for the full-size
    # architecture's FIRST pieces and check conv layout mapping
    sd = {
        "quant_conv.weight": np.random.randn(8, 8, 1, 1).astype(np.float32),
        "quant_conv.bias": np.zeros(8, np.float32),
    }
    # minimal: only check the conv transform on quant_conv
    from dimsum_tpu.models.vae import _conv_w

    w = sd["quant_conv.weight"]
    assert _conv_w(w).shape == (1, 1, 8, 8)


def test_native_batch_gather(tmp_path):
    """C++ gather core must match numpy fancy indexing exactly."""
    from dimsum_tpu.data.native import NativeLatentStore

    n, shape = 64, (4, 8, 8)
    path = str(tmp_path / "nl.dat")
    mm = np.memmap(path, dtype=np.float32, mode="w+", shape=(n, *shape))
    rng = np.random.default_rng(0)
    mm[:] = rng.standard_normal((n, *shape))
    mm.flush()
    ref = np.array(mm)

    store = NativeLatentStore(path, shape, num_threads=4)
    assert len(store) == n
    idx = rng.permutation(n)[:20]
    got = store.gather(idx)
    np.testing.assert_array_equal(got, ref[idx])
    if store.is_native:
        # out-of-range index must raise, not segfault
        with pytest.raises(IndexError):
            store.gather(np.array([n + 5]))
    store.close()

    # dataset + loader use the batch fast path
    ds = LatentMemmapDataset(path, None, latent_shape=shape)
    xs, ys = ds.gather(idx)
    np.testing.assert_array_equal(xs, ref[idx])
    loader = Loader(ds, batch_size=8, seed=0, num_workers=2)
    x, y = next(iter(loader))
    assert x.shape == (8, *shape)


def test_dataset_tools_roundtrip(tmp_path):
    """folder -> zip (dataset_tools converter) -> ImageFolderDataset reads
    back identical pixels and labels (VERDICT r1 item 7)."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import dataset_tools
    from PIL import Image

    from dimsum_tpu.data import ImageFolderDataset

    rng = np.random.default_rng(0)
    src = tmp_path / "src"
    for cls in ("cat", "dog"):
        (src / cls).mkdir(parents=True)
        for i in range(3):
            arr = rng.integers(0, 255, (40, 32, 3), dtype=np.uint8)
            Image.fromarray(arr).save(src / cls / f"{i}.png")

    dest = tmp_path / "out.zip"
    n = dataset_tools.convert_dataset(str(src), str(dest),
                                      transform="center-crop",
                                      width=16, height=16)
    assert n == 6

    ds = ImageFolderDataset(str(dest), image_size=16, use_labels=True)
    assert len(ds) == 6
    xs, ys = zip(*[ds[i] for i in range(6)])
    assert {int(y) for y in ys} == {0, 1}
    assert all(x.shape == (3, 16, 16) for x in xs)
    # pixels survive the round trip: regenerate one source crop directly
    im0 = Image.open(sorted((src / "cat").glob("*.png"))[0]).convert("RGB")
    a = np.asarray(im0)
    crop = min(a.shape[0], a.shape[1])
    a = a[(a.shape[0] - crop) // 2:(a.shape[0] + crop) // 2,
          (a.shape[1] - crop) // 2:(a.shape[1] + crop) // 2]
    want = np.asarray(Image.fromarray(a).resize((16, 16), Image.LANCZOS))
    got = ((np.asarray(xs[0]).transpose(1, 2, 0) + 1) * 127.5).round()
    np.testing.assert_allclose(got, want, atol=1.0)


def test_ppl_math():
    """compute_ppl pipeline vs a hand-computed expectation: identity
    'generator' + flatten 'LPIPS' => dist == ||slerp(t+eps)-slerp(t)||^2
    * zdim / eps^2, percentile-filtered mean (reference
    perceptual_path_length.py:139-143)."""
    from dimsum_tpu.eval.ppl import compute_ppl, slerp

    C, H, W = 3, 8, 8
    zdim = C * H * W

    def sampler_fn(z, y):
        # map latents straight to "images" in [-1, 1]-ish range
        return np.tanh(z.reshape(-1, C, H, W))

    def lpips_fn(img):
        return img.reshape(img.shape[0], -1)

    got = compute_ppl(sampler_fn, lpips_fn, (C, H, W), num_samples=64,
                      epsilon=1e-3, sampling="end", crop=False,
                      batch_size=8, num_classes=0, seed=3)
    assert np.isfinite(got) and got > 0

    # replicate by hand with the same rng stream
    rng = np.random.default_rng(3)
    dists = []
    for _ in range(8):
        t = rng.uniform(size=(8, 1)) * 0.0
        z0 = rng.standard_normal((8, zdim))
        z1 = rng.standard_normal((8, zdim))
        zt0 = slerp(z0, z1, t) * np.sqrt(zdim)
        zt1 = slerp(z0, z1, t + 1e-3) * np.sqrt(zdim)
        rng.integers  # (labels skipped: num_classes == 0)
        i0 = (np.tanh(zt0.astype(np.float32)) + 1) * (255 / 2)
        i1 = (np.tanh(zt1.astype(np.float32)) + 1) * (255 / 2)
        dists.append(((i0 - i1) ** 2).sum(axis=1) / 1e-6)
    dist = np.concatenate(dists)
    lo = np.percentile(dist, 1, method="lower")
    hi = np.percentile(dist, 99, method="higher")
    want = np.extract((dist >= lo) & (dist <= hi), dist).mean()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_ppl_constant_generator_is_zero():
    from dimsum_tpu.eval.ppl import compute_ppl

    got = compute_ppl(lambda z, y: np.zeros((z.shape[0], 3, 8, 8),
                                            np.float32),
                      lambda img: img.reshape(img.shape[0], -1),
                      (3, 8, 8), num_samples=16, batch_size=8,
                      sampling="end", crop=False)
    assert got == 0.0


def test_ppl_registered():
    from dimsum_tpu.eval.metric_main import list_valid_metrics

    for m in ("ppl2_zend", "ppl_zend", "ppl_zfull"):
        assert m in list_valid_metrics()


def test_make_detector_specs():
    """Detector factory: randproj default + flax-inception jax-random spec
    produce working (N, F) feature extractors."""
    import pytest as _pytest

    from dimsum_tpu.eval.features import detector_id, make_detector

    img = np.random.RandomState(0).randint(
        0, 256, (2, 3, 32, 32), dtype=np.uint8)
    det = make_detector(None)
    f = det(img)
    assert f.shape[0] == 2 and f.ndim == 2
    assert detector_id(None) == "randproj"

    det = make_detector("jax-random")
    f = det(img)
    assert f.shape == (2, 2048)
    # He-rescaled init (v2) bumps the cache id (see features.detector_id)
    assert detector_id("jax-random") == "jax-random-he"


def test_lmdb_dataset_with_stub_module(tmp_path, monkeypatch):
    """LMDBDataset end-to-end behind a stub `lmdb` module (the real package
    is not in this image): key encoding, PNG decode, center-crop, [-1, 1]
    CHW output -- the reference lmdb_datasets.py contract."""
    import io
    import sys
    import types

    from PIL import Image

    store = {}
    rng = np.random.RandomState(0)
    for i in range(3):
        buf = io.BytesIO()
        Image.fromarray(rng.randint(0, 255, (40, 48, 3), dtype=np.uint8)
                        ).save(buf, format="PNG")
        store[str(i).encode()] = buf.getvalue()

    class _Txn:
        def get(self, key):
            return store[key]

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    class _Env:
        def begin(self, write=False):
            assert not write
            return _Txn()

    opened = {}

    def _open(path, readonly=True, lock=False):
        opened["path"] = path
        assert readonly and not lock
        return _Env()

    stub = types.ModuleType("lmdb")
    stub.open = _open
    monkeypatch.setitem(sys.modules, "lmdb", stub)

    from dimsum_tpu.data.datasets import LMDBDataset

    ds = LMDBDataset(str(tmp_path), "celeba_256", image_size=32)
    assert opened["path"].endswith("train.lmdb")
    assert len(ds) == 30000
    x, y = ds[1]
    assert x.shape == (3, 32, 32) and y == 0
    assert x.min() >= -1.0 and x.max() <= 1.0 and x.std() > 0.1
