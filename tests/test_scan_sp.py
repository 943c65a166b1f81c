"""Sequence-parallel selective scan: exact parity with the single-device
scan on an 8-device mesh, and h0-seeding of the kernels."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from dimsum_tpu.ops.selective_scan import selective_scan_xla
from dimsum_tpu.ops.selective_scan_sp import selective_scan_seq_parallel


def make_inputs(rng, batch=2, L=64, dim=16, n=8):
    u = rng.standard_normal((batch, L, dim)).astype(np.float32)
    delta = (0.5 * rng.standard_normal((batch, L, dim))).astype(np.float32)
    A = -np.exp(rng.standard_normal((dim, n)).astype(np.float32) * 0.5)
    B = rng.standard_normal((batch, L, n)).astype(np.float32)
    C = rng.standard_normal((batch, L, n)).astype(np.float32)
    D = np.ones(dim, np.float32)
    z = rng.standard_normal((batch, L, dim)).astype(np.float32)
    bias = (0.1 * rng.standard_normal(dim)).astype(np.float32)
    return u, delta, A, B, C, D, z, bias


def test_xla_h0_seeding():
    """h0 continuation must equal scanning the concatenated sequence."""
    rng = np.random.default_rng(0)
    u, delta, A, B, C, D, z, bias = make_inputs(rng, L=64)
    full = selective_scan_xla(u, delta, A, B, C, D, z, bias, True)
    half = 32
    _, h_mid = selective_scan_xla(
        u[:, :half], delta[:, :half], A, B[:, :half], C[:, :half], D,
        z[:, :half], bias, True, return_last_state=True)
    second = selective_scan_xla(
        u[:, half:], delta[:, half:], A, B[:, half:], C[:, half:], D,
        z[:, half:], bias, True, h0=h_mid)
    np.testing.assert_allclose(np.asarray(second), np.asarray(full)[:, half:],
                               rtol=2e-3, atol=1e-3)


def test_seq_parallel_matches_single_device():
    devices = jax.devices()
    assert len(devices) == 8
    mesh = Mesh(np.array(devices), axis_names=("seq",))
    rng = np.random.default_rng(1)
    u, delta, A, B, C, D, z, bias = make_inputs(rng, L=128, dim=16, n=8)

    want = selective_scan_xla(u, delta, A, B, C, D, z, bias, True)

    sp = shard_map(
        lambda *args: selective_scan_seq_parallel(
            *args, delta_softplus=True, axis_name="seq", impl="xla"),
        mesh=mesh,
        in_specs=(P(None, "seq", None), P(None, "seq", None), P(),
                  P(None, "seq", None), P(None, "seq", None), P(),
                  P(None, "seq", None), P()),
        out_specs=P(None, "seq", None),
        check_vma=False,
    )
    got = jax.jit(sp)(u, delta, A, B, C, D, z, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=1e-3)


def test_pallas_h0_and_last_state_interpret():
    from jax.experimental.pallas import tpu as pltpu
    from dimsum_tpu.ops.selective_scan import _selective_scan_pallas_fwd_impl

    rng = np.random.default_rng(2)
    u, delta, A, B, C, D, z, bias = make_inputs(rng, L=64, dim=128, n=8)
    h0 = rng.standard_normal((2, 128, 8)).astype(np.float32)

    want, want_last = selective_scan_xla(
        u, delta, A, B, C, D, z, bias, True, return_last_state=True,
        h0=jnp.asarray(h0))
    with pltpu.force_tpu_interpret_mode():
        got, got_last = _selective_scan_pallas_fwd_impl(
            u, delta, A, B, C, D, z, bias, True, h0=jnp.asarray(h0),
            want_last_state=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got_last), np.asarray(want_last),
                               rtol=2e-3, atol=1e-3)


@pytest.mark.slow
def test_mamba_mixer_seq_parallel_matches_single_device():
    """Full Mamba mixer under shard_map with L sharded: halo'd causal conv
    + two-pass scan must equal the unsharded mixer exactly."""
    import flax.linen  # noqa: F401  (ensure flax import order)
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    from dimsum_tpu.models.mamba import Mamba

    devs = np.array(jax.devices()[:4])
    mesh = Mesh(devs, ("seq",))

    B, L, D = 2, 64, 32
    x = jax.random.normal(jax.random.PRNGKey(0), (B, L, D), jnp.float32)

    ref_mod = Mamba(d_model=D, d_state=8, layer_idx=0)
    params = ref_mod.init(jax.random.PRNGKey(1), x)
    want = ref_mod.apply(params, x)

    sp_mod = Mamba(d_model=D, d_state=8, layer_idx=0, seq_axis="seq")

    def fwd(x_shard):
        return sp_mod.apply(params, x_shard)

    got = jax.jit(shard_map(
        fwd, mesh=mesh, in_specs=P(None, "seq", None),
        out_specs=P(None, "seq", None), check_vma=False))(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_dim_seq_parallel_matches_unsharded_L1024():
    """DiMConfig.seq_axis: a full DiM (combined block, grid 32 -> L=1024,
    the 512-res token count) with every mixer's conv+scan in shard_map
    islands over an 8-way 'seq' mesh == the unsharded model, same params."""
    from dimsum_tpu.models.dim import DiM, DiMConfig
    from dimsum_tpu.parallel import make_seq_mesh

    mesh = make_seq_mesh(data=1, seq=8)
    base = dict(img_resolution=64, patch_size=2, in_channels=4,
                hidden_size=32, depth=2, num_classes=10, rms_norm=True,
                block_type="combined", cond_mamba=True, scan_impl="xla")
    cfg_ref = DiMConfig(**base)
    cfg_sp = DiMConfig(**base, seq_axis="seq", seq_mesh=mesh)

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 64, 64))
    t = jnp.array([0.3, 0.7])
    y = jnp.array([1, 2])
    m_ref, m_sp = DiM(cfg_ref), DiM(cfg_sp)
    params = m_ref.init(jax.random.PRNGKey(1), x, t, y)
    # same param tree: seq parallelism adds no parameters
    jax.tree_util.tree_all(jax.tree.map(lambda a, b: a.shape == b.shape,
                                        params,
                                        jax.eval_shape(m_sp.init,
                                                       jax.random.PRNGKey(1),
                                                       x, t, y)))
    want = m_ref.apply(params, x, t, y)
    got = jax.jit(lambda p, *a: m_sp.apply(p, *a))(params, x, t, y)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-4)
