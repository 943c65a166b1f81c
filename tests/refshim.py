"""Import harness for the REAL reference code at /root/reference (CPU only).

The reference cannot import without CUDA/triton/timm/pywt:

* ``mamba_simple.py:16`` has a broken no-CUDA fallback
  (``causal_conv1d_fn, causal_conv1d_update = None`` -> TypeError on unpack),
* ``selective_scan_interface.py:3-4`` imports the CUDA extension modules at
  module scope,
* ``models_dim.py:15`` needs timm, ``wavelet_layer.py:1`` needs pywt,
  ``ops/triton/layernorm.py:13`` needs triton.

This shim makes the reference importable and routes every fused/CUDA entry
point to the reference's OWN pure-torch oracles so that the numerics executed
are the reference's published code:

* ``causal_conv1d_fn/_update``  -> ``causal_conv1d_ref/_update_ref``
  (causal-conv1d/causal_conv1d/causal_conv1d_interface.py:45,79)
* ``selective_scan_fn``         -> ``selective_scan_ref``
  (mamba/mamba_ssm/ops/selective_scan_interface.py:104)
* ``mamba_inner_fn[_cond]``     -> ``mamba_inner_ref`` (:1455); the CUDA cond
  kernel ignores ``init_states`` (causal_conv1d.cpp:128-140, SURVEY §2.1), so
  the cond adapters drop it -- behaviorally identical to the shipped kernels.
* ``mamba_inner_fn_no_out_proj[_cond]`` -> ``mamba_inner_ref`` with an
  identity out-projection, rearranged back to (B, D, L).
* ``bimamba_inner_fn``          -> ``bimamba_inner_ref`` (:1503)
* triton ``rms_norm_fn/layer_norm_fn`` -> ``rms_norm_ref/layer_norm_ref``
  (ops/triton/layernorm.py:19,33) with ``upcast=residual_in_fp32``.

Only plumbing (module registration, tiny timm/pywt stand-ins for
PatchEmbed/Attention/Mlp and the haar filter bank) is written here; all model
math comes from /root/reference.

This module mutates ``sys.modules`` -- import it only from dedicated
subprocesses (see run_reference_parity.py), never from the main test process.
"""

from __future__ import annotations

import importlib
import importlib.util
import sys
import types

REF = "/root/reference"


def _stub_module(name):
    mod = types.ModuleType(name)

    def _getattr(attr, _name=name):
        raise RuntimeError(f"stub module {_name} has no usable attr {attr}")

    mod.__getattr__ = _getattr
    sys.modules[name] = mod
    return mod


def _load_file(modname, path):
    spec = importlib.util.spec_from_file_location(modname, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[modname] = mod
    spec.loader.exec_module(mod)
    return mod


def _install_fake_triton():
    """triton/triton.language stand-ins good enough to *define* (never run)
    the reference's @triton.jit kernels."""
    if "triton" in sys.modules:
        return
    triton = types.ModuleType("triton")
    tl = types.ModuleType("triton.language")
    tl.constexpr = object()

    def _identity_decorator(*a, **k):
        if len(a) == 1 and callable(a[0]) and not k:
            return a[0]
        return lambda fn: fn

    triton.jit = _identity_decorator
    triton.autotune = _identity_decorator
    triton.heuristics = _identity_decorator

    class Config:
        def __init__(self, *a, **k):
            pass

    triton.Config = Config
    triton.language = tl
    sys.modules["triton"] = triton
    sys.modules["triton.language"] = tl


def _install_fake_timm():
    """Minimal timm.models.vision_transformer {PatchEmbed, Attention, Mlp}
    and timm.layers.use_fused_attn. Parameter names match real timm
    (proj/qkv/fc1/fc2) so state dicts are interchangeable."""
    if "timm" in sys.modules:
        return
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    class PatchEmbed(nn.Module):
        def __init__(self, img_size=224, patch_size=16, in_chans=3,
                     embed_dim=768, norm_layer=None, flatten=True, bias=True):
            super().__init__()
            self.img_size = (img_size, img_size)
            self.patch_size = (patch_size, patch_size)
            self.grid_size = (img_size // patch_size, img_size // patch_size)
            self.num_patches = self.grid_size[0] * self.grid_size[1]
            self.flatten = flatten
            self.proj = nn.Conv2d(in_chans, embed_dim, kernel_size=patch_size,
                                  stride=patch_size, bias=bias)
            self.norm = norm_layer(embed_dim) if norm_layer else nn.Identity()

        def forward(self, x):
            x = self.proj(x)
            if self.flatten:
                x = x.flatten(2).transpose(1, 2)
            return self.norm(x)

    class Attention(nn.Module):
        def __init__(self, dim, num_heads=8, qkv_bias=False, qk_norm=False,
                     attn_drop=0.0, proj_drop=0.0, norm_layer=nn.LayerNorm):
            super().__init__()
            assert dim % num_heads == 0
            self.num_heads = num_heads
            self.head_dim = dim // num_heads
            self.scale = self.head_dim ** -0.5
            self.qkv = nn.Linear(dim, dim * 3, bias=qkv_bias)
            self.q_norm = norm_layer(self.head_dim) if qk_norm else nn.Identity()
            self.k_norm = norm_layer(self.head_dim) if qk_norm else nn.Identity()
            self.attn_drop = nn.Dropout(attn_drop)
            self.proj = nn.Linear(dim, dim)
            self.proj_drop = nn.Dropout(proj_drop)

        def forward(self, x):
            B, N, C = x.shape
            qkv = (self.qkv(x)
                   .reshape(B, N, 3, self.num_heads, self.head_dim)
                   .permute(2, 0, 3, 1, 4))
            q, k, v = qkv.unbind(0)
            q, k = self.q_norm(q), self.k_norm(k)
            x = F.scaled_dot_product_attention(q, k, v)
            x = x.transpose(1, 2).reshape(B, N, C)
            return self.proj_drop(self.proj(x))

    class Mlp(nn.Module):
        def __init__(self, in_features, hidden_features=None,
                     out_features=None, act_layer=nn.GELU, bias=True,
                     drop=0.0):
            super().__init__()
            out_features = out_features or in_features
            hidden_features = hidden_features or in_features
            self.fc1 = nn.Linear(in_features, hidden_features, bias=bias)
            self.act = act_layer()
            self.drop1 = nn.Dropout(drop)
            self.fc2 = nn.Linear(hidden_features, out_features, bias=bias)
            self.drop2 = nn.Dropout(drop)

        def forward(self, x):
            return self.drop2(self.fc2(self.drop1(self.act(self.fc1(x)))))

    timm = types.ModuleType("timm")
    timm_models = types.ModuleType("timm.models")
    vit = types.ModuleType("timm.models.vision_transformer")
    vit.PatchEmbed = PatchEmbed
    vit.Attention = Attention
    vit.Mlp = Mlp
    layers = types.ModuleType("timm.layers")
    layers.use_fused_attn = lambda: False  # manual SDPA path (same math)
    timm.models = timm_models
    timm.layers = layers
    timm_models.vision_transformer = vit
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = timm_models
    sys.modules["timm.models.vision_transformer"] = vit
    sys.modules["timm.layers"] = layers


def _install_fake_pywt():
    """pywt.Wavelet('haar') with the standard pywt haar filter bank."""
    if "pywt" in sys.modules:
        return
    pywt = types.ModuleType("pywt")
    s = 0.7071067811865476  # 1/sqrt(2)

    class Wavelet:
        def __init__(self, name):
            assert name == "haar", f"shim only provides haar, got {name}"
            self.dec_lo = [s, s]
            self.dec_hi = [-s, s]
            self.rec_lo = [s, s]
            self.rec_hi = [s, -s]

    pywt.Wavelet = Wavelet
    sys.modules["pywt"] = pywt


def install():
    """Install all shims and import the reference modules. Returns a
    namespace with .models_dim, .mamba_simple, .ssi (selective scan
    interface), .layernorm."""
    from einops import rearrange
    import torch

    _stub_module("causal_conv1d_cuda")
    _stub_module("selective_scan_cuda")
    _install_fake_triton()
    _install_fake_timm()
    _install_fake_pywt()

    # -- causal_conv1d package backed by the reference's own refs ----------
    cc_pkg = types.ModuleType("causal_conv1d")
    cc_pkg.causal_conv1d_fn = None  # placeholder for the self-import
    sys.modules["causal_conv1d"] = cc_pkg
    cc_iface = _load_file(
        "causal_conv1d.causal_conv1d_interface",
        f"{REF}/causal-conv1d/causal_conv1d/causal_conv1d_interface.py")
    cc_pkg.causal_conv1d_fn = cc_iface.causal_conv1d_ref
    cc_pkg.causal_conv1d_update = cc_iface.causal_conv1d_update_ref

    # -- mamba_ssm: path-package so the top-level __init__ (which pulls the
    #    LM stack) never runs --------------------------------------------
    mamba_pkg = types.ModuleType("mamba_ssm")
    mamba_pkg.__path__ = [f"{REF}/mamba/mamba_ssm"]
    sys.modules["mamba_ssm"] = mamba_pkg

    ssi = importlib.import_module("mamba_ssm.ops.selective_scan_interface")
    ssi.selective_scan_fn = ssi.selective_scan_ref  # pure ref all the way

    layernorm = importlib.import_module("mamba_ssm.ops.triton.layernorm")

    def rms_norm_fn(x, weight, bias, residual=None, prenorm=False,
                    residual_in_fp32=False, eps=1e-6):
        return layernorm.rms_norm_ref(x, weight, bias, residual=residual,
                                      eps=eps, prenorm=prenorm,
                                      upcast=residual_in_fp32)

    def layer_norm_fn(x, weight, bias, residual=None, eps=1e-6,
                      prenorm=False, residual_in_fp32=False,
                      is_rms_norm=False):
        fn = layernorm.rms_norm_ref if is_rms_norm else layernorm.layer_norm_ref
        return fn(x, weight, bias, residual=residual, eps=eps,
                  prenorm=prenorm, upcast=residual_in_fp32)

    layernorm.rms_norm_fn = rms_norm_fn
    layernorm.layer_norm_fn = layer_norm_fn

    ms = importlib.import_module("mamba_ssm.modules.mamba_simple")

    def _no_out_proj(xz, conv_w, conv_b, xproj_w, dtproj_w, A, B=None,
                     C=None, D=None, delta_bias=None, delta_softplus=True,
                     init_states=None):
        d_inner = xz.shape[1] // 2
        eye = torch.eye(d_inner, dtype=xz.dtype, device=xz.device)
        y = ssi.mamba_inner_ref(xz, conv_w, conv_b, xproj_w, dtproj_w, eye,
                                None, A, B, C, D, delta_bias=delta_bias,
                                delta_softplus=delta_softplus)
        return rearrange(y, "b l d -> b d l")

    def _cond(xz, conv_w, conv_b, xproj_w, dtproj_w, outproj_w, outproj_b,
              A, B=None, C=None, D=None, delta_bias=None,
              delta_softplus=True, init_states=None):
        return ssi.mamba_inner_ref(xz, conv_w, conv_b, xproj_w, dtproj_w,
                                   outproj_w, outproj_b, A, B, C, D,
                                   delta_bias=delta_bias,
                                   delta_softplus=delta_softplus)

    ms.selective_scan_fn = ssi.selective_scan_ref
    ms.mamba_inner_fn = ssi.mamba_inner_ref
    ms.bimamba_inner_fn = ssi.bimamba_inner_ref
    ms.mamba_inner_fn_cond = _cond
    ms.mamba_inner_fn_no_out_proj = _no_out_proj
    ms.mamba_inner_fn_no_out_proj_cond = _no_out_proj
    ms.causal_conv1d_fn = cc_iface.causal_conv1d_ref
    ms.causal_conv1d_update = cc_iface.causal_conv1d_update_ref
    ms.rms_norm_fn = rms_norm_fn
    ms.layer_norm_fn = layer_norm_fn
    ms.RMSNorm = layernorm.RMSNorm

    # -- the dimsum app --------------------------------------------------
    if f"{REF}/dimsum" not in sys.path:
        sys.path.insert(0, f"{REF}/dimsum")
    models_dim = importlib.import_module("models_dim")
    models_dim.rms_norm_fn = rms_norm_fn
    models_dim.layer_norm_fn = layer_norm_fn
    models_dim.RMSNorm = layernorm.RMSNorm

    ns = types.SimpleNamespace(models_dim=models_dim, mamba_simple=ms,
                               ssi=ssi, layernorm=layernorm,
                               causal_conv1d=cc_iface)
    return ns
