"""STCFormer — channel-split spatio-temporal criss-cross attention
(`model/STCFormer.py`). Each block splits channels in half: the first half
attends over joints (per frame), the second over frames (per joint); both
halves get a depthwise-conv positional branch (sep2) and a shared body-part
embedding bias (sep1), then concat + projection + residual, followed by a
pre-LN MLP residual.

Notes preserved from the reference:
* the qkv reshape at `STCFormer.py:75` interleaves q/k/v along the LAST axis
  (stride-3 columns), not contiguous thirds — reproduced exactly;
* the part-embedding biases enter scaled by 1e-4 (spatial) / 1e-9 (temporal)
  through a DropPath(0.5) that is identity at eval (`:116-122`);
* scale is (d_coor // 2) ** -0.5 — the reference scales by the half-channel
  width, not per-head width (`:51`);
* the reference hardcodes `.cuda()` for the part index (`:60`) — behavior,
  not device placement, is replicated;
* 2-channel input; embeddings/heads are bias-free Linears.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from kasportsformer_tpu.models import layers as L
from kasportsformer_tpu.models.registry import register_model

Params = dict[str, Any]

# body-part id per joint (`STCFormer.py:60`)
PART_IDS = np.array([0, 1, 1, 1, 2, 2, 2, 0, 0, 0, 0, 3, 3, 3, 4, 4, 4])


@dataclasses.dataclass(frozen=True)
class STCFormerConfig:
    n_layers: int = 6
    d_hid: int = 256
    n_frames: int = 27
    num_joints: int = 17
    num_heads: int = 8
    mlp_ratio: float = 4.0
    dim_out: int = 3


def _dw_conv3x3_init(key, channels: int) -> Params:
    """Depthwise 3x3 conv (groups=channels): weight (C,1,3,3)."""
    kw, kb = jax.random.split(key)
    fan_in = 9  # per-group fan-in = 1*3*3
    bound = 1.0 / math.sqrt(fan_in)
    return {
        "w": jax.random.uniform(kw, (channels, 1, 3, 3), jnp.float32, -bound, bound),
        "b": jax.random.uniform(kb, (channels,), jnp.float32, -bound, bound),
    }


def _dw_conv3x3(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """x: (B, C, T, S) NCHW depthwise."""
    c = x.shape[1]
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=c)
    return y + p["b"].astype(x.dtype)[None, :, None, None]


def _stc_attention(p: Params, x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    b, t, s, c = x.shape
    h = num_heads
    half = c // 2
    d = half // h  # per-head width of each half
    residual = x
    xn = L.layer_norm(p["norm"], x)
    qkv = L.linear(p["qkv"], xn)  # (b,t,s,3c)
    # interleaved split (reshape ...,(c,3)) — `STCFormer.py:75`
    qkv = qkv.reshape(b, t, s, c, 3)
    q, k, v = qkv[..., 0], qkv[..., 1], qkv[..., 2]  # (b,t,s,c)
    q_s, q_t = q[..., :half], q[..., half:]
    k_s, k_t = k[..., :half], k[..., half:]
    v_s, v_t = v[..., :half], v[..., half:]
    scale = half**-0.5

    # spatial half: attend over joints per (b, h, t)
    def heads_s(z):  # (b,t,s,half) -> (b,h,t,s,d)
        return z.reshape(b, t, s, h, d).transpose(0, 3, 1, 2, 4)

    att_s = jax.lax.dot_general(
        heads_s(q_s), heads_s(k_s), (((4,), (4,)), ((0, 1, 2), (0, 1, 2)))) * scale
    att_s = jax.nn.softmax(att_s.astype(jnp.float32), -1).astype(x.dtype)

    # temporal half: attend over frames per (b, h, s)
    def heads_t(z):  # (b,t,s,half) -> (b,h,s,t,d)
        return z.reshape(b, t, s, h, d).transpose(0, 3, 2, 1, 4)

    att_t = jax.lax.dot_general(
        heads_t(q_t), heads_t(k_t), (((4,), (4,)), ((0, 1, 2), (0, 1, 2)))) * scale
    att_t = jax.nn.softmax(att_t.astype(jnp.float32), -1).astype(x.dtype)

    # sep2: depthwise conv positional branches on (b, half, t, s)
    v_s_c = v_s.transpose(0, 3, 1, 2)
    v_t_c = v_t.transpose(0, 3, 1, 2)
    sep2_s = _dw_conv3x3(p["sep2_s"], v_s_c)  # (b,half,t,s)
    sep2_t = _dw_conv3x3(p["sep2_t"], v_t_c)
    sep2_s = sep2_s.reshape(b, h, d, t, s).transpose(0, 1, 3, 4, 2)  # (b,h,t,s,d)
    sep2_t = sep2_t.reshape(b, h, d, t, s).transpose(0, 1, 4, 3, 2)  # (b,h,s,t,d)

    # sep1: shared body-part embedding (17, d)
    sep = p["part_embed"][jnp.asarray(PART_IDS)]  # (s, d)

    x_s = jax.lax.dot_general(
        att_s, heads_s(v_s), (((4,), (3,)), ((0, 1, 2), (0, 1, 2))))
    x_s = x_s + sep2_s + 1e-4 * sep.astype(x.dtype)  # (b,h,t,s,d)
    x_t = jax.lax.dot_general(
        att_t, heads_t(v_t), (((4,), (3,)), ((0, 1, 2), (0, 1, 2))))
    x_t = x_t + sep2_t  # (b,h,s,t,d)
    x_t = x_t.transpose(0, 1, 3, 2, 4)  # (b,h,t,s,d)
    x_t = x_t + 1e-9 * sep.astype(x.dtype)

    out = jnp.concatenate([x_s, x_t], axis=-1)  # (b,h,t,s,2d)
    out = out.transpose(0, 2, 3, 1, 4).reshape(b, t, s, c)
    return L.linear(p["proj"], out) + residual


class STCFormer:
    def __init__(self, cfg: STCFormerConfig | None = None, compute_dtype=jnp.float32):
        self.cfg = cfg or STCFormerConfig()
        self.compute_dtype = compute_dtype

    def _block_init(self, key) -> Params:
        cfg = self.cfg
        half = cfg.d_hid // 2
        d = half // cfg.num_heads
        keys = jax.random.split(key, 6)
        return {
            "norm": L.layer_norm_init(cfg.d_hid),
            "qkv": L.linear_init(keys[0], cfg.d_hid, cfg.d_hid * 3),
            "proj": L.linear_init(keys[1], cfg.d_hid, cfg.d_hid),
            "sep2_s": _dw_conv3x3_init(keys[2], half),
            "sep2_t": _dw_conv3x3_init(keys[3], half),
            "part_embed": jax.random.normal(keys[4], (5, d), jnp.float32),
            "mlp_norm": L.layer_norm_init(cfg.d_hid),
            "mlp": {
                "fc1": L.linear_init(keys[5], cfg.d_hid, cfg.d_hid * 4, bias=False),
                "fc2": L.linear_init(jax.random.fold_in(keys[5], 1),
                                     cfg.d_hid * 4, cfg.d_hid, bias=False),
            },
        }

    def init(self, key: jax.Array) -> tuple[Params, Params]:
        cfg = self.cfg
        keys = jax.random.split(key, 3)
        params: Params = {
            "pose_emb": L.linear_init(keys[0], 2, cfg.d_hid, bias=False),
            "head": L.linear_init(keys[1], cfg.d_hid, cfg.dim_out, bias=False),
        }
        blocks = [self._block_init(k)
                  for k in jax.random.split(keys[2], cfg.n_layers)]
        params["blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
        return params, {}

    def apply(self, params: Params, state: Params, x: jnp.ndarray,
              train: bool = False) -> tuple[jnp.ndarray, Params]:
        cfg = self.cfg
        x = x[..., :2].astype(self.compute_dtype)
        x = jax.nn.gelu(L.linear(params["pose_emb"], x), approximate=False)

        def body(carry, block_p):
            h = _stc_attention(block_p, carry, cfg.num_heads)
            h = L.mlp_ln_residual(block_p["mlp_norm"], block_p["mlp"], h)
            return h, None

        x, _ = jax.lax.scan(body, x, params["blocks"])
        y = L.linear(params["head"], x)
        return y.astype(jnp.float32), state

    def parameter_count(self, params: Params) -> int:
        return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


@register_model("STCFormer")
def _build(config):
    cfg = STCFormerConfig(
        n_layers=config.n_layers, d_hid=config.dim_feat,
        n_frames=config.n_frames, num_joints=config.num_joints,
        num_heads=config.num_heads, dim_out=config.dim_out)
    dtype = jnp.bfloat16 if config.compute_dtype == "bfloat16" else jnp.float32
    return STCFormer(cfg, compute_dtype=dtype)
