"""HDFormer — U-shaped hierarchical directed-graph transformer on vertex +
edge features (`model/HDFormer/`).

Structure (reference `HDFormer.py:9-156`, `vertex_model.py:39-112`):
  input (B,T,17,2) -> Linear 27->96 frames -> 9 downsample HOA blocks
  (stride-2 every other block), 4 upsample blocks with x2 interpolation and
  skip adds, 4 merge blocks re-injected at full rate -> conv joint regressor
  over (3, V) windows -> root-zero concat -> Linear 96->27 frames.

Each High-Order-Attention block (`block.py:268-402`):
  FirstOrderAttention — 3-subset adaptive graph conv (static 'foa' adjacency
  + learned offset + data-dependent similarity) — then optional cross-
  attention from vertex tokens to multi-hop edge tokens (hop-2..4 bone chains
  compressed by tiny per-part linears), then a temporal conv (9,1) with BN.

Quirks preserved: the 'foa' In/Out adjacency includes the root's parent (-1)
which wraps to the LAST joint in numpy indexing (`graph.py:3-7` + `:48`) —
replicated bit-for-bit; FOA's output BN initializes at 1e-6; the similarity
softmax normalizes over the SOURCE axis (Softmax(-2), `block.py:242`).
The reference hardcodes device='cuda' for the adjacency (`HDFormer.py:24-25`);
here it's a folded constant.
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

PARENTS = np.array([-1, 0, 1, 2, 0, 4, 5, 0, 7, 8, 9, 8, 11, 12, 8, 14, 15])
EDGES_HOP1 = [(p, c) for c, p in enumerate(PARENTS) if p >= 0]
EDGES_HOP2 = [(0, 1, 2), (0, 4, 5), (0, 7, 8), (1, 2, 3), (4, 5, 6), (7, 8, 9),
              (7, 8, 11), (7, 8, 14), (8, 9, 10), (8, 11, 12), (8, 14, 15),
              (11, 12, 13), (14, 15, 16)]
EDGES_HOP3 = [(0, 1, 2, 3), (0, 4, 5, 6), (0, 7, 8, 9), (7, 8, 9, 10),
              (7, 8, 11, 12), (7, 8, 14, 15), (8, 11, 12, 13), (8, 14, 15, 16)]
EDGES_HOP4 = [(0, 7, 8, 9, 10), (0, 7, 8, 11, 12), (0, 7, 8, 14, 15),
              (7, 8, 11, 12, 13), (7, 8, 14, 15, 16)]
HOP_EDGES = {1: EDGES_HOP1, 2: EDGES_HOP2, 3: EDGES_HOP3, 4: EDGES_HOP4}


def _edge2mat(links, n):
    a = np.zeros((n, n))
    for i, j in links:
        a[j, i] = 1  # j may be -1: wraps to the last joint (reference quirk)
    return a


def _norm_digraph(a):
    dl = a.sum(0)
    dn = np.zeros_like(a)
    for i in range(a.shape[0]):
        if dl[i] > 0:
            dn[i, i] = dl[i] ** -1
    return a @ dn


def foa_adjacency(n: int = 17) -> np.ndarray:
    """(3, V, V) 'foa' adjacency stack: identity, normalized In, normalized
    Out (`graph.py:96-103`), incl. the (0,-1) wraparound edge."""
    self_link = [(i, i) for i in range(n)]
    neighbor = [(c, p) for c, p in enumerate(PARENTS)]
    link_mat = _edge2mat(self_link, n)
    in_mat = _norm_digraph(_edge2mat(neighbor, n))
    out_mat = _norm_digraph(_edge2mat([(j, i) for i, j in neighbor], n))
    return np.stack([link_mat, in_mat, out_mat]).astype(np.float32)


EDGE_CHILD = np.array([c for p, c in EDGES_HOP1])
EDGE_PARENT = np.array([p for p, c in EDGES_HOP1])


@dataclasses.dataclass(frozen=True)
class HDFormerConfig:
    in_channels: int = 2
    num_joints: int = 17
    n_frames: int = 27
    inner_frames: int = 96
    attention: bool = True
    max_hop: int = 4
    data_bn: bool = True
    deterministic: bool = True  # nearest-neighbor upsampling
    planes: tuple[int, ...] = (16, 32, 64, 128, 256)


# ------------------------------------------------------- parameter helpers


def _conv1x1_init(key, c_in, c_out):
    return L.conv2d_init(key, c_in, c_out, 1, 1)


def _kaiming_conv_init(key, c_in, c_out, kh, kw):
    """kaiming_normal fan_out (`block.py:26-30`), zero bias."""
    fan_out = c_out * kh * kw
    std = math.sqrt(2.0 / fan_out)
    return {"w": std * jax.random.normal(key, (c_out, c_in, kh, kw), jnp.float32),
            "b": jnp.zeros((c_out,), jnp.float32)}


def _branch_conv_init(key, c_in, c_out, branches=3):
    """conv_branch_init (`block.py:16-23`): N(0, sqrt(2/(n*k1*k2*branches)))."""
    std = math.sqrt(2.0 / (c_out * c_in * 1 * branches))
    return {"w": std * jax.random.normal(key, (c_out, c_in, 1, 1), jnp.float32),
            "b": jnp.zeros((c_out,), jnp.float32)}


def _bn_init(c, scale=1.0):
    p = {"scale": jnp.full((c,), scale, jnp.float32),
         "bias": jnp.zeros((c,), jnp.float32)}
    s = {"mean": jnp.zeros((c,), jnp.float32), "var": jnp.ones((c,), jnp.float32)}
    return p, s


# ------------------------------------------------------- first-order attn


def _foa_init(key, c_in, c_out, adj_len=17):
    inter = c_out // 4
    keys = jax.random.split(key, 13)
    params: Params = {"PA": jnp.full((3, adj_len, adj_len), 1e-6, jnp.float32),
                      "subsets": []}
    state: Params = {}
    for i in range(3):
        params["subsets"].append({
            "linear": L.linear_init(keys[4 * i], c_in, c_in),
            "conv_a": _kaiming_conv_init(keys[4 * i + 1], c_in, inter, 1, 1),
            "conv_b": _kaiming_conv_init(keys[4 * i + 2], c_in, inter, 1, 1),
            "conv_d": _branch_conv_init(keys[4 * i + 3], c_in, c_out),
        })
    bn_p, bn_s = _bn_init(c_out, scale=1e-6)
    params["bn"] = bn_p
    state["bn"] = bn_s
    if c_in != c_out:
        down_bn_p, down_bn_s = _bn_init(c_out)
        params["down"] = {"conv": _kaiming_conv_init(keys[12], c_in, c_out, 1, 1),
                          "bn": down_bn_p}
        state["down_bn"] = down_bn_s
    return params, state


def _foa(p: Params, state: Params, x: jnp.ndarray, adj: np.ndarray, train: bool
         ) -> tuple[jnp.ndarray, Params]:
    """x: (N, C, T, V) -> (N, C_out, T, V) (`block.py:190-265`)."""
    n, c, t, v = x.shape
    a_full = jnp.asarray(adj, x.dtype) + p["PA"].astype(x.dtype)
    y = None
    for i in range(3):
        sub = p["subsets"][i]
        x_in = x.transpose(0, 2, 3, 1)  # (N,T,V,C)
        x_in = L.linear(sub["linear"], x_in)
        a0 = x_in.transpose(0, 3, 1, 2).reshape(n, c * t, v)  # 'N T V C->N (C T) V'
        a1 = L.conv2d(sub["conv_a"], x)  # (N, inter, T, V)
        inter = a1.shape[1]
        a1 = a1.transpose(0, 3, 1, 2).reshape(n, v, inter * t)
        a2 = L.conv2d(sub["conv_b"], x).reshape(n, inter * t, v)
        sim = jnp.matmul(a1, a2) / a1.shape[-1]  # (N, V, V)
        sim = jax.nn.softmax(sim.astype(jnp.float32), axis=-2).astype(x.dtype)
        a_i = sim + a_full[i]
        z = jnp.matmul(a0, a_i).reshape(n, c, t, v)
        z = L.conv2d(sub["conv_d"], z)
        y = z if y is None else y + z
    y, new_bn = L.batch_norm_2d(p["bn"], state["bn"], y, train)
    new_state = {"bn": new_bn}
    if "down" in p:
        d = L.conv2d(p["down"]["conv"], x)
        d, new_state["down_bn"] = L.batch_norm_2d(p["down"]["bn"],
                                                  state["down_bn"], d, train)
    else:
        d = x
    return jax.nn.relu(y + d), new_state


# ------------------------------------------------------- HOA block


def _hoa_init(key, c_in, c_out, cfg: HDFormerConfig, stride=1, residual=True,
              max_hop=2):
    keys = jax.random.split(key, 10)
    foa_p, foa_s = _foa_init(keys[0], c_in, c_out, cfg.num_joints)
    tcn_bn1_p, tcn_bn1_s = _bn_init(c_out)
    tcn_bn2_p, tcn_bn2_s = _bn_init(c_out)
    params: Params = {
        "foa": foa_p,
        "tcn_conv": _kaiming_conv_init(keys[1], c_out, c_out, 9, 1),
        "tcn_bn1": tcn_bn1_p, "tcn_bn2": tcn_bn2_p,
    }
    state: Params = {"foa": foa_s, "tcn_bn1": tcn_bn1_s, "tcn_bn2": tcn_bn2_s}
    if residual and not (c_in == c_out and stride == 1):
        res_bn_p, res_bn_s = _bn_init(c_out)
        params["residual"] = {"conv": _kaiming_conv_init(keys[2], c_in, c_out, 1, 1),
                              "bn": res_bn_p}
        state["residual_bn"] = res_bn_s
    if cfg.attention:
        params["attn"] = {
            "to_q": L.linear_init(keys[3], c_out, c_out),
            "to_k": L.linear_init(keys[4], c_out, c_out),
            "to_v": L.linear_init(keys[5], c_out, c_out),
            "proj": L.linear_init(keys[6], c_out, c_out),
        }
        params["norm_v"] = L.layer_norm_init(c_out)
        params["mlp"] = L.mlp_init(keys[7], c_out, c_out * 2, c_out)
        params["norm_mlp"] = L.layer_norm_init(c_out)
        hop_linears = []
        hk = jax.random.split(keys[8], max(max_hop - 1, 1))
        for hop_i in range(max_hop - 1):
            parts = HOP_EDGES[hop_i + 2]
            pk = jax.random.split(hk[hop_i], len(parts))
            hop_linears.append([L.linear_init(pk[i], hop_i + 2, 1)
                                for i in range(len(parts))])
        params["hop_linears"] = hop_linears
    return params, state


def _edge_features(fv: jnp.ndarray) -> jnp.ndarray:
    """Hop-1 edge features: child - parent over V (`HDFormer.py:73-79`,
    without the zero pad used only at the input)."""
    return fv[..., EDGE_CHILD] - fv[..., EDGE_PARENT]


def _cross_attention(p: Params, fv: jnp.ndarray, fe: jnp.ndarray,
                     num_heads: int = 8) -> jnp.ndarray:
    """(M,V,C) queries over (M,E,C) edge keys/values (`block.py:90-150`)."""
    m, v, c = fv.shape
    e = fe.shape[1]
    d = c // num_heads
    scale = d**-0.5
    q = L.linear(p["to_q"], fv).reshape(m, v, num_heads, d).transpose(0, 2, 1, 3)
    k = L.linear(p["to_k"], fe).reshape(m, e, num_heads, d).transpose(0, 2, 1, 3)
    vv = L.linear(p["to_v"], fe).reshape(m, e, num_heads, d).transpose(0, 2, 1, 3)
    logits = jax.lax.dot_general(q, k, (((3,), (3,)), ((0, 1), (0, 1)))) * scale
    probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(fv.dtype)
    out = jax.lax.dot_general(probs, vv, (((3,), (2,)), ((0, 1), (0, 1))))
    return L.linear(p["proj"], out.transpose(0, 2, 1, 3).reshape(m, v, c))


def _hoa(p: Params, state: Params, fv: jnp.ndarray, cfg: HDFormerConfig,
         adj: np.ndarray, train: bool, stride=1, residual=True, max_hop=2
         ) -> tuple[tuple[jnp.ndarray, jnp.ndarray], Params]:
    n, c, t, v = fv.shape
    new_state: Params = {}

    if not residual:
        res_v = 0.0
    elif "residual" in p:
        res_v = L.conv2d(p["residual"]["conv"], fv, stride=(stride, 1))
        res_v, new_state["residual_bn"] = L.batch_norm_2d(
            p["residual"]["bn"], state["residual_bn"], res_v, train)
    else:
        res_v = fv

    fvp, new_state["foa"] = _foa(p["foa"], state["foa"], fv, adj, train)
    fep_out = _edge_features(fvp)

    if cfg.attention:
        feps = [_edge_features(fvp).transpose(0, 2, 3, 1).reshape(n * t, -1, fvp.shape[1])]
        for hop_i in range(1, max_hop):
            parts = HOP_EDGES[hop_i + 1]
            cols = []
            for part_idx, part in enumerate(parts):
                diffs = jnp.stack(
                    [fvp[..., part[j + 1]] - fvp[..., part[j]]
                     for j in range(len(part) - 1)], axis=-1)  # (N,C,T,k)
                col = L.linear(p["hop_linears"][hop_i - 1][part_idx], diffs)
                cols.append(col[..., 0])  # (N,C,T)
            fep_hop = jnp.stack(cols, axis=-1)  # (N,C,T,P)
            feps.append(fep_hop.transpose(0, 2, 3, 1).reshape(n * t, -1, fvp.shape[1]))
        fep_concat = jnp.concatenate(feps, axis=-2)
        tokens = fvp.transpose(0, 2, 3, 1).reshape(n * t, v, -1)
        tokens = L.layer_norm(
            p["norm_v"], _cross_attention(p["attn"], tokens, fep_concat)) + tokens
        tokens = L.mlp_ln_residual(p["norm_mlp"], p["mlp"], tokens)
        fvp = tokens.reshape(n, t, v, -1).transpose(0, 3, 1, 2)

    # tcn: BN -> ReLU -> (9,1) conv stride -> BN (`block.py:288-301`)
    h, new_state["tcn_bn1"] = L.batch_norm_2d(p["tcn_bn1"], state["tcn_bn1"],
                                              fvp, train)
    h = jax.nn.relu(h)
    h = L.conv2d(p["tcn_conv"], h, stride=(stride, 1), padding=(4, 0))
    h, new_state["tcn_bn2"] = L.batch_norm_2d(p["tcn_bn2"], state["tcn_bn2"],
                                              h, train)
    out = jax.nn.relu(h + res_v)
    return (out, fep_out), new_state


def _interpolate_t(x: jnp.ndarray, factor: int, deterministic: bool) -> jnp.ndarray:
    """Upsample (N,C,T,V) along T by `factor` — nearest or bilinear
    (align_corners=False), matching `F.interpolate(scale_factor=(f,1))`."""
    n, c, t, v = x.shape
    if deterministic:
        return jnp.repeat(x, factor, axis=2)
    out_t = t * factor
    # torch bilinear, align_corners=False: src = (dst + 0.5)/f - 0.5
    src = (jnp.arange(out_t) + 0.5) / factor - 0.5
    lo = jnp.clip(jnp.floor(src), 0, t - 1).astype(jnp.int32)
    hi = jnp.clip(lo + 1, 0, t - 1)
    w_hi = jnp.clip(src - lo, 0.0, 1.0).astype(x.dtype)
    return (x[:, :, lo, :] * (1 - w_hi)[None, None, :, None]
            + x[:, :, hi, :] * w_hi[None, None, :, None])


# ------------------------------------------------------- full model


_DOWN_SPEC = [  # (plane_idx_in, plane_idx_out, stride, residual)
    (None, 0, 1, False), (0, 1, 2, True), (1, 1, 1, True), (1, 2, 2, True),
    (2, 2, 1, True), (2, 3, 2, True), (3, 3, 1, True), (3, 4, 2, True),
    (4, 4, 1, True),
]


class HDFormer:
    def __init__(self, cfg: HDFormerConfig | None = None, compute_dtype=jnp.float32):
        self.cfg = cfg or HDFormerConfig()
        self.adj = foa_adjacency(self.cfg.num_joints)

    def init(self, key: jax.Array) -> tuple[Params, Params]:
        cfg = self.cfg
        pl = cfg.planes
        keys = jax.random.split(key, 24)
        params: Params = {}
        state: Params = {}
        if cfg.data_bn:
            p, s = _bn_init(cfg.in_channels)
            params["data_bn"], state["data_bn"] = p, s
        down, down_s = [], []
        for i, (pi, po, stride, residual) in enumerate(_DOWN_SPEC):
            c_in = cfg.in_channels if pi is None else pl[pi]
            p, s = _hoa_init(keys[i], c_in, pl[po], cfg, stride, residual)
            down.append(p)
            down_s.append(s)
        up, up_s = [], []
        for i, (ci, co) in enumerate([(4, 3), (3, 2), (2, 1), (1, 0)]):
            p, s = _hoa_init(keys[9 + i], pl[ci], pl[co], cfg)
            up.append(p)
            up_s.append(s)
        merge, merge_s = [], []
        for i, ci in enumerate([4, 3, 2, 1]):
            p, s = _hoa_init(keys[13 + i], pl[ci], pl[0], cfg,
                             max_hop=cfg.max_hop)
            merge.append(p)
            merge_s.append(s)
        params.update(down=down, up=up, merge=merge)
        state.update(down=down_s, up=up_s, merge=merge_s)
        # vertex_model.Model head: Conv2d((3, num_v) window) — torch default init
        num_v = cfg.num_joints
        params["joint_regressor"] = L.conv2d_init(keys[20], pl[0],
                                                  3 * (num_v - 1), 3, num_v)
        params["input_adjust"] = L.linear_init(keys[21], cfg.n_frames, cfg.inner_frames)
        params["output_adjust"] = L.linear_init(keys[22], cfg.inner_frames, cfg.n_frames)
        return params, state

    def apply(self, params: Params, state: Params, x: jnp.ndarray,
              train: bool = False) -> tuple[jnp.ndarray, Params]:
        cfg = self.cfg
        x = x[..., : cfg.in_channels].astype(jnp.float32)
        new_state: Params = {}

        # (B,T,V,C) -> (B,C,V,T) -> frames 27->96 -> (B,C,T,V)
        xv = x.transpose(0, 3, 2, 1)
        xv = L.linear(params["input_adjust"], xv)
        xv = xv.transpose(0, 1, 3, 2)

        if cfg.data_bn:
            xv, new_state["data_bn"] = L.batch_norm_2d(
                params["data_bn"], state["data_bn"], xv, train)

        feature = []
        fv = xv
        new_state["down"] = []
        for i, (pi, po, stride, residual) in enumerate(_DOWN_SPEC):
            (fv, fe), s = _hoa(params["down"][i], state["down"][i], fv, cfg,
                               self.adj, train, stride, residual)
            new_state["down"].append(s)
            if i in (0, 2, 4, 6):
                feature.append((fv, fe))
        feature.append((fv, fe))
        feature = feature[::-1]

        fv, fe = feature[0]
        identity = feature[1:]
        ushape = [(fv, fe)]
        new_state["up"] = []
        for i in range(4):
            (fv, fe), s = _hoa(params["up"][i], state["up"][i], fv, cfg,
                               self.adj, train)
            new_state["up"].append(s)
            fv = _interpolate_t(fv, 2, cfg.deterministic)
            fv = fv + identity[i][0]
            ushape.append((fv, fe))

        ushape = ushape[:-1]
        new_state["merge"] = []
        for i in range(4):
            (fv2, fe2), s = _hoa(params["merge"][i], state["merge"][i],
                                 ushape[i][0], cfg, self.adj, train,
                                 max_hop=cfg.max_hop)
            new_state["merge"].append(s)
            fv = fv + _interpolate_t(fv2, 2 ** (4 - i), cfg.deterministic)

        # joint regressor: (3, V) window conv over (T, V) -> (B,3*(V-1),T,1)
        b = fv.shape[0]
        t = fv.shape[2]
        num_v = cfg.num_joints
        pred = L.conv2d(params["joint_regressor"], fv, padding=(1, 0))
        pred = pred.reshape(b, 3, num_v - 1, t).transpose(0, 1, 3, 2)  # (B,3,T,V-1)
        pred = jnp.concatenate(
            [jnp.zeros((b, 3, t, 1), pred.dtype), pred], axis=-1)
        pred = pred.transpose(0, 1, 3, 2)  # (B,3,V,T)
        pred = L.linear(params["output_adjust"], pred)  # frames 96->27
        pred = pred.transpose(0, 3, 2, 1)  # (B,T,V,3)
        return pred.astype(jnp.float32), new_state

    def parameter_count(self, params: Params) -> int:
        return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


@register_model("HDFormer")
def _build(config):
    cfg = HDFormerConfig(n_frames=config.n_frames, num_joints=config.num_joints)
    return HDFormer(cfg)
