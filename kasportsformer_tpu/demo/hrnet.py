"""PoseHighResolutionNet (HRNet-W48) in JAX — the demo's 2D pose estimator
(≙ `demo/lib/hrnet/lib/models/pose_hrnet.py`).

Stem (two stride-2 3x3 convs) -> 4 Bottlenecks -> three multi-resolution
stages of BasicBlock branches with full cross-resolution fusion (1x1 conv +
nearest x2^k upsampling downward, chains of stride-2 3x3 convs upward) ->
1x1 head to 17 heatmaps at 1/4 resolution.

Unlike the reference's per-frame CUDA calls (`gen_kpts.py:150-160`), the JAX
forward is batched over person patches AND frames in one jit. Weights load
from the released `pose_hrnet_w48_384x288.pth` via
`hrnet_state_dict_to_params`.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from kasportsformer_tpu.models import layers as L

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class HRNetConfig:
    """Stage layout; defaults = w48_384x288 (`experiments/w48_384x288_...yaml`)."""

    num_joints: int = 17
    stem_channels: int = 64
    stage2: tuple = (1, 2, (4, 4), (48, 96))  # modules, branches, blocks, chans
    stage3: tuple = (4, 3, (4, 4, 4), (48, 96, 192))
    stage4: tuple = (3, 4, (4, 4, 4, 4), (48, 96, 192, 384))
    image_size: tuple = (288, 384)  # (W, H)


def hrnet_config_from_yaml(path: str) -> HRNetConfig:
    """Load a reference yacs experiment file (e.g.
    `demo/lib/hrnet/experiments/w48_384x288_adam_lr1e-3.yaml`) into an
    HRNetConfig — the typed replacement for the reference's second config
    system (`demo/lib/hrnet/lib/config/default.py:1-160`). Only the keys
    that shape the network are read; trainer-side yacs keys are ignored."""
    import yaml

    with open(path) as f:
        raw = yaml.safe_load(f)
    model = raw.get("MODEL", {})
    extra = model.get("EXTRA", {})

    def stage(name):
        sd = extra.get(name)
        if sd is None:
            raise ValueError(f"{path}: MODEL.EXTRA.{name} missing")
        block = str(sd.get("BLOCK", "BASIC")).upper()
        if block != "BASIC":
            raise NotImplementedError(
                f"{path}: MODEL.EXTRA.{name}.BLOCK={block!r} — stages 2-4 "
                "use BasicBlock in every released HRNet pose config")
        return (int(sd["NUM_MODULES"]), int(sd["NUM_BRANCHES"]),
                tuple(int(b) for b in sd["NUM_BLOCKS"]),
                tuple(int(c) for c in sd["NUM_CHANNELS"]))

    return HRNetConfig(
        num_joints=int(model.get("NUM_JOINTS", 17)),
        stage2=stage("STAGE2"),
        stage3=stage("STAGE3"),
        stage4=stage("STAGE4"),
        image_size=tuple(int(v) for v in model.get("IMAGE_SIZE", (288, 384))),
    )


def _conv_bn_init(key, c_in, c_out, k, bias=False):
    kc, _ = jax.random.split(key)
    p = {"conv": L.conv2d_init(kc, c_in, c_out, k, k, bias=bias)}
    bn_p, bn_s = L._bn_init(c_out)
    p["bn"] = bn_p
    return p, {"bn": bn_s}


def _conv_bn(p, s, x, train, stride=1, pad=0, relu=False):
    y = L.conv2d(p["conv"], x, stride=(stride, stride), padding=(pad, pad))
    y, ns = L.batch_norm_2d(p["bn"], s["bn"], y, train)
    if relu:
        y = jax.nn.relu(y)
    return y, {"bn": ns}


def _basic_init(key, c_in, c_out, stride=1):
    k1, k2, k3 = jax.random.split(key, 3)
    p1, s1 = _conv_bn_init(k1, c_in, c_out, 3)
    p2, s2 = _conv_bn_init(k2, c_out, c_out, 3)
    p = {"c1": p1, "c2": p2}
    s = {"c1": s1, "c2": s2}
    if stride != 1 or c_in != c_out:
        pd, sd = _conv_bn_init(k3, c_in, c_out, 1)
        p["down"], s["down"] = pd, sd
    return p, s


def _basic(p, s, x, train, stride=1):
    ns = {}
    out, ns["c1"] = _conv_bn(p["c1"], s["c1"], x, train, stride, 1, relu=True)
    out, ns["c2"] = _conv_bn(p["c2"], s["c2"], out, train, 1, 1)
    if "down" in p:
        res, ns["down"] = _conv_bn(p["down"], s["down"], x, train, stride, 0)
    else:
        res = x
    return jax.nn.relu(out + res), ns


def _bottleneck_init(key, c_in, planes, stride=1, expansion=4):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    p1, s1 = _conv_bn_init(k1, c_in, planes, 1)
    p2, s2 = _conv_bn_init(k2, planes, planes, 3)
    p3, s3 = _conv_bn_init(k3, planes, planes * expansion, 1)
    p = {"c1": p1, "c2": p2, "c3": p3}
    s = {"c1": s1, "c2": s2, "c3": s3}
    if stride != 1 or c_in != planes * expansion:
        pd, sd = _conv_bn_init(k4, c_in, planes * expansion, 1)
        p["down"], s["down"] = pd, sd
    return p, s


def _bottleneck(p, s, x, train, stride=1):
    ns = {}
    out, ns["c1"] = _conv_bn(p["c1"], s["c1"], x, train, 1, 0, relu=True)
    out, ns["c2"] = _conv_bn(p["c2"], s["c2"], out, train, stride, 1, relu=True)
    out, ns["c3"] = _conv_bn(p["c3"], s["c3"], out, train, 1, 0)
    if "down" in p:
        res, ns["down"] = _conv_bn(p["down"], s["down"], x, train, stride, 0)
    else:
        res = x
    return jax.nn.relu(out + res), ns


def _upsample2k(x, k):
    """Nearest-neighbor x2^k on (N,C,H,W)."""
    f = 2**k
    return jnp.repeat(jnp.repeat(x, f, axis=2), f, axis=3)


class HRNet:
    def __init__(self, cfg: HRNetConfig | None = None):
        self.cfg = cfg or HRNetConfig()

    # ---------------------------------------------------------------- init
    def init(self, key: jax.Array) -> tuple[Params, Params]:
        cfg = self.cfg
        keys = jax.random.split(key, 12)
        params: Params = {}
        state: Params = {}
        params["stem1"], state["stem1"] = _conv_bn_init(keys[0], 3, 64, 3)
        params["stem2"], state["stem2"] = _conv_bn_init(keys[1], 64, 64, 3)
        # layer1: 4 bottlenecks 64 -> 256
        l1p, l1s = [], []
        c_in = 64
        for i, k in enumerate(jax.random.split(keys[2], 4)):
            p, s = _bottleneck_init(k, c_in, 64)
            l1p.append(p)
            l1s.append(s)
            c_in = 256
        params["layer1"], state["layer1"] = l1p, l1s

        pre = [256]
        for si, (name, spec, kk) in enumerate(
                (("stage2", cfg.stage2, keys[3]),
                 ("stage3", cfg.stage3, keys[4]),
                 ("stage4", cfg.stage4, keys[5]))):
            n_modules, n_branches, n_blocks, chans = spec
            tkeys = jax.random.split(kk, n_branches + n_modules)
            # transition
            trans_p, trans_s = [], []
            for i in range(n_branches):
                if i < len(pre):
                    if chans[i] != pre[i]:
                        p, s = _conv_bn_init(tkeys[i], pre[i], chans[i], 3)
                        trans_p.append(p)
                        trans_s.append(s)
                    else:
                        trans_p.append(None)
                        trans_s.append(None)
                else:
                    seq_p, seq_s = [], []
                    for j in range(i + 1 - len(pre)):
                        c_in_t = pre[-1]
                        c_out_t = chans[i] if j == i - len(pre) else c_in_t
                        p, s = _conv_bn_init(jax.random.fold_in(tkeys[i], j),
                                             c_in_t, c_out_t, 3)
                        seq_p.append(p)
                        seq_s.append(s)
                    trans_p.append(seq_p)
                    trans_s.append(seq_s)
            params[f"transition{si + 1}"] = trans_p
            state[f"transition{si + 1}"] = trans_s
            # modules
            mods_p, mods_s = [], []
            for m in range(n_modules):
                multi_out = not (name == "stage4" and m == n_modules - 1)
                mp, ms = self._module_init(tkeys[n_branches + m], n_branches,
                                           n_blocks, chans, multi_out)
                mods_p.append(mp)
                mods_s.append(ms)
            params[name] = mods_p
            state[name] = mods_s
            pre = list(chans)

        params["final"] = L.conv2d_init(keys[6], cfg.stage4[3][0],
                                        cfg.num_joints, 1, 1, bias=True)
        return params, state

    def _module_init(self, key, n_branches, n_blocks, chans, multi_out):
        keys = jax.random.split(key, n_branches + n_branches * n_branches)
        branches_p, branches_s = [], []
        for b in range(n_branches):
            blocks_p, blocks_s = [], []
            for i, k in enumerate(jax.random.split(keys[b], n_blocks[b])):
                p, s = _basic_init(k, chans[b], chans[b])
                blocks_p.append(p)
                blocks_s.append(s)
            branches_p.append(blocks_p)
            branches_s.append(blocks_s)
        fuse_p: list = []
        fuse_s: list = []
        n_out = n_branches if multi_out else 1
        for i in range(n_out):
            row_p, row_s = [], []
            for j in range(n_branches):
                k = keys[n_branches + i * n_branches + j]
                if j > i:
                    p, s = _conv_bn_init(k, chans[j], chans[i], 1)
                elif j == i:
                    p, s = None, None
                else:
                    p, s = [], []
                    for step in range(i - j):
                        c_out = chans[i] if step == i - j - 1 else chans[j]
                        pp, ss = _conv_bn_init(jax.random.fold_in(k, step),
                                               chans[j], c_out, 3)
                        p.append(pp)
                        s.append(ss)
                row_p.append(p)
                row_s.append(s)
            fuse_p.append(row_p)
            fuse_s.append(row_s)
        return ({"branches": branches_p, "fuse": fuse_p},
                {"branches": branches_s, "fuse": fuse_s})

    # --------------------------------------------------------------- apply
    def apply(self, params: Params, state: Params, x: jnp.ndarray,
              train: bool = False) -> tuple[jnp.ndarray, Params]:
        """x: (N, 3, H, W) normalized RGB -> (N, 17, H/4, W/4) heatmaps."""
        cfg = self.cfg
        ns: Params = {}
        x, ns["stem1"] = _conv_bn(params["stem1"], state["stem1"], x, train,
                                  2, 1, relu=True)
        x, ns["stem2"] = _conv_bn(params["stem2"], state["stem2"], x, train,
                                  2, 1, relu=True)
        ns["layer1"] = []
        for p, s in zip(params["layer1"], state["layer1"]):
            x, bs = _bottleneck(p, s, x, train)
            ns["layer1"].append(bs)

        streams = [x]
        for si, spec in enumerate((cfg.stage2, cfg.stage3, cfg.stage4)):
            n_modules, n_branches, n_blocks, chans = spec
            tname = f"transition{si + 1}"
            new_streams = []
            ns[tname] = []
            for i in range(n_branches):
                tp = params[tname][i]
                tsdict = state[tname][i]
                if tp is None:
                    new_streams.append(streams[i])
                    ns[tname].append(None)
                elif isinstance(tp, list):  # downsample chain from last stream
                    h = streams[-1]
                    seq_ns = []
                    for pp, ss in zip(tp, tsdict):
                        h, s2 = _conv_bn(pp, ss, h, train, 2, 1, relu=True)
                        seq_ns.append(s2)
                    new_streams.append(h)
                    ns[tname].append(seq_ns)
                else:
                    h, s2 = _conv_bn(tp, tsdict, streams[i], train, 1, 1,
                                     relu=True)
                    new_streams.append(h)
                    ns[tname].append(s2)
            streams = new_streams
            sname = f"stage{si + 2}"
            ns[sname] = []
            for mp, ms in zip(params[sname], state[sname]):
                streams, mns = self._module_apply(mp, ms, streams, train)
                ns[sname].append(mns)

        out = L.conv2d(params["final"], streams[0])
        return out, ns

    def _module_apply(self, p, s, streams, train):
        ns = {"branches": [], "fuse": []}
        outs = []
        for b, (blocks_p, blocks_s) in enumerate(zip(p["branches"], s["branches"])):
            h = streams[b]
            bns = []
            for bp, bs in zip(blocks_p, blocks_s):
                h, b2 = _basic(bp, bs, h, train)
                bns.append(b2)
            outs.append(h)
            ns["branches"].append(bns)
        fused = []
        for i, (row_p, row_s) in enumerate(zip(p["fuse"], s["fuse"])):
            y = None
            row_ns = []
            for j in range(len(outs)):
                fp, fs = row_p[j], row_s[j]
                if fp is None:
                    z = outs[j]
                    row_ns.append(None)
                elif isinstance(fp, list):  # downsample chain (j < i)
                    z = outs[j]
                    seq_ns = []
                    for step, (pp, ss) in enumerate(zip(fp, fs)):
                        last = step == len(fp) - 1
                        z, s2 = _conv_bn(pp, ss, z, train, 2, 1, relu=not last)
                        seq_ns.append(s2)
                    row_ns.append(seq_ns)
                else:  # 1x1 conv + BN + upsample (j > i)
                    z, s2 = _conv_bn(fp, fs, outs[j], train, 1, 0)
                    z = _upsample2k(z, j - i)
                    row_ns.append(s2)
                y = z if y is None else y + z
            fused.append(jax.nn.relu(y))
            ns["fuse"].append(row_ns)
        return fused, ns

    def parameter_count(self, params: Params) -> int:
        return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def hrnet_state_dict_to_params(state_dict: dict[str, Any],
                               cfg: HRNetConfig | None = None
                               ) -> tuple[Params, Params]:
    """Reference pose_hrnet state_dict (optionally 'module.'/'model.'-prefixed,
    cf. `gen_kpts.py:80-90`) -> (params, state)."""
    cfg = cfg or HRNetConfig()
    sd = {}
    for k, v in state_dict.items():
        for prefix in ("module.", "model."):
            if k.startswith(prefix):
                k = k[len(prefix):]
        sd[k] = v

    def np_(t):
        return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)

    def conv_bn(conv_name, bn_name, bias=False):
        p = {"conv": {"w": jnp.asarray(np_(sd[f"{conv_name}.weight"]))},
             "bn": {"scale": jnp.asarray(np_(sd[f"{bn_name}.weight"])),
                    "bias": jnp.asarray(np_(sd[f"{bn_name}.bias"]))}}
        if bias and f"{conv_name}.bias" in sd:
            p["conv"]["b"] = jnp.asarray(np_(sd[f"{conv_name}.bias"]))
        s = {"bn": {"mean": jnp.asarray(np_(sd[f"{bn_name}.running_mean"])),
                    "var": jnp.asarray(np_(sd[f"{bn_name}.running_var"]))}}
        return p, s

    params: Params = {}
    state: Params = {}
    params["stem1"], state["stem1"] = conv_bn("conv1", "bn1")
    params["stem2"], state["stem2"] = conv_bn("conv2", "bn2")

    l1p, l1s = [], []
    for i in range(4):
        base = f"layer1.{i}"
        p = {}
        s = {}
        for idx in (1, 2, 3):
            p[f"c{idx}"], s[f"c{idx}"] = conv_bn(f"{base}.conv{idx}",
                                                 f"{base}.bn{idx}")
        if f"{base}.downsample.0.weight" in sd:
            p["down"], s["down"] = conv_bn(f"{base}.downsample.0",
                                           f"{base}.downsample.1")
        l1p.append(p)
        l1s.append(s)
    params["layer1"], state["layer1"] = l1p, l1s

    pre = [256]
    for si, spec in enumerate((cfg.stage2, cfg.stage3, cfg.stage4)):
        n_modules, n_branches, n_blocks, chans = spec
        tname = f"transition{si + 1}"
        trans_p, trans_s = [], []
        for i in range(n_branches):
            if i < len(pre):
                if f"{tname}.{i}.0.weight" in sd:
                    p, s = conv_bn(f"{tname}.{i}.0", f"{tname}.{i}.1")
                    trans_p.append(p)
                    trans_s.append(s)
                else:
                    trans_p.append(None)
                    trans_s.append(None)
            else:
                seq_p, seq_s = [], []
                j = 0
                while f"{tname}.{i}.{j}.0.weight" in sd:
                    p, s = conv_bn(f"{tname}.{i}.{j}.0", f"{tname}.{i}.{j}.1")
                    seq_p.append(p)
                    seq_s.append(s)
                    j += 1
                trans_p.append(seq_p)
                trans_s.append(seq_s)
        params[tname], state[tname] = trans_p, trans_s

        sname = f"stage{si + 2}"
        mods_p, mods_s = [], []
        for m in range(n_modules):
            mbase = f"{sname}.{m}"
            branches_p, branches_s = [], []
            for b in range(n_branches):
                blocks_p, blocks_s = [], []
                for blk in range(n_blocks[b]):
                    base = f"{mbase}.branches.{b}.{blk}"
                    p = {}
                    s = {}
                    for idx in (1, 2):
                        p[f"c{idx}"], s[f"c{idx}"] = conv_bn(
                            f"{base}.conv{idx}", f"{base}.bn{idx}")
                    if f"{base}.downsample.0.weight" in sd:
                        p["down"], s["down"] = conv_bn(
                            f"{base}.downsample.0", f"{base}.downsample.1")
                    blocks_p.append(p)
                    blocks_s.append(s)
                branches_p.append(blocks_p)
                branches_s.append(blocks_s)
            multi_out = not (sname == "stage4" and m == n_modules - 1)
            n_out = n_branches if multi_out else 1
            fuse_p, fuse_s = [], []
            for i in range(n_out):
                row_p, row_s = [], []
                for j in range(n_branches):
                    fbase = f"{mbase}.fuse_layers.{i}.{j}"
                    if j == i:
                        row_p.append(None)
                        row_s.append(None)
                    elif j > i:
                        p, s = conv_bn(f"{fbase}.0", f"{fbase}.1")
                        row_p.append(p)
                        row_s.append(s)
                    else:
                        seq_p, seq_s = [], []
                        for step in range(i - j):
                            p, s = conv_bn(f"{fbase}.{step}.0",
                                           f"{fbase}.{step}.1")
                            seq_p.append(p)
                            seq_s.append(s)
                        row_p.append(seq_p)
                        row_s.append(seq_s)
                fuse_p.append(row_p)
                fuse_s.append(row_s)
            mods_p.append({"branches": branches_p, "fuse": fuse_p})
            mods_s.append({"branches": branches_s, "fuse": fuse_s})
        params[sname], state[sname] = mods_p, mods_s
        pre = list(chans)

    params["final"] = {"w": jnp.asarray(np_(sd["final_layer.weight"])),
                       "b": jnp.asarray(np_(sd["final_layer.bias"]))}
    return params, state
