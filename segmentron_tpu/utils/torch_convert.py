"""torch <-> jax weight conversion primitives.

Needed for (a) importing ImageNet-pretrained backbone checkpoints saved
by torch, and (b) the parity-fixture tests that validate our modules
against torch-CPU oracles (SURVEY.md §4). Layout conventions:

- torch Conv2d weight: (O, I/groups, kH, kW)   [OIHW]
- flax  Conv kernel:   (kH, kW, I/groups, O)   [HWIO]
- torch depthwise (groups=C): (C*mult, 1, kH, kW) -> flax (kH, kW, 1, C*mult)
  via the same OIHW->HWIO transpose (flax ``feature_group_count=C``).
- torch Linear: (O, I) -> flax Dense kernel (I, O).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

__all__ = [
    "t2j_conv_kernel",
    "t2j_dense_kernel",
    "t2j_bn",
    "load_torch_state_dict",
    "convert_resnet_state",
    "convert_mobilenet_state",
    "convert_hrnet_state",
    "convert_generic_state",
    "resnet_state_from_flax",
    "load_backbone_pretrained",
    "convert_backbone_state",
    "save_flax_npz",
    "load_flax_npz",
]


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def t2j_conv_kernel(weight) -> np.ndarray:
    """OIHW -> HWIO."""
    return _np(weight).transpose(2, 3, 1, 0)


def t2j_dense_kernel(weight) -> np.ndarray:
    """(O, I) -> (I, O)."""
    return _np(weight).transpose(1, 0)


def t2j_bn(bn_module) -> Dict[str, Dict[str, np.ndarray]]:
    """torch BatchNorm2d -> flax {'params': {scale,bias}, 'batch_stats': {mean,var}}."""
    return {
        "params": {"scale": _np(bn_module.weight), "bias": _np(bn_module.bias)},
        "batch_stats": {
            "mean": _np(bn_module.running_mean),
            "var": _np(bn_module.running_var),
        },
    }


def load_torch_state_dict(path: str) -> Dict[str, Any]:
    """Load a torch checkpoint file into numpy arrays (no torch tensors leak)."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    return {k: _np(v) for k, v in state.items() if hasattr(v, "detach")}


def _bn_entries(state, prefix: str):
    """(params, batch_stats) dicts for a torch BN at ``prefix``."""
    params = {"scale": _np(state[prefix + ".weight"]), "bias": _np(state[prefix + ".bias"])}
    stats = {
        "mean": _np(state[prefix + ".running_mean"]),
        "var": _np(state[prefix + ".running_var"]),
    }
    return params, stats


def convert_resnet_state(state: Dict[str, np.ndarray], layers) -> Dict[str, Any]:
    """Map a torchvision-style ResNet ``state_dict`` onto our flax
    backbone tree (scopes: conv1/bn1 stem, ``layer{i}_{b}`` blocks with
    conv{j}/bn{j} and downsample_conv/downsample_bn).

    Returns ``{"params": ..., "batch_stats": ...}`` pytrees to merge
    under the model's "backbone" scope. The classifier fc is dropped.
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put(scope, sub, p, s):
        params.setdefault(scope, {})[sub] = p
        if s is not None:
            stats.setdefault(scope, {})[sub] = s

    params["conv1"] = {"kernel": t2j_conv_kernel(state["conv1.weight"])}
    p, s = _bn_entries(state, "bn1")
    params["bn1"] = p
    stats["bn1"] = s

    bottleneck = any(k.startswith("layer1.0.conv3") for k in state)
    n_convs = 3 if bottleneck else 2
    for li, n_blocks in enumerate(layers, start=1):
        for b in range(n_blocks):
            scope = f"layer{li}_{b}"
            tp = f"layer{li}.{b}"
            params[scope] = {}
            stats[scope] = {}
            for j in range(1, n_convs + 1):
                params[scope][f"conv{j}"] = {
                    "kernel": t2j_conv_kernel(state[f"{tp}.conv{j}.weight"])
                }
                bp, bs = _bn_entries(state, f"{tp}.bn{j}")
                params[scope][f"bn{j}"] = bp
                stats[scope][f"bn{j}"] = bs
            if f"{tp}.downsample.0.weight" in state:
                params[scope]["downsample_conv"] = {
                    "kernel": t2j_conv_kernel(state[f"{tp}.downsample.0.weight"])
                }
                bp, bs = _bn_entries(state, f"{tp}.downsample.1")
                params[scope]["downsample_bn"] = bp
                stats[scope]["downsample_bn"] = bs
    return {"params": params, "batch_stats": stats}


def resnet_state_from_flax(params, batch_stats) -> Dict[str, np.ndarray]:
    """Inverse of :func:`convert_resnet_state`: flax backbone pytrees ->
    a torchvision-named state_dict (HWIO -> OIHW), for users moving
    checkpoints back to the torch reference."""
    state: Dict[str, np.ndarray] = {}

    def put_bn(tname, scope):
        state[tname + ".weight"] = np.asarray(params[scope]["scale"])
        state[tname + ".bias"] = np.asarray(params[scope]["bias"])
        state[tname + ".running_mean"] = np.asarray(batch_stats[scope]["mean"])
        state[tname + ".running_var"] = np.asarray(batch_stats[scope]["var"])

    state["conv1.weight"] = np.asarray(params["conv1"]["kernel"]).transpose(
        3, 2, 0, 1
    )
    put_bn("bn1", "bn1")
    for scope in sorted(k for k in params if k.startswith("layer")):
        li, b = scope[5:].split("_")
        tp = f"layer{li}.{b}"
        sub = params[scope]
        for name in sub:
            if name.startswith("conv"):
                state[f"{tp}.{name}.weight"] = np.asarray(
                    sub[name]["kernel"]
                ).transpose(3, 2, 0, 1)
            elif name.startswith("bn"):
                state[f"{tp}.{name}.weight"] = np.asarray(sub[name]["scale"])
                state[f"{tp}.{name}.bias"] = np.asarray(sub[name]["bias"])
                state[f"{tp}.{name}.running_mean"] = np.asarray(
                    batch_stats[scope][name]["mean"]
                )
                state[f"{tp}.{name}.running_var"] = np.asarray(
                    batch_stats[scope][name]["var"]
                )
            elif name == "downsample_conv":
                state[f"{tp}.downsample.0.weight"] = np.asarray(
                    sub[name]["kernel"]
                ).transpose(3, 2, 0, 1)
            elif name == "downsample_bn":
                state[f"{tp}.downsample.1.weight"] = np.asarray(sub[name]["scale"])
                state[f"{tp}.downsample.1.bias"] = np.asarray(sub[name]["bias"])
                state[f"{tp}.downsample.1.running_mean"] = np.asarray(
                    batch_stats[scope][name]["mean"]
                )
                state[f"{tp}.downsample.1.running_var"] = np.asarray(
                    batch_stats[scope][name]["var"]
                )
    return state


# MobileNetV2 inverted-residual plan: (expand_ratio, repeats) per stage —
# must match backbones/mobilenet._SETTINGS.
_MBV2_PLAN = ((1, 1), (6, 2), (6, 3), (6, 4), (6, 3), (6, 3), (6, 1))


def convert_mobilenet_state(state: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Map a torchvision MobileNetV2 ``state_dict`` onto the flax
    backbone tree (scopes: stem{conv,bn}, block{si}_{bi}{expand,
    depthwise, project, project_bn}). The classifier head and the final
    1280-ch conv (features.18) are dropped — the seg backbone ends at
    the 320-ch stage."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    # stem: features.0.{0,1}
    params["stem"] = {
        "conv": {"kernel": t2j_conv_kernel(state["features.0.0.weight"])},
    }
    p, s = _bn_entries(state, "features.0.1")
    params["stem"]["bn"] = p
    stats["stem"] = {"bn": s}

    feat_idx = 1
    for si, (t, n) in enumerate(_MBV2_PLAN):
        for bi in range(n):
            scope = f"block{si}_{bi}"
            tp = f"features.{feat_idx}.conv"
            feat_idx += 1
            params[scope] = {}
            stats[scope] = {}
            if t != 1:
                params[scope]["expand"] = {
                    "conv": {
                        "kernel": t2j_conv_kernel(state[f"{tp}.0.0.weight"])
                    },
                }
                bp, bs = _bn_entries(state, f"{tp}.0.1")
                params[scope]["expand"]["bn"] = bp
                stats[scope]["expand"] = {"bn": bs}
                dw = f"{tp}.1"
                proj_conv, proj_bn = f"{tp}.2", f"{tp}.3"
            else:
                dw = f"{tp}.0"
                proj_conv, proj_bn = f"{tp}.1", f"{tp}.2"
            params[scope]["depthwise"] = {
                "conv": {"kernel": t2j_conv_kernel(state[dw + ".0.weight"])},
            }
            bp, bs = _bn_entries(state, dw + ".1")
            params[scope]["depthwise"]["bn"] = bp
            stats[scope]["depthwise"] = {"bn": bs}
            params[scope]["project"] = {
                "kernel": t2j_conv_kernel(state[proj_conv + ".weight"])
            }
            bp, bs = _bn_entries(state, proj_bn)
            params[scope]["project_bn"] = bp
            stats[scope]["project_bn"] = bs
    return {"params": params, "batch_stats": stats}


def convert_hrnet_state(state: Dict[str, np.ndarray], spec: dict) -> Dict[str, Any]:
    """Map an official HRNet-Image-Classification ``state_dict`` onto the
    flax backbone tree (scopes: stem1/stem2, layer1_{k},
    transition{s}_{b}, stage{s}_module{m}.{branch{b}_block{k},
    fuse{i}_{j}[_down{k}]_{conv,bn}}). The classifier head (incre/
    downsamp/final/classifier modules) is dropped."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put_cbr(scope, conv_key, bn_key):
        p, s = _bn_entries(state, bn_key)
        params[scope] = {
            "conv": {"kernel": t2j_conv_kernel(state[conv_key + ".weight"])},
            "bn": p,
        }
        stats[scope] = {"bn": s}

    def block_tree(tp, n_convs):
        bp: Dict[str, Any] = {}
        bs: Dict[str, Any] = {}
        for j in range(1, n_convs + 1):
            bp[f"conv{j}"] = {"kernel": t2j_conv_kernel(state[f"{tp}.conv{j}.weight"])}
            p, s = _bn_entries(state, f"{tp}.bn{j}")
            bp[f"bn{j}"] = p
            bs[f"bn{j}"] = s
        if f"{tp}.downsample.0.weight" in state:
            bp["downsample_conv"] = {
                "kernel": t2j_conv_kernel(state[f"{tp}.downsample.0.weight"])
            }
            p, s = _bn_entries(state, f"{tp}.downsample.1")
            bp["downsample_bn"] = p
            bs["downsample_bn"] = s
        return bp, bs

    put_cbr("stem1", "conv1", "bn1")
    put_cbr("stem2", "conv2", "bn2")

    # stage 1: single bottleneck branch
    _, _, blk1, n_blocks1, _ = spec["stage1"]
    n_convs1 = 3 if blk1 == "BOTTLENECK" else 2
    for k in range(n_blocks1[0]):
        bp, bs = block_tree(f"layer1.{k}", n_convs1)
        params[f"layer1_{k}"] = bp
        stats[f"layer1_{k}"] = bs

    prev_branches = 1
    for sidx, key in enumerate(("stage2", "stage3", "stage4"), start=2):
        n_mod, n_br, blk, n_blocks, _ = spec[key]
        n_convs = 3 if blk == "BOTTLENECK" else 2
        ttp = f"transition{sidx - 1}"
        for b in range(n_br):
            scope = f"transition{sidx}_{b}"
            if b < prev_branches:
                conv_key = f"{ttp}.{b}.0"
                bn_key = f"{ttp}.{b}.1"
                if conv_key + ".weight" not in state:
                    continue  # identity transition (channels matched)
            else:
                # new branch: nested Sequential
                conv_key = f"{ttp}.{b}.0.0"
                bn_key = f"{ttp}.{b}.0.1"
            put_cbr(scope, conv_key, bn_key)
        prev_branches = n_br

        for m in range(n_mod):
            mtp = f"{key}.{m}"
            mscope = f"{key}_module{m}"
            mp: Dict[str, Any] = {}
            ms: Dict[str, Any] = {}
            for b in range(n_br):
                for k in range(n_blocks[b]):
                    bp, bs = block_tree(f"{mtp}.branches.{b}.{k}", n_convs)
                    mp[f"branch{b}_block{k}"] = bp
                    ms[f"branch{b}_block{k}"] = bs
            for i in range(n_br):
                for j in range(n_br):
                    if j > i:
                        ck = f"{mtp}.fuse_layers.{i}.{j}.0"
                        bk = f"{mtp}.fuse_layers.{i}.{j}.1"
                        if ck + ".weight" not in state:
                            continue
                        mp[f"fuse{i}_{j}_conv"] = {
                            "kernel": t2j_conv_kernel(state[ck + ".weight"])
                        }
                        p, s = _bn_entries(state, bk)
                        mp[f"fuse{i}_{j}_bn"] = p
                        ms[f"fuse{i}_{j}_bn"] = s
                    elif j < i:
                        for k in range(i - j):
                            ck = f"{mtp}.fuse_layers.{i}.{j}.{k}.0"
                            bk = f"{mtp}.fuse_layers.{i}.{j}.{k}.1"
                            if ck + ".weight" not in state:
                                continue
                            mp[f"fuse{i}_{j}_down{k}_conv"] = {
                                "kernel": t2j_conv_kernel(state[ck + ".weight"])
                            }
                            p, s = _bn_entries(state, bk)
                            mp[f"fuse{i}_{j}_down{k}_bn"] = p
                            ms[f"fuse{i}_{j}_down{k}_bn"] = s
            params[mscope] = mp
            stats[mscope] = ms
    return {"params": params, "batch_stats": stats}


def convert_generic_state(state: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Dot-named torch ``state_dict`` -> flax ``{params, batch_stats}``
    pytrees, for any torch module hierarchy whose submodule names equal
    the flax scope names (our parity replicas in ``tests/torch_refs.py``
    and the canonical ``tools/convert_weights.py`` layout; used for the
    Xception-65/71 import, whose upstream .pth naming could not be
    verified against the empty reference mount — the key mapping below
    is the single place to adapt if it differs).

    Per-leaf rules (unambiguous by tensor rank):
    - ``*.weight`` 4-D -> ``kernel`` (OIHW -> HWIO)
    - ``*.weight`` 2-D -> ``kernel`` (O,I -> I,O)
    - ``*.weight`` 1-D -> ``scale`` (a norm layer)
    - ``*.bias``        -> ``bias`` (conv, dense and norm alike)
    - ``*.running_mean/var`` -> batch_stats ``mean``/``var``
    - ``*.num_batches_tracked`` -> dropped
    - 0-d tensors -> param under the torch leaf name (attention gamma)
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put(tree, path, leaf, value):
        node = tree
        for part in path:
            node = node.setdefault(part, {})
        node[leaf] = value

    for key, value in state.items():
        path = key.split(".")
        scope, leaf = path[:-1], path[-1]
        v = _np(value)
        if leaf == "num_batches_tracked":
            continue
        if leaf == "running_mean":
            put(stats, scope, "mean", v)
        elif leaf == "running_var":
            put(stats, scope, "var", v)
        elif leaf == "weight":
            if v.ndim == 4:
                put(params, scope, "kernel", t2j_conv_kernel(v))
            elif v.ndim == 2:
                put(params, scope, "kernel", t2j_dense_kernel(v))
            else:
                put(params, scope, "scale", v)
        elif leaf == "bias":
            put(params, scope, "bias", v)
        elif v.ndim == 0:
            # scalar params keep their own name (DANet/OCNet attention
            # ``gamma`` residual weights; flax declares them 0-d too)
            put(params, scope, leaf, v)
        elif leaf in ("codewords", "scale") or leaf.endswith("prelu"):
            # Verbatim-copy leaves that flax declares under the same
            # names/layouts: EncNet's context-encoding codebook
            # ((K, C) ``codewords`` / (K,) ``scale``) and the bare
            # per-channel PReLU slopes of CGNet/EESPNet (``prelu``,
            # ``hff_prelu``, ``out_prelu``, ``merge_prelu``)
            put(params, scope, leaf, v)
        else:
            raise ValueError(f"Unrecognized state_dict leaf: {key!r}")
    return {"params": params, "batch_stats": stats}


_RESNET_LAYERS = {
    "resnet18": (2, 2, 2, 2),
    "resnet34": (3, 4, 6, 3),
    "resnet50": (3, 4, 6, 3),
    "resnet101": (3, 4, 23, 3),
    "resnet152": (3, 8, 36, 3),
}


def save_flax_npz(tree: Dict[str, Any], path: str) -> None:
    """Save a ``{"params": ..., "batch_stats": ...}`` pytree as a flat
    ``.npz`` (keys ``params/scope/.../leaf``) — the portable output
    format of ``tools/convert_weights.py``."""
    flat: Dict[str, np.ndarray] = {}

    def walk(node, prefix):
        for k, v in node.items():
            p = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                walk(v, p)
            else:
                flat[p] = np.asarray(v)

    walk(tree, "")
    np.savez_compressed(path, **flat)


def load_flax_npz(path: str) -> Dict[str, Any]:
    """Inverse of :func:`save_flax_npz`."""
    tree: Dict[str, Any] = {}
    with np.load(path) as data:
        for key in data.files:
            node = tree
            parts = key.split("/")
            for part in parts[:-1]:
                node = node.setdefault(part, {})
            node[parts[-1]] = data[key]
    return tree


def convert_xception_official_state(
    state: Dict[str, np.ndarray],
) -> Dict[str, Any]:
    """Aligned-Xception ``state_dict`` in the common DeepLab-torch
    naming (reference ``segmentron/models/backbones/xception.py`` [M —
    mount empty; modeled on the public aligned-Xception layout that
    family of repos shares]) -> our flax tree:

    - stem: ``conv1/bn1``, ``conv2/bn2`` -> ``conv{1,2}/{conv,bn}``
    - ``blockN.rep`` Sequential of [ReLU, SeparableConv2d(conv1=dw,
      bn, pointwise), BatchNorm] x3 + ``skip``/``skipbn`` projection ->
      ``block{1..3} / middle{1..M} / exit1`` with
      ``sep{i}/{depthwise,dw_bn,pointwise,pw_bn}`` and
      ``skip_conv``/``skip_bn``
    - exit separables ``conv{3,4,5}`` + ``bn{3,4,5}`` ->
      ``exit_sep{1,2,3}``

    The ``rep`` walk is SHAPE-driven (a 4-D weight with in-dim 1 starts
    a separable unit; a trailing 1-D-weight module is its pw_bn), so
    Sequential index offsets from relu_first/grow_first variants do not
    matter. Middle-block count adapts to the highest block index
    (block4..block<max-1> -> middle1..M, block<max> -> exit1)."""
    import re

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put_conv(scope, name, w):
        params.setdefault(scope, {})[name] = {"kernel": t2j_conv_kernel(w)}

    def put_bn(scope, name, prefix):
        p, s = _bn_entries(state, prefix)
        params.setdefault(scope, {})[name] = p
        stats.setdefault(scope, {})[name] = s

    # ---- stem
    params["conv1"] = {"conv": {"kernel": t2j_conv_kernel(state["conv1.weight"])}}
    params["conv2"] = {"conv": {"kernel": t2j_conv_kernel(state["conv2.weight"])}}
    p, s = _bn_entries(state, "bn1")
    params["conv1"]["bn"], stats["conv1"] = p, {"bn": s}
    p, s = _bn_entries(state, "bn2")
    params["conv2"]["bn"], stats["conv2"] = p, {"bn": s}

    # ---- blocks
    block_ids = sorted(
        {
            int(m.group(1))
            for k in state
            if (m := re.match(r"block(\d+)\.", k))
        }
    )
    if not block_ids:
        raise ValueError("No blockN.* keys — not official Xception naming")
    exit_id = block_ids[-1]

    def scope_of(bid: int) -> str:
        if bid <= 3:
            return f"block{bid}"
        if bid == exit_id:
            return "exit1"
        return f"middle{bid - 3}"

    for bid in block_ids:
        scope = scope_of(bid)
        pref = f"block{bid}."
        if pref + "skip.weight" in state:
            put_conv(scope, "skip_conv", state[pref + "skip.weight"])
            put_bn(scope, "skip_bn", pref + "skipbn")
        # ordered rep-module prefixes (state_dict preserves order)
        rep_mods = []
        for k in state:
            if k.startswith(pref + "rep."):
                mod = k[len(pref):].split(".")[1]  # the Sequential index
                full = pref + "rep." + mod
                if full not in rep_mods:
                    rep_mods.append(full)
        sep_i = 0
        for mod in rep_mods:
            w_key = mod + ".conv1.weight"
            if w_key in state:  # SeparableConv2d: dw + inner bn + pw
                sep_i += 1
                sscope = f"{scope}"
                sep = f"sep{sep_i}"
                params.setdefault(sscope, {})[sep] = {
                    "depthwise": {"kernel": t2j_conv_kernel(state[w_key])},
                    "pointwise": {
                        "kernel": t2j_conv_kernel(state[mod + ".pointwise.weight"])
                    },
                }
                p, s = _bn_entries(state, mod + ".bn")
                params[sscope][sep]["dw_bn"] = p
                stats.setdefault(sscope, {}).setdefault(sep, {})["dw_bn"] = s
            elif mod + ".weight" in state and state[mod + ".weight"].ndim == 1:
                # standalone BatchNorm entry -> pw_bn of the open sep
                if sep_i == 0:
                    raise ValueError(f"BN before any separable in {mod!r}")
                p, s = _bn_entries(state, mod)
                params[scope][f"sep{sep_i}"]["pw_bn"] = p
                stats[scope][f"sep{sep_i}"]["pw_bn"] = s

    # ---- exit separables conv3/4/5 (+ outer bn3/4/5 as pw_bn)
    for i, (ckey, bkey) in enumerate(
        (("conv3", "bn3"), ("conv4", "bn4"), ("conv5", "bn5")), start=1
    ):
        if ckey + ".conv1.weight" not in state:
            continue
        scope = f"exit_sep{i}"
        params[scope] = {
            "depthwise": {
                "kernel": t2j_conv_kernel(state[ckey + ".conv1.weight"])
            },
            "pointwise": {
                "kernel": t2j_conv_kernel(state[ckey + ".pointwise.weight"])
            },
        }
        p, s = _bn_entries(state, ckey + ".bn")
        params[scope]["dw_bn"] = p
        stats[scope] = {"dw_bn": s}
        p, s = _bn_entries(state, bkey)
        params[scope]["pw_bn"] = p
        stats[scope]["pw_bn"] = s

    return {"params": params, "batch_stats": stats}


def convert_backbone_state(backbone: str, state: Dict[str, np.ndarray]):
    """torch ``state_dict`` (numpy leaves) -> flax ``{params,
    batch_stats}`` tree for any supported backbone. Raises KeyError for
    unknown backbones (CLI surface wants a loud failure)."""
    if backbone in _RESNET_LAYERS:
        return convert_resnet_state(state, _RESNET_LAYERS[backbone])
    if backbone == "mobilenet_v2":
        return convert_mobilenet_state(state)
    if backbone.startswith("hrnet"):
        from ..models.backbones.hrnet import HRNET_SPECS

        return convert_hrnet_state(state, HRNET_SPECS[backbone])
    if backbone.startswith("xception"):
        if any(".rep." in k for k in state):
            return convert_xception_official_state(state)
        return convert_generic_state(state)
    if backbone == "generic":
        # flax-scope-named checkpoints (tools/convert_weights.py layout)
        return convert_generic_state(state)
    raise KeyError(f"No torch->jax converter for backbone {backbone!r}")


def load_backbone_pretrained(variables, backbone: str, path: str):
    """Merge pretrained weights for ``backbone`` into the model's
    ``variables`` (under the "backbone" scope). Accepts torch ``.pth``
    checkpoints (converted on the fly) or pre-converted ``.npz`` trees
    from ``tools/convert_weights.py``. Returns new variables; unknown
    backbones return them unchanged with a warning."""
    from .logger import get_logger

    logger = get_logger()
    if path.endswith(".npz"):
        tree = load_flax_npz(path)
    else:
        try:
            tree = convert_backbone_state(backbone, load_torch_state_dict(path))
        except KeyError:
            logger.warning("No torch->jax converter for backbone %r yet", backbone)
            return variables

    def merge(dst, src, prefix=""):
        out = dict(dst)
        for k, v in src.items():
            path = f"{prefix}/{k}"
            if k in out and isinstance(out[k], dict) and isinstance(v, dict):
                out[k] = merge(out[k], v, path)
            else:
                # loud failure on layout drift: a converted leaf must
                # match the shape the model initialized at this path
                old = out.get(k)
                if k in out and isinstance(old, dict) != isinstance(v, dict):
                    # structural drift (subtree where the model has a
                    # leaf, or vice versa) is the same converter-drift
                    # class — fail here, not at flax apply time
                    raise ValueError(
                        f"pretrained entry {path} is a "
                        f"{'subtree' if isinstance(v, dict) else 'leaf'} "
                        f"but the model declares a "
                        f"{'subtree' if isinstance(old, dict) else 'leaf'}"
                        " — wrong checkpoint or converter layout drift"
                    )
                if old is not None and hasattr(old, "shape") and hasattr(v, "shape"):
                    if tuple(old.shape) != tuple(v.shape):
                        raise ValueError(
                            f"pretrained leaf {path} has shape "
                            f"{tuple(v.shape)} but the model expects "
                            f"{tuple(old.shape)} — wrong checkpoint or "
                            f"converter layout drift"
                        )
                elif k not in out:
                    logger.warning(
                        "pretrained leaf %s not declared by the model; "
                        "inserting anyway (flax ignores extras)", path
                    )
                out[k] = v
        return out

    new_vars = dict(variables)
    new_vars["params"] = merge(
        dict(variables["params"]), {"backbone": tree["params"]}
    )
    if "batch_stats" in variables:
        new_vars["batch_stats"] = merge(
            dict(variables["batch_stats"]), {"backbone": tree["batch_stats"]}
        )
    logger.info("Loaded pretrained %s weights from %s", backbone, path)
    return new_vars
