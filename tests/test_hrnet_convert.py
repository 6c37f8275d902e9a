"""HRNet torch->flax converter: synthetic official-HRNet-named
state_dict (shapes derived from the spec independently) must convert to
a tree that exactly matches the flax backbone init (names + shapes)."""

import numpy as np
import pytest

SPEC_NAME = "hrnet_w18_small_v1"


def _fake_hrnet_state(spec):
    state = {}
    rng = np.random.RandomState(0)

    def conv(name, o, i, k):
        state[name + ".weight"] = rng.randn(o, i, k, k).astype(np.float32)

    def bn(name, c):
        state[name + ".weight"] = np.ones(c, np.float32)
        state[name + ".bias"] = np.zeros(c, np.float32)
        state[name + ".running_mean"] = np.zeros(c, np.float32)
        state[name + ".running_var"] = np.ones(c, np.float32)

    def basic(tp, in_ch, ch):
        conv(tp + ".conv1", ch, in_ch, 3)
        bn(tp + ".bn1", ch)
        conv(tp + ".conv2", ch, ch, 3)
        bn(tp + ".bn2", ch)
        if in_ch != ch:
            conv(tp + ".downsample.0", ch, in_ch, 1)
            bn(tp + ".downsample.1", ch)

    def bottleneck(tp, in_ch, ch):
        out = ch * 4
        conv(tp + ".conv1", ch, in_ch, 1)
        bn(tp + ".bn1", ch)
        conv(tp + ".conv2", ch, ch, 3)
        bn(tp + ".bn2", ch)
        conv(tp + ".conv3", out, ch, 1)
        bn(tp + ".bn3", out)
        if in_ch != out:
            conv(tp + ".downsample.0", out, in_ch, 1)
            bn(tp + ".downsample.1", out)

    conv("conv1", 64, 3, 3)
    bn("bn1", 64)
    conv("conv2", 64, 64, 3)
    bn("bn2", 64)

    _, _, blk1, n_blocks1, ch1 = spec["stage1"]
    in_ch = 64
    for k in range(n_blocks1[0]):
        bottleneck(f"layer1.{k}", in_ch, ch1[0])
        in_ch = ch1[0] * 4
    prev_ch = [in_ch]

    for sidx, key in enumerate(("stage2", "stage3", "stage4"), start=2):
        n_mod, n_br, blk, n_blocks, n_ch = spec[key]
        ttp = f"transition{sidx - 1}"
        for b in range(n_br):
            if b < len(prev_ch):
                if prev_ch[b] != n_ch[b]:
                    conv(f"{ttp}.{b}.0", n_ch[b], prev_ch[b], 3)
                    bn(f"{ttp}.{b}.1", n_ch[b])
            else:
                conv(f"{ttp}.{b}.0.0", n_ch[b], prev_ch[-1], 3)
                bn(f"{ttp}.{b}.0.1", n_ch[b])
        for m in range(n_mod):
            mtp = f"{key}.{m}"
            for b in range(n_br):
                cin = n_ch[b]
                for k in range(n_blocks[b]):
                    basic(f"{mtp}.branches.{b}.{k}", cin, n_ch[b])
                    cin = n_ch[b]
            for i in range(n_br):
                for j in range(n_br):
                    if j > i:
                        conv(f"{mtp}.fuse_layers.{i}.{j}.0", n_ch[i], n_ch[j], 1)
                        bn(f"{mtp}.fuse_layers.{i}.{j}.1", n_ch[i])
                    elif j < i:
                        for k in range(i - j):
                            last = k == i - j - 1
                            out = n_ch[i] if last else n_ch[j]
                            src = n_ch[j]
                            conv(f"{mtp}.fuse_layers.{i}.{j}.{k}.0", out, src, 3)
                            bn(f"{mtp}.fuse_layers.{i}.{j}.{k}.1", out)
        prev_ch = list(n_ch)
    return state


def test_convert_hrnet_matches_flax_tree(fresh_cfg):
    import jax
    from segmentron_tpu.models.backbones import get_segmentation_backbone
    from segmentron_tpu.models.backbones.hrnet import HRNET_SPECS
    from segmentron_tpu.modules.batch_norm import NormConfig
    from segmentron_tpu.utils.torch_convert import convert_hrnet_state

    spec = HRNET_SPECS[SPEC_NAME]
    tree = convert_hrnet_state(_fake_hrnet_state(spec), spec)

    bb = get_segmentation_backbone(SPEC_NAME, NormConfig())
    v = bb.init(jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32))
    init_p = jax.tree.map(lambda a: a.shape, v["params"])
    conv_p = jax.tree.map(lambda a: a.shape, tree["params"])
    assert conv_p == init_p, (
        sorted(set(map(str, jax.tree_util.tree_leaves_with_path(conv_p)))
               ^ set(map(str, jax.tree_util.tree_leaves_with_path(init_p))))
    )
    init_s = jax.tree.map(lambda a: a.shape, v["batch_stats"])
    conv_s = jax.tree.map(lambda a: a.shape, tree["batch_stats"])
    assert conv_s == init_s
