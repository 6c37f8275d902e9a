import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from segmentron_tpu.solver import (
    get_segmentation_loss,
    warmup_poly_lr,
)
from segmentron_tpu.solver.loss import cross_entropy, ohem_ce_loss


def test_warmup_poly_values():
    sched = warmup_poly_lr(0.01, 100, power=0.9, warmup_iters=10, warmup_factor=1 / 3)
    # at step 0: warmup factor = 1/3, poly ~ 1
    assert np.isclose(float(sched(0)), 0.01 / 3, rtol=1e-5)
    # after warmup: pure poly
    assert np.isclose(float(sched(50)), 0.01 * (1 - 50 / 100) ** 0.9, rtol=1e-5)
    # near end -> ~0
    assert float(sched(100)) == 0.0


def test_cross_entropy_matches_torch(rng):
    logits = rng.randn(2, 8, 8, 5).astype(np.float32)
    target = rng.randint(-1, 5, size=(2, 8, 8))
    got = float(cross_entropy(jnp.asarray(logits), jnp.asarray(target)))
    lt = torch.from_numpy(logits).permute(0, 3, 1, 2)
    tt = torch.from_numpy(target.astype(np.int64))
    want = F.cross_entropy(lt, tt, ignore_index=-1).item()
    assert np.isclose(got, want, rtol=1e-5)


def test_ohem_keeps_hard_pixels(rng):
    # all pixels easy except a few: OHEM loss should exceed plain CE
    n, h, w, c = 1, 16, 16, 4
    target = rng.randint(0, c, size=(n, h, w))
    logits = np.full((n, h, w, c), -5.0, np.float32)
    np.put_along_axis(logits, target[..., None], 5.0, axis=-1)  # confident correct
    # make 8 pixels hard (wrong confident prediction)
    logits[0, 0, :8] = -5.0
    logits[0, 0, :8, (target[0, 0, :8] + 1) % c] = 5.0
    full_ce = float(cross_entropy(jnp.asarray(logits), jnp.asarray(target)))
    ohem = float(
        ohem_ce_loss(
            (jnp.asarray(logits),), jnp.asarray(target), thresh=0.7, min_kept=8
        )
    )
    assert ohem > full_ce * 10


def test_loss_dispatch():
    assert get_segmentation_loss("icnet").func.__name__ == "icnet_loss"
    assert get_segmentation_loss("FCN", use_ohem=True).func.__name__ == "ohem_ce_loss"
    assert (
        get_segmentation_loss("FCN", loss_name="focal").func.__name__ == "focal_loss"
    )
    assert (
        get_segmentation_loss("DANet", multi_loss_weight=[1.0, 0.5, 0.5]).func.__name__
        == "multi_weight_loss"
    )


def test_losses_are_finite_with_all_ignore(rng):
    logits = rng.randn(1, 4, 4, 3).astype(np.float32)
    target = -np.ones((1, 4, 4), np.int64)
    for name in ["", "focal", "dice"]:
        fn = get_segmentation_loss("FCN", loss_name=name)
        v = float(fn((jnp.asarray(logits),), jnp.asarray(target)))
        assert np.isfinite(v), name


def test_optimizer_group_split(fresh_cfg, rng):
    import optax
    from segmentron_tpu.solver import get_optimizer, backbone_decoder_labels

    params = {
        "backbone": {"conv": {"kernel": jnp.ones((3, 3, 4, 4))}},
        "head": {"conv": {"kernel": jnp.ones((1, 1, 4, 4))}},
    }
    labels = backbone_decoder_labels(params)
    assert labels["backbone"]["conv"]["kernel"] == "backbone"
    assert labels["head"]["conv"]["kernel"] == "decoder"

    fresh_cfg.SOLVER.OPTIMIZER = "sgd"
    fresh_cfg.SOLVER.DECODER_LR_FACTOR = 10.0
    fresh_cfg.SOLVER.WEIGHT_DECAY = 0.0
    fresh_cfg.SOLVER.MOMENTUM = 0.0
    tx = get_optimizer(fresh_cfg, params, lambda s: 0.1)
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    assert np.isclose(float(updates["backbone"]["conv"]["kernel"][0, 0, 0, 0]), -0.1)
    assert np.isclose(float(updates["head"]["conv"]["kernel"][0, 0, 0, 0]), -1.0)
