"""Numerical oracles for the subtle losses (VERDICT r1 items 5/ADVICE-1).

The lovasz / OHEM / focal implementations in ``solver/loss.py`` handle
ignore pixels with jit-safe masking tricks (ignored pixels sort to the
tail with zero error; adaptive top-k cutoffs) — each is checked here
against an independent torch/numpy reference implementation written the
way the upstream PyTorch code (reference ``segmentron/solver/loss.py``)
computes them.
"""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from segmentron_tpu.solver.loss import (
    focal_loss,
    lovasz_softmax_loss,
    ohem_ce_loss,
)


# ----------------------------------------------------------------- oracles
def _lovasz_grad_np(gt_sorted):
    gts = gt_sorted.sum()
    intersection = gts - np.cumsum(gt_sorted)
    union = gts + np.cumsum(1.0 - gt_sorted)
    jaccard = 1.0 - intersection / union
    if len(gt_sorted) > 1:
        jaccard[1:] = jaccard[1:] - jaccard[:-1]
    return jaccard


def _lovasz_softmax_np(logits, labels, ignore=-1):
    """Berman's lovasz_softmax (classes='present', per_image=False):
    ignored pixels are REMOVED before sorting."""
    c = logits.shape[-1]
    lf = logits.reshape(-1, c).astype(np.float64)
    tf = labels.reshape(-1)
    keep = tf != ignore
    lf, tf = lf[keep], tf[keep]
    probs = np.exp(lf - lf.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    losses = []
    for cls in range(c):
        fg = (tf == cls).astype(np.float64)
        if fg.sum() == 0:
            continue
        errors = np.abs(fg - probs[:, cls])
        order = np.argsort(-errors, kind="stable")
        losses.append(np.dot(errors[order], _lovasz_grad_np(fg[order])))
    return float(np.mean(losses))


def _ohem_ce_np(logits, labels, thresh, min_kept, ignore=-1):
    c = logits.shape[-1]
    lt = torch.from_numpy(logits.reshape(-1, c).astype(np.float32))
    tt = torch.from_numpy(labels.reshape(-1).astype(np.int64))
    valid = tt != ignore
    logp = F.log_softmax(lt, dim=-1)
    p_t = logp.exp().gather(1, tt.clamp(min=0)[:, None])[:, 0]
    p_t = torch.where(valid, p_t, torch.inf)
    k = min(min_kept, len(p_t))
    kth = torch.kthvalue(p_t, k).values
    cutoff = torch.maximum(kth, torch.tensor(thresh))
    keep = valid & (p_t <= cutoff)
    nll = -logp.gather(1, tt.clamp(min=0)[:, None])[:, 0]
    return float(nll[keep].sum() / keep.sum().clamp(min=1))


def _focal_np(logits, labels, alpha, gamma, ignore=-1):
    c = logits.shape[-1]
    lt = torch.from_numpy(logits.reshape(-1, c).astype(np.float32))
    tt = torch.from_numpy(labels.reshape(-1).astype(np.int64))
    valid = tt != ignore
    logp_t = F.log_softmax(lt, dim=-1).gather(1, tt.clamp(min=0)[:, None])[:, 0]
    fl = -alpha * (1 - logp_t.exp()) ** gamma * logp_t
    return float(fl[valid].sum() / valid.sum().clamp(min=1))


# ------------------------------------------------------------------- tests
def test_lovasz_matches_oracle_with_ignore(rng):
    logits = rng.randn(2, 9, 13, 6).astype(np.float32)
    target = rng.randint(0, 6, size=(2, 9, 13))
    target[rng.rand(2, 9, 13) < 0.3] = -1  # heavy ignore coverage
    got = float(lovasz_softmax_loss((jnp.asarray(logits),), jnp.asarray(target)))
    want = _lovasz_softmax_np(logits, target)
    assert np.isclose(got, want, rtol=1e-4), (got, want)


def test_lovasz_matches_oracle_no_ignore(rng):
    logits = rng.randn(1, 8, 8, 4).astype(np.float32)
    target = rng.randint(0, 4, size=(1, 8, 8))
    got = float(lovasz_softmax_loss((jnp.asarray(logits),), jnp.asarray(target)))
    want = _lovasz_softmax_np(logits, target)
    assert np.isclose(got, want, rtol=1e-4), (got, want)


def test_lovasz_absent_class(rng):
    """Classes with no ground-truth pixels are excluded from the mean."""
    logits = rng.randn(1, 8, 8, 5).astype(np.float32)
    target = rng.randint(0, 3, size=(1, 8, 8))  # classes 3, 4 absent
    got = float(lovasz_softmax_loss((jnp.asarray(logits),), jnp.asarray(target)))
    want = _lovasz_softmax_np(logits, target)
    assert np.isclose(got, want, rtol=1e-4), (got, want)


def test_lovasz_all_ignore_finite(rng):
    logits = rng.randn(1, 4, 4, 3).astype(np.float32)
    target = -np.ones((1, 4, 4), np.int64)
    v = float(lovasz_softmax_loss((jnp.asarray(logits),), jnp.asarray(target)))
    assert np.isfinite(v)


def test_lovasz_perfect_prediction_near_zero(rng):
    target = rng.randint(0, 4, size=(1, 8, 8))
    logits = np.full((1, 8, 8, 4), -20.0, np.float32)
    np.put_along_axis(logits, target[..., None], 20.0, axis=-1)
    v = float(lovasz_softmax_loss((jnp.asarray(logits),), jnp.asarray(target)))
    assert v < 1e-5, v


def test_ohem_matches_oracle_thresh_binding(rng):
    """min_kept small: the 0.7 threshold is the binding cutoff."""
    logits = rng.randn(2, 16, 16, 5).astype(np.float32)
    target = rng.randint(-1, 5, size=(2, 16, 16))
    got = float(
        ohem_ce_loss((jnp.asarray(logits),), jnp.asarray(target),
                     thresh=0.7, min_kept=4)
    )
    want = _ohem_ce_np(logits, target, 0.7, 4)
    assert np.isclose(got, want, rtol=1e-5), (got, want)


def test_ohem_matches_oracle_min_kept_binding(rng):
    """min_kept large: the adaptive kth-prob cutoff binds."""
    n, h, w, c = 1, 16, 16, 4
    target = rng.randint(0, c, size=(n, h, w))
    logits = np.full((n, h, w, c), -5.0, np.float32)
    np.put_along_axis(logits, target[..., None], 5.0, axis=-1)
    logits += rng.randn(*logits.shape).astype(np.float32) * 0.1
    got = float(
        ohem_ce_loss((jnp.asarray(logits),), jnp.asarray(target),
                     thresh=0.7, min_kept=50)
    )
    want = _ohem_ce_np(logits, target, 0.7, 50)
    assert np.isclose(got, want, rtol=1e-5), (got, want)


def test_focal_matches_oracle(rng):
    logits = rng.randn(2, 12, 12, 7).astype(np.float32)
    target = rng.randint(-1, 7, size=(2, 12, 12))
    got = float(focal_loss((jnp.asarray(logits),), jnp.asarray(target),
                           alpha=0.25, gamma=2.0))
    want = _focal_np(logits, target, 0.25, 2.0)
    assert np.isclose(got, want, rtol=1e-5), (got, want)


def test_encnet_se_presence_matches_histogram(rng):
    """The SE-loss class-presence vector is now a compare+max-reduce
    (no pixel scatter — same TPU pathology as the CE gather); it must
    equal the histogram-based definition, ignore pixels excluded."""
    from segmentron_tpu.solver.loss import encnet_se_loss

    n, c = 3, 6
    target = rng.randint(-1, c, size=(n, 10, 10))
    se_pred = rng.randn(n, c).astype(np.float32)

    present = np.zeros((n, c), np.float32)
    for i in range(n):
        for cls in range(c):
            present[i, cls] = float((target[i] == cls).any())
    logp = -np.log1p(np.exp(-se_pred))
    log1mp = -np.log1p(np.exp(se_pred))
    want = float(np.mean(-(present * logp + (1 - present) * log1mp)))

    got = float(encnet_se_loss(jnp.asarray(se_pred), jnp.asarray(target), c))
    assert np.isclose(got, want, rtol=1e-5), (got, want)


# ---------------------- round-5 oracles: the remaining loss family
def _ce_torch(logits, target):
    lt = torch.from_numpy(
        np.ascontiguousarray(logits.reshape(-1, logits.shape[-1])))
    tt = torch.from_numpy(np.ascontiguousarray(target.reshape(-1))).long()
    return float(F.cross_entropy(lt, tt, ignore_index=-1, reduction="mean"))


def test_mix_softmax_ce_matches_torch(rng):
    """Plain CE (the workhorse): lane-iota _select_class vs
    F.cross_entropy with ignore_index, plus the 0.4 aux weighting."""
    from segmentron_tpu.solver.loss import mix_softmax_ce_loss

    main = rng.randn(2, 11, 13, 6).astype(np.float32)
    aux = rng.randn(2, 11, 13, 6).astype(np.float32)
    target = rng.randint(-1, 6, size=(2, 11, 13))
    got = float(mix_softmax_ce_loss(
        (jnp.asarray(main), jnp.asarray(aux)), jnp.asarray(target)))
    want = _ce_torch(main, target) + 0.4 * _ce_torch(aux, target)
    assert np.isclose(got, want, rtol=1e-5), (got, want)


def test_dice_matches_oracle(rng):
    """Soft multi-class dice with ignore masking, vs an independent
    numpy implementation."""
    from segmentron_tpu.solver.loss import dice_loss

    c = 5
    logits = rng.randn(2, 9, 9, c).astype(np.float32)
    target = rng.randint(-1, c, size=(2, 9, 9))
    got = float(dice_loss((jnp.asarray(logits),), jnp.asarray(target)))

    lf = logits.reshape(-1, c).astype(np.float64)
    tf = target.reshape(-1)
    valid = (tf >= 0)[:, None]
    probs = np.exp(lf - lf.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    probs = probs * valid
    onehot = np.eye(c)[np.where(tf >= 0, tf, 0)] * valid
    inter = (probs * onehot).sum(0)
    denom = (probs + onehot).sum(0)
    want = float(1.0 - np.mean((2 * inter + 1.0) / (denom + 1.0)))
    assert np.isclose(got, want, rtol=1e-5), (got, want)


def test_icnet_loss_matches_torch_nearest_downsample(rng):
    """ICNet cascade guidance: targets nearest-downsampled to each
    branch resolution must match F.interpolate(mode='nearest') +
    F.cross_entropy at every scale."""
    from segmentron_tpu.solver.loss import icnet_loss

    c, th, tw = 4, 24, 32
    target = rng.randint(-1, c, size=(2, th, tw))
    outs = [rng.randn(2, th, tw, c).astype(np.float32),
            rng.randn(2, th // 2, tw // 2, c).astype(np.float32),
            rng.randn(2, th // 4, tw // 4, c).astype(np.float32)]
    got = float(icnet_loss(tuple(jnp.asarray(o) for o in outs),
                           jnp.asarray(target)))

    want = 0.0
    tt = torch.from_numpy(target)[:, None].float()
    for w_, o in zip((1.0, 0.4, 0.16), outs):
        h, w = o.shape[1:3]
        tgt = F.interpolate(tt, size=(h, w), mode="nearest")[:, 0]
        want += w_ * _ce_torch(o, tgt.numpy().astype(np.int64))
    assert np.isclose(got, want, rtol=1e-5), (got, want)


def test_boundary_from_mask_no_wraparound(rng):
    """The on-device boundary derivation: 4-neighbour class changes,
    edge-CLAMPED (a uniform mask has zero boundary even though its
    opposite edges differ from each other only under wraparound)."""
    from segmentron_tpu.solver.loss import _boundary_from_mask

    # two half-planes: boundary only along the dividing line
    t = np.zeros((1, 8, 10), np.int32)
    t[:, :, 5:] = 1
    b = np.asarray(_boundary_from_mask(jnp.asarray(t)))
    want = np.zeros_like(b)
    want[:, :, 4:6] = 1.0
    np.testing.assert_array_equal(b, want)

    # wraparound regression: left edge 0s vs right edge 1s must NOT be
    # boundary; with jnp.roll they were.
    assert b[:, :, 0].sum() == 0 and b[:, :, -1].sum() == 0

    # ignore pixels are never boundary and never induce one
    t2 = np.zeros((1, 6, 6), np.int32)
    t2[:, 3:] = -1
    b2 = np.asarray(_boundary_from_mask(jnp.asarray(t2)))
    assert b2.sum() == 0


def test_translab_loss_matches_oracle(rng):
    """TransLab composite: seg CE + 5 * (masked BCE + soft dice) on the
    boundary stream, boundary target derived from the mask."""
    from segmentron_tpu.solver.loss import translab_loss

    c, h, w = 3, 12, 12
    seg = rng.randn(1, h, w, c).astype(np.float32)
    bl = rng.randn(1, h, w, 1).astype(np.float32)
    target = rng.randint(0, c, size=(1, h, w))
    target[0, :2, :2] = -1
    got = float(translab_loss((jnp.asarray(seg), jnp.asarray(bl)),
                              jnp.asarray(target)))

    # independent numpy boundary (edge-clamped 4-neighbour)
    tp = np.pad(target, ((0, 0), (1, 1), (1, 1)), mode="edge")
    bt = np.zeros((1, h, w), bool)
    for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
        n = tp[:, 1 + dy:1 + dy + h, 1 + dx:1 + dx + w]
        bt |= (n != target) & (n >= 0) & (target >= 0)
    bt = bt.astype(np.float64)
    blf = bl[..., 0].astype(np.float64)
    valid = (target >= 0).astype(np.float64)
    p = 1 / (1 + np.exp(-blf))
    bce = -(bt * np.log(p) + (1 - bt) * np.log1p(-p)) * valid
    bce = bce.sum() / max(valid.sum(), 1)
    pm = p * valid
    dice = 1.0 - (2 * (pm * bt).sum() + 1.0) / (pm.sum() + bt.sum() + 1.0)
    want = _ce_torch(seg, target) + 5.0 * (bce + dice)
    assert np.isclose(got, want, rtol=1e-4), (got, want)


def test_pointrend_loss_matches_oracle(rng):
    """PointRend: coarse CE + point CE where point targets are the
    nearest GT labels under the floor(coord * size) convention."""
    from segmentron_tpu.solver.loss import pointrend_loss

    c, h, w, npts = 4, 16, 16, 37
    main = rng.randn(2, h, w, c).astype(np.float32)
    target = rng.randint(-1, c, size=(2, h, w))
    coords = rng.rand(2, npts, 2).astype(np.float32)
    pt_logits = rng.randn(2, npts, c).astype(np.float32)
    got = float(pointrend_loss(
        (jnp.asarray(main), jnp.asarray(pt_logits), jnp.asarray(coords)),
        jnp.asarray(target)))

    ys = np.clip((coords[..., 1] * h).astype(np.int64), 0, h - 1)
    xs = np.clip((coords[..., 0] * w).astype(np.int64), 0, w - 1)
    pt_t = np.take_along_axis(target.reshape(2, -1), ys * w + xs, axis=1)
    want = _ce_torch(main, target) + _ce_torch(pt_logits, pt_t)
    assert np.isclose(got, want, rtol=1e-5), (got, want)
