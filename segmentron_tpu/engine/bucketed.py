"""Shape-bucketed whole-image TTA eval for variable-size datasets.

The reference evaluates ``testval`` images at their native sizes
(``tools/eval.py`` loop, SURVEY.md §3.2) — fine in eager torch, but on
TPU each unique (H, W) would compile its own program, and ADE20K / VOC
val sets have hundreds of distinct sizes (~5 min per remote compile
through the relay: unusable — VERDICT r2 weak #2).

TPU re-design (SURVEY §7 "Dynamic shapes"): images are zero-padded up
to a SMALL static set of bucket shapes (mask padded with ignore = -1,
so pad pixels contribute nothing to the confusion matrix), and ONE
program is compiled per bucket. Everything that varies per image inside
a bucket enters as *data*, not shape:

- the real scaled sizes, via dense align-corners resize MATRICES built
  host-side (zero-padded to bucket dims — extra f32 zero-adds only);
- the sliding-window grid, as an int32 position array + a weight vector
  (dummy slots get weight 0: zero canvas contribution);
- the flip geometry, via a dynamic ``jnp.roll`` by the real scaled
  width, so the flipped content sits exactly where the unbucketed
  pipeline puts it.

With ``scales=(1.0,)`` the compiled arithmetic on the real region is
IDENTICAL to the unbucketed sliding path (windows are clamped inside
the real region and read the same pixels; the canvas stitch adds the
same values), so the confusion matrix matches bit-for-bit — tested in
``tests/test_bucketed_eval.py``. At other scales the resize matmul
carries extra zero-columns whose f32 adds are exact zeros; results
match the unbucketed path to f32 rounding of accumulation order.

Known semantic deviation (documented): when ``crop_size`` is set,
images whose scaled size is SMALLER than the crop run as one
zero-padded crop-sized window, where the unbucketed path feeds the raw
(sh, sw) image to the model. Predictions may differ near the pad
frontier (this is the standard "slide" eval semantics of other
frameworks). Whole-image mode (``crop_size=None``) runs the padded
canvas through the model directly and is approximate for models with
global ops (image pooling / attention).
"""

from __future__ import annotations

import functools
import math
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.resize import _interp_weights
from ..utils.score import confusion_matrix_update
from .tta import _PREDICT_REGISTRY, _grid_positions, _predict_token

__all__ = ["bucket_for", "bucketed_cm", "BucketedTTA"]


def bucket_for(
    h: int, w: int, quant: int, floor: Optional[int] = None
) -> Tuple[int, int]:
    """Round (h, w) up to multiples of ``quant`` (and at least ``floor``,
    typically the sliding-window crop size)."""
    bh = -(-h // quant) * quant
    bw = -(-w // quant) * quant
    if floor:
        bh, bw = max(bh, floor), max(bw, floor)
    return bh, bw


def _padded_interp(real_in: int, real_out: int, pad_in: int, pad_out: int):
    """(pad_out, pad_in) f32 matrix whose top-left block is the exact
    align-corners interpolation real_in -> real_out; rest zeros."""
    m = np.zeros((pad_out, pad_in), np.float32)
    m[:real_out, :real_in] = _interp_weights(real_in, real_out, True).astype(
        np.float32
    )
    return m


class BucketedTTA:
    """Per-bucket compiled multi-scale + flip + sliding TTA -> CM.

    One instance per (predict_fn, nclass, scales, flip, crop) config;
    programs cache per bucket shape inside the jit cache (the aux
    arrays' shapes are part of the bucket key).
    """

    def __init__(
        self,
        predict_fn: Callable,
        nclass: int,
        scales: Sequence[float] = (1.0,),
        flip: bool = False,
        crop_size: Optional[int] = None,
        stride_ratio: float = 2.0 / 3.0,
    ):
        # the predictor runs INSIDE this class's jitted per-bucket
        # programs — unwrap jitted-with-compiler_options predictors
        # (make_predict_fn), whose options are only legal top-level
        self.predict_fn = getattr(predict_fn, "raw", predict_fn)
        self.nclass = int(nclass)
        self.scales = tuple(float(s) for s in scales)
        self.flip = bool(flip)
        self.crop = int(crop_size) if crop_size else None
        self.stride = (
            int(math.ceil(self.crop * stride_ratio)) if self.crop else None
        )
        self._programs: dict = {}  # bucket -> jitted program

    # ----------------------------------------------------- static geometry
    def _scale_dims(self, bucket):
        """Static per-scale canvas dims (PH, PW) and max window count."""
        bh, bw = bucket
        out = []
        for s in self.scales:
            sbh = bh if s == 1.0 else int(bh * s + 0.5)
            sbw = bw if s == 1.0 else int(bw * s + 0.5)
            if self.crop:
                ph, pw = max(sbh, self.crop), max(sbw, self.crop)
                nwin = len(_grid_positions(ph, pw, self.crop, self.stride))
            else:
                ph, pw, nwin = sbh, sbw, 0
            out.append((sbh, sbw, ph, pw, nwin))
        return tuple(out)

    # ------------------------------------------------------- host-side aux
    def make_aux(self, h: int, w: int, bucket: Tuple[int, int]):
        """All per-image dynamic data for one bucketed program call."""
        bh, bw = bucket
        assert h <= bh and w <= bw, (h, w, bucket)
        dims = self._scale_dims(bucket)
        aux = []
        for s, (sbh, sbw, ph, pw, nwin) in zip(self.scales, dims):
            sh = h if s == 1.0 else int(h * s + 0.5)
            sw = w if s == 1.0 else int(w * s + 0.5)
            entry = {
                "sw": np.asarray(sw, np.int32),
            }
            if s != 1.0:
                entry["rh"] = _padded_interp(h, sh, bh, sbh)
                entry["rw"] = _padded_interp(w, sw, bw, sbw)
                entry["bh"] = _padded_interp(sh, h, sbh, bh)
                entry["bw"] = _padded_interp(sw, w, sbw, bw)
            if self.crop:
                rph, rpw = max(sh, self.crop), max(sw, self.crop)
                grid = _grid_positions(rph, rpw, self.crop, self.stride)
                pos = np.zeros((nwin, 2), np.int32)
                wgt = np.zeros((nwin,), np.float32)
                pos[: len(grid)] = np.asarray(grid, np.int32)
                wgt[: len(grid)] = 1.0
                entry["pos"] = pos
                entry["wgt"] = wgt
            aux.append(entry)
        return aux

    # --------------------------------------------------------- traced body
    def _slide(self, variables, canvas, pos, wgt):
        """Sliding windows at dynamic positions over a static canvas.
        canvas (PH, PW, 3) -> stitched logits (PH, PW, C)."""
        crop = self.crop
        windows = jax.vmap(
            lambda p: jax.lax.dynamic_slice(
                canvas, (p[0], p[1], 0), (crop, crop, canvas.shape[-1])
            )
        )(pos)  # (nwin, crop, crop, 3)
        logits = self.predict_fn(variables, windows).astype(jnp.float32)
        ph, pw = canvas.shape[0], canvas.shape[1]
        acc0 = jnp.zeros((ph, pw, self.nclass), jnp.float32)
        cnt0 = jnp.zeros((ph, pw, 1), jnp.float32)

        def body(i, carry):
            acc, cnt = carry
            y0, x0 = pos[i, 0], pos[i, 1]
            tile = jax.lax.dynamic_slice(
                acc, (y0, x0, 0), (crop, crop, self.nclass)
            )
            acc = jax.lax.dynamic_update_slice(
                acc, tile + logits[i] * wgt[i], (y0, x0, 0)
            )
            ctile = jax.lax.dynamic_slice(cnt, (y0, x0, 0), (crop, crop, 1))
            cnt = jax.lax.dynamic_update_slice(
                cnt, ctile + wgt[i], (y0, x0, 0)
            )
            return acc, cnt

        acc, cnt = jax.lax.fori_loop(0, pos.shape[0], body, (acc0, cnt0))
        return acc / jnp.maximum(cnt, 1.0)

    def _body(self, variables, image, mask, aux, hw, bucket):
        bh, bw = bucket
        dims = self._scale_dims(bucket)
        total = jnp.zeros((bh, bw, self.nclass), jnp.float32)
        img = image[0] if image.ndim == 4 else image  # (bh, bw, 3)
        if img.dtype == jnp.uint8:
            # raw-uint8 loader mode: normalize in-graph, then re-zero
            # the pad apron (the host f32 path pads with
            # normalized-space zeros; u8 zero would normalize to
            # (0-mean)/std). The true extent rides as data so one
            # program per bucket still serves every image in it.
            from ..ops.preprocess import maybe_normalize

            img = maybe_normalize(img)
            rows = jnp.arange(bh, dtype=jnp.int32)[:, None] < hw[0]
            cols = jnp.arange(bw, dtype=jnp.int32)[None, :] < hw[1]
            img = img * (rows & cols)[:, :, None].astype(jnp.float32)
        for s, (sbh, sbw, ph, pw, _), a in zip(self.scales, dims, aux):
            if s == 1.0:
                scaled = img
            else:
                # zero-padded resize matrices: real block top-left,
                # extra contractions add exact f32 zeros
                scaled = jnp.einsum(
                    "oh,hwc->owc", a["rh"], img.astype(jnp.float32),
                    precision="highest",
                )
                scaled = jnp.einsum(
                    "pw,owc->opc", a["rw"], scaled, precision="highest"
                ).astype(img.dtype)
            canvas = jnp.pad(
                scaled, ((0, ph - scaled.shape[0]), (0, pw - scaled.shape[1]),
                         (0, 0))
            )
            variants = [(canvas, False)]
            if self.flip:
                # flip the full canvas then roll the mirrored content
                # back to column 0 — the layout the unbucketed pipeline
                # produces by flipping the raw image before padding
                sw = a["sw"]
                flipped = jnp.roll(canvas[:, ::-1], sw - pw, axis=1)
                variants.append((flipped, True))
            for var_canvas, is_flip in variants:
                if self.crop:
                    logits = self._slide(
                        variables, var_canvas, a["pos"], a["wgt"]
                    )
                else:
                    logits = self.predict_fn(
                        variables, var_canvas[None]
                    ).astype(jnp.float32)[0]
                probs = jax.nn.softmax(logits, axis=-1)
                if is_flip:
                    probs = jnp.roll(probs, pw - a["sw"], axis=1)[:, ::-1]
                if s == 1.0:
                    total = total + probs[:bh, :bw]
                else:
                    pb = jnp.einsum(
                        "ho,owc->hwc", a["bh"], probs[:sbh, :sbw],
                        precision="highest",
                    )
                    pb = jnp.einsum(
                        "wp,hpc->hwc", a["bw"], pb, precision="highest"
                    )
                    total = total + pb
        pred = jnp.argmax(total, axis=-1)
        return confusion_matrix_update(pred[None], mask[None], self.nclass)

    # --------------------------------------------------------------- entry
    def _compiled(self, bucket: Tuple[int, int]):
        fn = self._programs.get(bucket)
        if fn is None:
            from ..utils.compileopts import tpu_compiler_options

            fn = jax.jit(functools.partial(self._body, bucket=bucket),
                         compiler_options=tpu_compiler_options())
            self._programs[bucket] = fn
        return fn

    def __call__(self, variables, image_np, mask_np, quant: int = 512):
        """Evaluate ONE native-size image -> (nclass, nclass) int32 CM.

        ``image_np`` (H, W, 3) float32 normalized, ``mask_np`` (H, W)
        int32 with ignore = -1, both at native resolution."""
        h, w = image_np.shape[:2]
        bucket = bucket_for(h, w, quant, self.crop)
        bh, bw = bucket
        # raw uint8 ships as-is (in-graph normalize); f32 as before
        dt = np.uint8 if image_np.dtype == np.uint8 else np.float32
        img = np.zeros((bh, bw, image_np.shape[-1]), dt)
        img[:h, :w] = image_np
        msk = np.full((bh, bw), -1, np.int32)
        msk[:h, :w] = mask_np
        aux = self.make_aux(h, w, bucket)
        return self._compiled(bucket)(
            variables, jnp.asarray(img), jnp.asarray(msk), aux,
            jnp.asarray([h, w], np.int32),
        )



def bucketed_cm(
    predict_fn, variables, image_np, mask_np, nclass,
    scales=(1.0,), flip=False, crop_size=None, quant=512,
):
    """Convenience one-shot wrapper (caches BucketedTTA per config)."""
    key = (
        _predict_token(predict_fn), int(nclass), tuple(scales), bool(flip),
        int(crop_size) if crop_size else None,
    )
    tta = _BUCKETED_CACHE.get(key)
    if tta is None:
        tta = BucketedTTA(predict_fn, nclass, scales, flip, crop_size)
        _BUCKETED_CACHE[key] = tta
    return tta(variables, image_np, mask_np, quant=quant)


_BUCKETED_CACHE: dict = {}
