"""Shared tiny model + deterministic data for the multi-host test —
imported by BOTH the 2-process workers and the single-process reference
so the compared graphs are constructed identically.

The model exercises the two cross-process collectives that matter:
SyncBN (psum batch statistics over the 'data' axis — the one
"model-ish" collective the reference has, SURVEY §2.9) and the grad
pmean in make_train_step.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class TinySync(nn.Module):
    nclass: int = 7

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(16, (3, 3), name="conv1")(x)
        # axis_name='data' = cross-replica (and cross-PROCESS) SyncBN
        x = nn.BatchNorm(
            use_running_average=not train, axis_name="data" if train else None,
            name="bn1",
        )(x)
        x = nn.relu(x)
        x = nn.Conv(self.nclass, (1, 1), name="cls")(x)
        return (x,)


def make_model_and_data(batch: int = 8, side: int = 16, nclass: int = 7):
    model = TinySync(nclass=nclass)
    rs = np.random.RandomState(0)
    images = rs.rand(batch, side, side, 3).astype(np.float32)
    masks = rs.randint(-1, nclass, (batch, side, side)).astype(np.int32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, side, side, 3)), False
    )
    return model, dict(variables), images, masks
