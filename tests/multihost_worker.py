"""Worker process for tests/test_multihost.py (SURVEY §5.8 / VERDICT r4
next-round #5: the ``jax.distributed`` multi-host path, exercised as
2 processes x 4 virtual CPU devices on localhost).

Launched as:  python multihost_worker.py <process_id> <num_processes>
              <coordinator_port> <out_json>

Each process initializes the process group through the SAME hook the
CLI tools use (``utils.default_setup.maybe_initialize_distributed``),
builds the GLOBAL ('data',) mesh over all 8 devices, assembles its
local shards of a deterministic global batch, runs two sharded train
steps (grad pmean + cross-process SyncBN psum-BN) and a psum'd
confusion-matrix eval step, then process 0 writes the losses + CM for
the parent test to compare against the single-process reference.
"""

import json
import os
import sys


def main():
    pid, nproc, port, out_path = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
    )
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
    os.environ["JAX_NUM_PROCESSES"] = str(nproc)
    os.environ["JAX_PROCESS_ID"] = str(pid)

    import jax

    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from segmentron_tpu.utils.default_setup import maybe_initialize_distributed

    assert maybe_initialize_distributed(), "hook did not initialize"
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 4 * nproc, jax.device_count()

    import flax.linen as nn
    import jax.numpy as jnp
    import numpy as np
    import optax

    from segmentron_tpu.engine.steps import (
        TrainState, make_eval_step, make_train_step,
    )
    from segmentron_tpu.solver.loss import mix_softmax_ce_loss
    from segmentron_tpu.utils import create_mesh, replicate_sharding
    from tests.multihost_model import make_model_and_data

    mesh = create_mesh([4 * nproc], ("data",))
    model, variables, images_np, masks_np = make_model_and_data()
    tx = optax.sgd(0.05, momentum=0.9)
    state = TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        rng=jax.random.PRNGKey(1),
    )
    state = jax.device_put(state, replicate_sharding(mesh))

    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P("data"))
    images = jax.make_array_from_callback(
        images_np.shape, sh, lambda idx: images_np[idx]
    )
    masks = jax.make_array_from_callback(
        masks_np.shape, sh, lambda idx: masks_np[idx]
    )

    step = make_train_step(model, mix_softmax_ce_loss, tx, mesh, donate=False)
    losses = []
    for _ in range(2):
        state, loss = step(state, images, masks)
        losses.append(float(jax.device_get(loss)))

    eval_step = make_eval_step(model, 7, mesh)
    cm = np.asarray(
        jax.device_get(
            eval_step(state.params, state.batch_stats, images, masks)
        )
    )

    if pid == 0:
        with open(out_path, "w") as f:
            json.dump({"losses": losses, "cm": cm.tolist()}, f)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
