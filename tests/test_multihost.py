"""Multi-host (multi-process) jax.distributed path — SURVEY §5.8,
VERDICT r4 next-round #5.

The reference's NCCL rendezvous analogue (``jax.distributed.initialize``
via ``utils.default_setup.maybe_initialize_distributed``) had never been
executed. Here it runs for real: 2 OS processes x 4 virtual CPU devices
each rendezvous on localhost, build the GLOBAL 8-device ('data',) mesh,
run sharded train steps (cross-process grad pmean + SyncBN psum) and a
psum'd confusion-matrix eval, and the result must equal the
single-process 8-device run of the identical graph: CM bit-exactly,
losses to f32 reduction tolerance.
"""

import json
import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _single_process_reference():
    from segmentron_tpu.engine.steps import (
        TrainState, make_eval_step, make_train_step,
    )
    from segmentron_tpu.solver.loss import mix_softmax_ce_loss
    from segmentron_tpu.utils import create_mesh, replicate_sharding
    from tests.multihost_model import make_model_and_data

    mesh = create_mesh([8], ("data",))
    model, variables, images, masks = make_model_and_data()
    tx = optax.sgd(0.05, momentum=0.9)
    state = TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        rng=jax.random.PRNGKey(1),
    )
    state = jax.device_put(state, replicate_sharding(mesh))
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
    return losses, cm


def test_two_process_jax_distributed_matches_single_process(tmp_path):
    # bounded by the communicate(timeout=540) below — no pytest-timeout
    # plugin in this image
    port = _free_port()
    out = tmp_path / "proc0.json"
    env = {
        k: v
        for k, v in os.environ.items()
        # workers set their own platform/device-count/rendezvous vars
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_COORDINATOR_ADDRESS")
    }
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                os.path.join(REPO, "tests", "multihost_worker.py"),
                str(pid), "2", str(port), str(out),
            ],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for pid in range(2)
    ]
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=540)
        logs.append(stdout.decode(errors="replace"))
    for p, tail in zip(procs, logs):
        assert p.returncode == 0, f"worker rc={p.returncode}\n{tail[-4000:]}"
    with open(out) as f:
        got = json.load(f)

    want_losses, want_cm = _single_process_reference()
    # integer confusion matrix: bit-exact across process topologies
    np.testing.assert_array_equal(np.asarray(got["cm"]), want_cm)
    np.testing.assert_allclose(got["losses"], want_losses, rtol=2e-5)


def test_manual_topology_without_coordinator_fails_fast(monkeypatch):
    """JAX_NUM_PROCESSES without JAX_COORDINATOR_ADDRESS must raise, not
    silently run single-process (the operator asked for N processes)."""
    from segmentron_tpu.utils.default_setup import (
        maybe_initialize_distributed,
    )

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("MEGASCALE_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.setenv("JAX_NUM_PROCESSES", "2")
    with pytest.raises(RuntimeError, match="JAX_COORDINATOR_ADDRESS"):
        maybe_initialize_distributed()

    # and with no distributed env at all it is a clean no-op
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    assert maybe_initialize_distributed() is False
