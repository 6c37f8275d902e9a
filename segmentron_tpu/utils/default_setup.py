"""Run setup (reference: ``segmentron/utils/default_setup.py::default_setup``).

Creates timestamped run dirs, configures the rank-0 logger, seeds RNGs,
dumps environment info and the resolved config into the run dir.
"""

from __future__ import annotations

import os

from ..config import cfg
from .distributed import get_rank
from .env import collect_env_info, seed_all_rng
from .filesystem import makedirs
from .logger import setup_logger

__all__ = ["default_setup", "maybe_initialize_distributed"]


def maybe_initialize_distributed() -> bool:
    """Multi-host rendezvous (reference: dist.init_process_group("nccl",
    init_method="env://") — SURVEY §3.5). On TPU pods the coordinator is
    discovered from the environment; single-host runs skip this
    entirely. Explicit ``JAX_NUM_PROCESSES``/``JAX_PROCESS_ID`` beside
    ``JAX_COORDINATOR_ADDRESS`` cover manual launches (the multi-process
    CPU test, bare-metal pods without a cluster env). Returns True when
    a process group was initialized.

    Exercised end to end (2 processes x 4 CPU devices on localhost) by
    ``tests/test_multihost.py``."""
    if os.environ.get("JAX_NUM_PROCESSES") and not os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    ):
        # explicit manual topology without a coordinator must fail fast
        # — silently skipping rendezvous (or letting jax auto-detect a
        # DIFFERENT topology) would run a single-process job where the
        # operator asked for N
        raise RuntimeError(
            "JAX_NUM_PROCESSES is set but JAX_COORDINATOR_ADDRESS "
            "is not — set both for a manual multi-process launch "
            "(or neither, to let jax read the platform cluster env)"
        )
    if not (
        os.environ.get("JAX_COORDINATOR_ADDRESS")
        or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
    ):
        return False
    import jax

    kwargs = {}
    if os.environ.get("JAX_NUM_PROCESSES"):
        kwargs = dict(
            coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ.get("JAX_PROCESS_ID", 0)),
        )
    # megascale-only environments (no JAX_NUM_PROCESSES) fall through
    # to the bare call and let jax read its own cluster env
    jax.distributed.initialize(**kwargs)
    return True


def default_setup(args=None):
    maybe_initialize_distributed()
    run_name = "_".join(
        x
        for x in (
            cfg.MODEL.MODEL_NAME.lower(),
            cfg.MODEL.BACKBONE.lower(),
            cfg.DATASET.NAME.lower(),
            cfg.TIME_STAMP,
        )
        if x
    )
    save_dir = os.path.join(cfg.ROOT_PATH or ".", cfg.TRAIN.MODEL_SAVE_DIR, run_name)
    log_dir = os.path.join(cfg.ROOT_PATH or ".", cfg.TRAIN.LOG_SAVE_DIR, run_name)
    if get_rank() == 0:
        makedirs(save_dir)
        makedirs(log_dir)
    cfg.defrost()
    cfg.TRAIN.MODEL_SAVE_DIR = save_dir
    cfg.TRAIN.LOG_SAVE_DIR = log_dir
    cfg.freeze()

    logger = setup_logger(
        save_dir=log_dir if get_rank() == 0 else None,
        distributed_rank=get_rank(),
        filename=f"{run_name}.txt",
    )
    logger.info("Environment info:\n%s", collect_env_info())
    if args is not None:
        logger.info("Command line args: %s", args)
    logger.info("Running with config:\n%s", cfg.dump())
    if get_rank() == 0:
        with open(os.path.join(save_dir, "config.yaml"), "w") as f:
            f.write(cfg.dump())
    if cfg.UTILS.DEBUG_NANS:
        # SURVEY §5.2: the TPU replacement for race/sanitizer tooling —
        # jit purity plus fail-fast NaN checking.
        import jax

        jax.config.update("jax_debug_nans", True)
        logger.info("jax_debug_nans enabled")
    rng_key = seed_all_rng(cfg.SEED)
    return rng_key
