"""Orbax checkpointing of (params, opt_state, step, config).

The reference checkpoints only model weights via DDPMPipeline.save_pretrained
every epoch (training_pipeline.py:101-107) and cannot resume optimization.
Here the full training state round-trips, so resume continues the exact run.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import orbax.checkpoint as ocp

from drivescenegen_tpu.training.trainer import TrainState


def _manager(directory: str, max_to_keep: int = 3) -> ocp.CheckpointManager:
    options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True)
    return ocp.CheckpointManager(os.path.abspath(directory), options=options)


def save_checkpoint(
    directory: str, state: TrainState, extra: Optional[dict] = None,
    max_to_keep: int = 3, wait: bool = False,
) -> None:
    mgr = _manager(directory, max_to_keep)
    payload = {"params": state.params, "opt_state": state.opt_state, "step": state.step}
    if state.ema_params is not None:
        payload["ema_params"] = state.ema_params
    if extra:
        payload["extra"] = extra
    mgr.save(int(state.step), args=ocp.args.StandardSave(payload))
    if wait:
        mgr.wait_until_finished()
    mgr.close()


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    mgr = _manager(directory)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore_checkpoint(directory: str, template_state: TrainState) -> TrainState:
    """Restore the latest checkpoint, reusing template shardings/dtypes."""
    mgr = _manager(directory)
    step = mgr.latest_step()
    if step is None:
        mgr.close()
        raise FileNotFoundError(f"no checkpoint found under {directory}")
    template = {
        "params": template_state.params,
        "opt_state": template_state.opt_state,
        "step": template_state.step,
    }
    if template_state.ema_params is not None:
        template["ema_params"] = template_state.ema_params
    try:
        restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
    except Exception:
        if "ema_params" not in template:
            mgr.close()
            raise
        # Resuming a pre-EMA checkpoint with EMA now enabled: restore
        # without the EMA slot and seed the average from the params.
        template.pop("ema_params")
        restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
        restored["ema_params"] = jax.tree.map(jnp.copy, restored["params"])
    mgr.close()
    return TrainState(
        params=restored["params"],
        opt_state=restored["opt_state"],
        step=restored["step"],
        ema_params=restored.get("ema_params"),
    )


def save_params_only(directory: str, params: Any, step: int = 0) -> None:
    """Export just the weights (the analog of save_pretrained for sampling)."""
    path = os.path.abspath(os.path.join(directory, "params"))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params, force=True)
    ckptr.wait_until_finished()
    ckptr.close()


def restore_params_only(directory: str, template: Any) -> Any:
    path = os.path.abspath(os.path.join(directory, "params"))
    ckptr = ocp.StandardCheckpointer()
    params = ckptr.restore(path, template)
    ckptr.close()
    return params
