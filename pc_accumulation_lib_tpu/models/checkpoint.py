"""Model / train-state checkpointing.

The reference consumes a frozen ONNX file and has no checkpoint/resume
story (SURVEY.md section 5). Here: orbax-backed train-state checkpoints
(sharding-aware, async-capable) plus a lightweight flax-serialization
format for inference weights (consumed by models.semseg.load_semseg_model).
"""
from __future__ import annotations

import os
from typing import Any, Optional


def save_semseg_weights(model, path: str) -> None:
    """Serialize a SemSegTPU's variables (flax msgpack);
    load_semseg_model(path) restores them."""
    import flax.serialization as ser
    with open(path, 'wb') as f:
        f.write(ser.to_bytes(model.variables))


def save_train_state(ckpt_dir: str, step: int, state: Any) -> None:
    """Orbax checkpoint of a models.train.TrainState."""
    import orbax.checkpoint as ocp
    ckpt_dir = os.path.abspath(ckpt_dir)
    with ocp.CheckpointManager(ckpt_dir) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(state))
        mgr.wait_until_finished()


def restore_train_state(ckpt_dir: str, abstract_state: Any,
                        step: Optional[int] = None) -> Any:
    """Restore the latest (or given) step into the structure of
    ``abstract_state`` (a concrete TrainState template)."""
    import orbax.checkpoint as ocp
    ckpt_dir = os.path.abspath(ckpt_dir)
    with ocp.CheckpointManager(ckpt_dir) as mgr:
        step = mgr.latest_step() if step is None else step
        return mgr.restore(step,
                           args=ocp.args.StandardRestore(abstract_state))
