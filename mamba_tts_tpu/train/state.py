"""Train state + checkpointing.

The reference never saves or loads model state (SURVEY §5: ``train.py`` has
no ``torch.save`` of models) — checkpoint/resume here is a required addition:
optax Adam with global-norm clipping, orbax checkpoints of
(params, opt_state, step) every N steps, and restore-on-start.

Note: the reference clips gradients of the decoder only
(reference: train.py:234); this build clips the global norm across all
modules — the standard, and strictly safer, choice.
"""
from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import optax


@dataclasses.dataclass
class TrainState:
    step: int
    params: Any
    opt_state: Any

    def replace(self, **kw) -> "TrainState":
        return dataclasses.replace(self, **kw)


def make_optimizer(lr: float, grad_clip_norm: float = 1.0) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(grad_clip_norm),
        optax.adam(lr),
    )


def create_train_state(params, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(step=0, params=params, opt_state=tx.init(params))


# ------------------------------------------------------------- orbax ckpts


def _manager(checkpoint_dir: str):
    import orbax.checkpoint as ocp

    path = Path(checkpoint_dir).absolute()
    path.mkdir(parents=True, exist_ok=True)
    return ocp.CheckpointManager(str(path))


def save_checkpoint(checkpoint_dir: str, state: TrainState) -> None:
    import orbax.checkpoint as ocp

    mgr = _manager(checkpoint_dir)
    mgr.save(
        state.step,
        args=ocp.args.Composite(
            params=ocp.args.StandardSave(state.params),
            opt_state=ocp.args.StandardSave(state.opt_state),
        ),
    )
    mgr.wait_until_finished()
    mgr.close()


def restore_params(
    checkpoint_dir: str, params_target: Any, step: Optional[int] = None
) -> Tuple[Any, bool]:
    """Restore ONLY the params item of a checkpoint, against an ABSTRACT
    target (``jax.eval_shape`` tree of ShapeDtypeStructs) — inference-time
    loading without materializing a throwaway random init."""
    import orbax.checkpoint as ocp

    path = Path(checkpoint_dir).absolute()
    if not path.exists():
        return None, False
    mgr = _manager(checkpoint_dir)
    target = step if step is not None else mgr.latest_step()
    if target is None:
        mgr.close()
        return None, False
    restored = mgr.restore(
        target,
        args=ocp.args.Composite(params=ocp.args.StandardRestore(params_target)),
    )
    mgr.close()
    return restored.params, True


def restore_checkpoint(
    checkpoint_dir: str, state: TrainState, step: Optional[int] = None
) -> Tuple[TrainState, bool]:
    """Restore the latest (or given) step into ``state``; returns
    (state, restored?)."""
    import orbax.checkpoint as ocp

    path = Path(checkpoint_dir).absolute()
    if not path.exists():
        return state, False
    mgr = _manager(checkpoint_dir)
    target = step if step is not None else mgr.latest_step()
    if target is None:
        mgr.close()
        return state, False
    restored = mgr.restore(
        target,
        args=ocp.args.Composite(
            params=ocp.args.StandardRestore(state.params),
            opt_state=ocp.args.StandardRestore(state.opt_state),
        ),
    )
    mgr.close()
    return state.replace(step=target, params=restored.params, opt_state=restored.opt_state), True
