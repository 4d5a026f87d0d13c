"""Checkpoint / resume with orbax.

Capability beyond the reference (SURVEY.md §5): SERL can only
`flax.checkpoints.save_checkpoint(agent.state)` periodically and restore for
eval (async_sac_state_sim.py:241-245); training cannot resume mid-run except
the PCB example's manual pause path. Here the *entire fused-loop carry*
(agent train state incl. optimizers + env states + HBM replay buffer +
counters) checkpoints and resumes exactly, sharded arrays included (orbax
handles multi-host layouts).
"""

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 20):
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        self._mngr = ocp.CheckpointManager(
            directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=keep, create=True),
        )

    def save(self, step: int, tree: Any, wait: bool = False):
        self._mngr.save(step, args=ocp.args.StandardSave(_flatten_arrays(tree)))
        if wait:
            self._mngr.wait_until_finished()

    def restore(self, step: Optional[int] = None, target: Any = None) -> Any:
        step = step if step is not None else self._mngr.latest_step()
        if step is None:
            raise FileNotFoundError("no checkpoint found")
        if target is None:
            return self._mngr.restore(step)
        template = _flatten_arrays(target)
        restored = self._mngr.restore(
            step, args=ocp.args.StandardRestore(template)
        )
        return _graft(target, restored)

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def close(self):
        self._mngr.wait_until_finished()
        self._mngr.close()


def _key(path) -> str:
    # '/' can appear in dict keys (e.g. obs key "panda/tcp_pos") and would
    # nest in orbax's zarr layout — replace it
    return jax.tree_util.keystr(path).replace("/", "|")


def _is_array(x):
    import numpy as np

    return isinstance(x, (jax.Array, np.ndarray, int, float)) or hasattr(x, "shape")


def _flatten_arrays(tree) -> dict:
    """Pytree -> flat {keystr: array} dict of the array leaves only.

    Works for ANY registered pytree (flax struct.PyTreeNode, NamedTuple,
    dict, ...) because it uses standard pytree traversal — the round-1 code
    special-cased dict/list/tuple and silently dropped TrainState /
    ReplayBufferState subtrees, so "full-carry" checkpoints saved nothing.
    Non-array leaves (callables, None) are omitted and re-grafted from the
    restore target."""
    if tree is None:
        return {}
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {_key(p): v for p, v in leaves if _is_array(v)}


def _graft(target, flat: dict):
    """Place restored arrays back into `target` by pytree path; leaves absent
    from the checkpoint keep the target's value."""
    paths, treedef = jax.tree_util.tree_flatten_with_path(target)
    vals = [flat.get(_key(p), v) for p, v in paths]
    return jax.tree_util.tree_unflatten(treedef, vals)


def save_agent_checkpoint(path: str, agent, step: int, keep: int = 20):
    """Reference-style convenience: checkpoint just the agent train state
    (flax checkpoints.save_checkpoint parity)."""
    mngr = CheckpointManager(path, keep=keep)
    mngr.save(step, agent.state.params | {"_target": agent.state.target_params})
    mngr.close()


def restore_agent_params(path: str, agent, step: Optional[int] = None):
    mngr = CheckpointManager(path)
    tree = agent.state.params | {"_target": agent.state.target_params}
    restored = mngr.restore(step, target=tree)
    target = restored.pop("_target")
    new_state = agent.state.replace(params=restored, target_params=target)
    mngr.close()
    return agent.replace(state=new_state)
