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
        self._mngr.save(step, args=ocp.args.StandardSave(_strip(tree)))
        if wait:
            self._mngr.wait_until_finished()

    def restore(self, step: Optional[int] = None, target: Any = None) -> Any:
        step = step if step is not None else self._mngr.latest_step()
        if step is None:
            raise FileNotFoundError("no checkpoint found")
        restored = self._mngr.restore(
            step, args=ocp.args.StandardRestore(_strip(target))
        )
        if target is None:
            return restored
        return _graft(target, restored)

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def close(self):
        self._mngr.wait_until_finished()
        self._mngr.close()


def _strip(tree):
    """Remove non-array leaves (callables/None) that orbax can't serialize;
    structure is re-grafted on restore."""
    if tree is None:
        return None
    return jax.tree.map(
        lambda x: x if _is_array(x) else None,
        tree,
        is_leaf=lambda x: not isinstance(x, (dict, list, tuple)) or x is None,
    )


def _is_array(x):
    import numpy as np

    return isinstance(x, (jax.Array, np.ndarray, int, float)) or hasattr(x, "shape")


def _graft(target, restored):
    """Take arrays from `restored` where present, else keep `target`."""
    return jax.tree.map(
        lambda t, r: t if r is None else r,
        target,
        restored,
        is_leaf=lambda x: x is None or not isinstance(x, (dict, list, tuple)),
    )


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
