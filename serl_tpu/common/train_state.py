"""Multi-group train state for RL agents.

TPU-first re-design of the reference's `JaxRLTrainState`
(`serl_launcher/common/common.py:81-245`). The reference computes, for every
loss, a gradient over the *full* parameter tree (zeros where the loss does not
touch a network) and sums updates from three Adam instances each spanning all
parameters. Here parameters are partitioned into explicit named *groups*
("actor", "critic", "temperature", ...); each group has its own optimizer and
each loss differentiates only its own group — mathematically identical (the
extra reference gradients are structurally zero) but with ~3x less optimizer
state and no wasted HBM traffic.

Everything is a flat pytree so the whole state can be sharded with
`jax.NamedSharding` and carried through `lax.scan` (high-UTD loops) and fused
actor/learner device loops.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from serl_tpu.common.typing import Params, PRNGKey

nonpytree_field = functools.partial(struct.field, pytree_node=False)

# A loss function takes (full params dict, rng) and returns (scalar, aux dict).
LossFn = Callable[[Params, PRNGKey], Tuple[jax.Array, Dict[str, jax.Array]]]


class TrainState(struct.PyTreeNode):
    """Train state over named parameter groups.

    Attributes:
        step: number of optimizer applications so far.
        params: dict mapping group name -> parameter pytree.
        target_params: dict mapping a subset of group names -> EMA copies
            (polyak-averaged target networks; reference `common.py:124-134`).
        opt_states: dict mapping group name -> optax optimizer state.
        rng: internal PRNG key consumed by `apply_loss_fns`.
        txs: dict mapping group name -> optax GradientTransformation (static).
    """

    step: jax.Array
    params: Params
    target_params: Params
    opt_states: Any
    rng: PRNGKey
    txs: Any = nonpytree_field()

    @classmethod
    def create(cls, *, params, txs, target_groups=(), rng=None):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        assert set(txs.keys()) <= set(params.keys()), (txs.keys(), params.keys())
        opt_states = {g: tx.init(params[g]) for g, tx in txs.items()}
        # materialize independent copies: target params must not alias params
        # (aliased buffers break XLA donation in fused loops)
        target_params = {
            g: jax.tree.map(lambda x: jnp.array(x, copy=True), params[g])
            for g in target_groups
        }
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            target_params=target_params,
            opt_states=opt_states,
            rng=rng,
            txs=txs,
        )

    def target_update(self, tau: float) -> "TrainState":
        """Polyak-average target params toward current params.

        new_target = tau * params + (1 - tau) * target  (common.py:124-134).
        """
        new_targets = {
            g: jax.tree.map(
                lambda p, tp: p * tau + tp * (1.0 - tau), self.params[g], tp_tree
            )
            for g, tp_tree in self.target_params.items()
        }
        return self.replace(target_params=new_targets)

    def apply_gradients(self, *, grads: Dict[str, Params]) -> "TrainState":
        """Apply per-group gradients with each group's own optimizer."""
        new_params = dict(self.params)
        new_opt_states = dict(self.opt_states)
        for g, grad in grads.items():
            updates, new_opt = self.txs[g].update(
                grad, self.opt_states[g], self.params[g]
            )
            new_params[g] = jax.tree.map(jnp.add, self.params[g], updates)
            new_opt_states[g] = new_opt
        return self.replace(
            step=self.step + 1, params=new_params, opt_states=new_opt_states
        )

    def apply_loss_fns(
        self, loss_fns: Dict[str, LossFn], pmean_axis: str = None
    ) -> Tuple["TrainState", Dict[str, Any]]:
        """Differentiate each loss w.r.t. its own group and step the optimizers.

        Each loss fn sees the *full* params dict but gradients are taken only
        w.r.t. its named group (other groups enter as constants — exactly the
        nonzero blocks of the reference's full-tree gradients,
        `common.py:170-221`). `pmean_axis` all-reduces grads when running under
        `shard_map`; under plain GSPMD-sharded jit it should stay None (XLA
        inserts the collectives from shardings).
        """
        names = sorted(loss_fns.keys())
        new_rng, *keys = jax.random.split(self.rng, len(names) + 1)
        rngs = dict(zip(names, keys))

        grads: Dict[str, Params] = {}
        aux: Dict[str, Any] = {}
        for g in names:
            def group_loss(group_params, _g=g):
                full = dict(self.params)
                full[_g] = group_params
                return loss_fns[_g](full, rngs[_g])

            grad, info = jax.grad(group_loss, has_aux=True)(self.params[g])
            if pmean_axis is not None:
                grad = jax.lax.pmean(grad, axis_name=pmean_axis)
                info = jax.lax.pmean(info, axis_name=pmean_axis)
            grads[g] = grad
            aux[g] = info

        new_state = self.replace(rng=new_rng).apply_gradients(grads=grads)
        return new_state, aux
