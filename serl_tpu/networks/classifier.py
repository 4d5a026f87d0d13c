"""Binary reward classifiers.

Capability parity: reference `serl_launcher/networks/classifier.py:5-27`
(BinaryClassifier with encoded pass-through for VICE) and
`networks/reward_classifier.py` (`create_classifier` :31-89 with frozen
pretrained ResNet-10 per image key, `load_classifier_func` :92-113 returning
a jitted obs -> logit function). Used by the classifier-reward wrappers
(BinaryRewardClassifierWrapper) and VICE.
"""

from typing import Callable, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
from flax import struct

from serl_tpu.common.train_state import nonpytree_field


class BinaryClassifier(nn.Module):
    """Encoder + MLP head -> logit. Supports returning the encoded features
    (`return_encoded`) and classifying pre-encoded features
    (`classify_encoded`) for VICE's mixup/gradient-penalty in feature space."""

    encoder_def: nn.Module
    hidden_dim: int = 256

    @nn.compact
    def __call__(
        self,
        x,
        train: bool = False,
        return_encoded: bool = False,
        classify_encoded: bool = False,
    ):
        if not classify_encoded:
            x = self.encoder_def(x, train=train)
            if return_encoded:
                return x
        x = nn.Dense(self.hidden_dim)(x)
        x = nn.Dropout(0.1)(x, deterministic=not train)
        x = nn.LayerNorm()(x)
        x = nn.relu(x)
        x = nn.Dense(1)(x)
        return jnp.squeeze(x, -1)


class ClassifierState(struct.PyTreeNode):
    step: jax.Array
    params: dict
    opt_state: optax.OptState
    apply_fn: Callable = nonpytree_field()
    tx: optax.GradientTransformation = nonpytree_field()

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=jax.tree.map(jnp.add, self.params, updates),
            opt_state=new_opt,
        )


def create_classifier(
    key: jnp.ndarray,
    sample: Dict,
    image_keys: Tuple[str, ...],
    encoder_type: str = "resnet-pretrained",
    learning_rate: float = 1e-4,
) -> ClassifierState:
    """Frozen pretrained ResNet-10 per image key + trainable pooling/classifier
    head (reference reward_classifier.py:31-89)."""
    from serl_tpu.agents.drq import make_image_encoders
    from serl_tpu.vision.encoding import ObsEncoder

    encoders = make_image_encoders(encoder_type, image_keys)
    encoder_def = ObsEncoder(
        encoders=encoders,
        use_proprio=False,
        enable_stacking=True,
        image_keys=tuple(image_keys),
    )
    classifier_def = BinaryClassifier(encoder_def=encoder_def)
    params = classifier_def.init(key, sample)["params"]
    state = ClassifierState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=optax.adam(learning_rate).init(params),
        apply_fn=classifier_def.apply,
        tx=optax.adam(learning_rate),
    )
    if encoder_type == "resnet-pretrained":
        state = _graft_pretrained(state, image_keys)
    return state


def _graft_pretrained(state: ClassifierState, image_keys):
    from serl_tpu.utils.pretrained import _find_params_file
    import pickle

    path = _find_params_file()
    if path is None:
        return state
    with open(path, "rb") as f:
        encoder_params = pickle.load(f)
    params = jax.device_get(state.params)
    for key in image_keys:
        tree = params["encoder_def"][f"encoder_{key}"].get("pretrained_encoder")
        if tree is None:
            continue
        for k in list(tree.keys()):
            if k in encoder_params:
                tree[k] = jax.tree.map(jnp.asarray, encoder_params[k])
    return state.replace(params=params)


@jax.jit
def classifier_train_step(state: ClassifierState, batch: Dict, rng: jnp.ndarray):
    """One BCE step on {"observations": obs_dict, "labels": (B,)} (reference
    train_reward_classifier.py train_step)."""

    def loss_fn(params):
        logits = state.apply_fn(
            {"params": params},
            batch["observations"],
            train=True,
            rngs={"dropout": rng},
        )
        loss = optax.sigmoid_binary_cross_entropy(logits, batch["labels"]).mean()
        acc = ((logits > 0) == (batch["labels"] > 0.5)).mean()
        return loss, acc

    (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    return state.apply_gradients(grads), {"loss": loss, "accuracy": acc}


def classifier_fn(state: ClassifierState) -> Callable:
    """obs -> logit, jitted (reference load_classifier_func :109-113)."""

    @jax.jit
    def fn(obs):
        return state.apply_fn({"params": state.params}, obs, train=False)

    return fn


def save_classifier(state: ClassifierState, path: str, step: Optional[int] = None):
    import pickle

    with open(path, "wb") as f:
        pickle.dump(jax.device_get(state.params), f)


def load_classifier_func(
    key: jnp.ndarray,
    sample: Dict,
    image_keys: Tuple[str, ...],
    checkpoint_path: str,
) -> Callable:
    """Rebuild the classifier and load trained params -> jitted obs->logit."""
    import pickle

    state = create_classifier(key, sample, image_keys)
    with open(checkpoint_path, "rb") as f:
        params = pickle.load(f)
    state = state.replace(params=jax.tree.map(jnp.asarray, params))
    return classifier_fn(state)
