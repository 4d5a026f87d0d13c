"""Pretrained-encoder parameter grafting.

Capability parity: reference `serl_launcher/utils/train_utils.py:69-130`
(`load_resnet10_params`: download the released ImageNet ResNet-10 pickle and
graft it under every image encoder's `pretrained_encoder` subtree).

This environment has no network egress, so the loader looks for a local
pickle (env var SERL_RESNET10_PARAMS or ./resnet10_params.pkl). Absent that
the agent keeps its random init — fine for sim training, logged loudly.
"""

import logging
import os
import pickle
from typing import Tuple

import jax
import jax.numpy as jnp

log = logging.getLogger(__name__)


def _find_params_file():
    for cand in (
        os.environ.get("SERL_RESNET10_PARAMS"),
        "resnet10_params.pkl",
        os.path.expanduser("~/.serl/resnet10_params.pkl"),
    ):
        if cand and os.path.exists(cand):
            return cand
    return None


def load_resnet10_params(agent, image_keys: Tuple[str, ...] = ("image",)):
    """Graft pretrained ResNet-10 params into the shared encoder subtree
    (params live in the "critic" group, see serl_tpu/agents/sac.py)."""
    path = _find_params_file()
    if path is None:
        log.warning(
            "resnet10_params.pkl not found (set SERL_RESNET10_PARAMS); "
            "keeping randomly-initialized frozen encoder."
        )
        return agent

    with open(path, "rb") as f:
        encoder_params = pickle.load(f)

    params = jax.device_get(agent.state.params)
    count = 0
    for key in image_keys:
        subtree = params["critic"]["encoder"][f"encoder_{key}"]["pretrained_encoder"]
        for k in list(subtree.keys()):
            if k in encoder_params:
                subtree[k] = jax.tree.map(jnp.asarray, encoder_params[k])
                count += 1
            else:
                log.warning("pretrained params missing module %s", k)
    log.info("grafted %d pretrained modules from %s", count, path)

    # target params share the encoder init
    target = jax.device_get(agent.state.target_params)
    for key in image_keys:
        sub = target["critic"]["encoder"][f"encoder_{key}"]["pretrained_encoder"]
        src = params["critic"]["encoder"][f"encoder_{key}"]["pretrained_encoder"]
        for k in list(sub.keys()):
            sub[k] = jax.tree.map(lambda x: jnp.array(x, copy=True), src[k])

    new_state = agent.state.replace(params=params, target_params=target)
    return agent.replace(state=new_state)
