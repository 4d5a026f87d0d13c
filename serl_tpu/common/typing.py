"""Type aliases shared across serl_tpu.

Capability parity: reference `serl_launcher/common/typing.py`.
"""

from typing import Any, Dict, Mapping, Union

import jax

PRNGKey = jax.Array
Params = Any  # nested dict of arrays
Data = Union[jax.Array, Mapping[str, "Data"]]
Batch = Dict[str, Data]
Info = Dict[str, Any]
