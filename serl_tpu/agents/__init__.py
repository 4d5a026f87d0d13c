from serl_tpu.agents.sac import SACAgent, SACConfig  # noqa: F401
