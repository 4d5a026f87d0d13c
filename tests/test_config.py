"""Unified WorkloadConfig (SURVEY §5 config-unification): presets must
round-trip into the loop/runner/transport configs both execution modes
consume."""

import argparse

from serl_tpu.training.config import PRESETS, WorkloadConfig
from serl_tpu.training.loop import LoopConfig


def test_presets_build_loop_configs():
    for name, cfg in PRESETS.items():
        lc = LoopConfig(**cfg.loop_overrides())
        assert lc.batch_size == cfg.batch_size, name
        assert lc.utd_ratio == cfg.utd_ratio, name
        assert lc.intervention_mode in ("step", "episode"), name


def test_trainer_config_ports():
    cfg = WorkloadConfig.preset("state_sim", port=6000)
    tc = cfg.trainer_config()
    assert tc.port_number == 6000
    assert tc.broadcast_port == 6001


def test_runner_kwargs_match_run_fused_signature():
    import inspect

    from serl_tpu.training.runner import run_fused

    params = set(inspect.signature(run_fused).parameters)
    for k in WorkloadConfig().runner_kwargs():
        assert k in params, f"runner_kwargs field {k} not accepted by run_fused"


def test_cli_roundtrip():
    p = argparse.ArgumentParser()
    WorkloadConfig.add_args(p, preset="drq_sim")
    args = p.parse_args(["--utd_ratio", "2", "--num_envs", "4"])
    cfg = WorkloadConfig.from_args(args)
    assert cfg.utd_ratio == 2 and cfg.num_envs == 4
    # untouched fields keep the preset values
    assert cfg.algo == "drq" and cfg.discount == 0.96


def test_proven_recipe_presets():
    """Presets pin the PROVEN solving recipes (results/RESULTS.md)."""
    s = PRESETS["state_sim"]
    assert (s.num_envs, s.utd_ratio, s.updates_per_iter) == (32, 8, 4)
    d = PRESETS["drq_sim"]
    assert (d.num_envs, d.utd_ratio, d.updates_per_iter) == (16, 4, 2)
