"""Diagnostic probe for the peg-insert sparse-reward recipe (VERDICT r2 #2).

Trains the E3 analogue (fused_peg_insert) while logging the quantities that
tell us WHERE learning stalls:
  * Q on demo reward-1 (terminal-success) transitions — critic must drive
    these to ~1 or the demo signal is not being consumed,
  * Q on demo early-episode transitions — value must propagate backwards,
  * temperature + policy entropy — a runaway alpha keeps the argmax policy
    at zero-action hover,
  * eval: per-dim final pose error of the argmax policy — which success dim
    (xyz / roll / pitch / yaw) is failing.

Usage: python tools/probe_peg.py --total_steps 24000 --intervention_prob 0.3
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from serl_tpu.data import demos as demo_lib
from serl_tpu.data.replay_buffer import ReplayBuffer
from serl_tpu.envs.scripted_expert import pose_expert_action
from serl_tpu.envs.tasks import PEG_INSERT_CONFIG, PandaPoseTaskEnv
from serl_tpu.training.launcher import make_sac_agent
from serl_tpu.training.loop import LoopConfig, make_fused_loop

OBS_DIM, ACT_DIM = 13, 7


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--num_envs", type=int, default=16)
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--utd_ratio", type=int, default=4)
    p.add_argument("--num_demos", type=int, default=20)
    p.add_argument("--intervention_prob", type=float, default=0.3)
    p.add_argument("--intervention_mode", default="episode")
    p.add_argument("--intervention_decay_steps", type=int, default=None)
    p.add_argument("--discount", type=float, default=0.97)
    p.add_argument("--total_steps", type=int, default=24000)
    p.add_argument("--eval_period", type=int, default=4000)
    args = p.parse_args()

    env = PandaPoseTaskEnv(config=PEG_INSERT_CONFIG)
    cfg = PEG_INSERT_CONFIG
    expert = lambda s: pose_expert_action(
        s, jnp.asarray(cfg.target_pose), jnp.asarray(cfg.action_scale)
    )

    trans = demo_lib.collect_episodes(
        env,
        lambda states, rng: jax.vmap(expert)(states),
        jax.random.PRNGKey(args.seed + 1000),
        num_episodes=args.num_demos,
        episode_len=cfg.time_limit_steps,
        auto_reset=True,
    )
    succ = float(jnp.mean(trans.pop("success")))
    print(f"demo mean per-step success {succ:.3f}")
    rew = trans["rewards"]
    print(
        f"demo transitions: {rew.shape[0]}, episodes {float(trans['dones'].sum()):.0f}, "
        f"reward>0 frac {float((rew > 0).mean()):.3f}, mask0 frac "
        f"{float((trans['masks'] < 0.5).mean()):.3f}"
    )
    ex = {
        k: jax.tree.map(lambda x: x[0], v)
        for k, v in trans.items()
        if k != "ep_ids"
    }
    demo_rb = ReplayBuffer(ex, capacity=args.num_demos * cfg.time_limit_steps)
    demo_state = demo_lib.demos_to_buffer(
        demo_rb, trans, episode_len=cfg.time_limit_steps
    )

    # fixed probe batches straight from the demo transitions
    pos_idx = jnp.where(rew > 0, size=min(256, int((rew > 0).sum())))[0]
    early_idx = jnp.arange(0, rew.shape[0], cfg.time_limit_steps)  # step-0 rows
    probe_pos = {k: trans[k][pos_idx] for k in
                 ("observations", "actions")}
    probe_early = {k: trans[k][early_idx] for k in
                   ("observations", "actions")}

    config = LoopConfig(
        num_envs=args.num_envs,
        batch_size=args.batch_size,
        utd_ratio=args.utd_ratio,
        updates_per_iter=1,
        training_starts=1000,
        random_steps=1000,
        buffer_capacity=(100_000 // args.num_envs) * args.num_envs,
        demo_fraction=0.5,
        intervention_prob=args.intervention_prob,
        intervention_mode=args.intervention_mode,
        intervention_decay_steps=args.intervention_decay_steps,
    )
    rb = ReplayBuffer(
        {
            "observations": jnp.zeros((OBS_DIM,)),
            "actions": jnp.zeros((ACT_DIM,)),
            "next_observations": jnp.zeros((OBS_DIM,)),
            "rewards": jnp.zeros(()),
            "masks": jnp.zeros(()),
            "dones": jnp.zeros(()),
        },
        capacity=config.buffer_capacity,
    )
    agent = make_sac_agent(
        args.seed, obs_dim=OBS_DIM, action_dim=ACT_DIM, discount=args.discount
    )
    init_fn, run_chunk = make_fused_loop(env, rb, config, expert_fn=expert)
    carry = init_fn(agent, jax.random.PRNGKey(args.seed), demo_state=demo_state)

    @jax.jit
    def probe(agent):
        q_pos = agent.forward_critic(
            probe_pos["observations"], probe_pos["actions"], rng=None
        ).mean()
        q_early = agent.forward_critic(
            probe_early["observations"], probe_early["actions"], rng=None
        ).mean()
        return q_pos, q_early

    @jax.jit
    def eval_rollout(agent, keys):
        states, obs = jax.vmap(env.reset)(keys)

        def body(carry, _):
            states, obs, succ = carry
            from serl_tpu.envs.panda_pick import flatten_obs

            actions = agent.sample_actions(flatten_obs(obs), argmax=True)
            states, obs, r, d, info = jax.vmap(env.step)(states, actions)
            succ = jnp.maximum(succ, info["success"])
            return (states, obs, succ), None

        n = keys.shape[0]
        (states, obs, succ), _ = jax.lax.scan(
            body, (states, obs, jnp.zeros(n)), None, length=cfg.time_limit_steps
        )
        pose = jax.vmap(env._pose)(states)
        err = jnp.abs(pose - jnp.asarray(cfg.target_pose))
        err = err.at[:, 3:].set(jnp.minimum(err[:, 3:], 2 * jnp.pi - err[:, 3:]))
        return succ.mean(), err.mean(axis=0)

    chunk = max(args.eval_period // config.num_envs, 1)
    t0 = time.time()
    prev_ep, prev_suc = 0, 0.0
    while int(carry.env_steps) < args.total_steps:
        carry, m = run_chunk(carry, chunk)
        steps = int(carry.env_steps)
        ep = int(m["ep_count"][-1])
        suc = float(m["succ_sum"][-1])
        train_succ = (suc - prev_suc) / max(ep - prev_ep, 1)
        prev_ep, prev_suc = ep, suc
        q_pos, q_early = probe(carry.agent)
        ev_succ, ev_err = eval_rollout(
            carry.agent, jax.random.split(jax.random.PRNGKey(steps), 32)
        )
        temp = float(m["temperature"][-1])
        ent = float(m["entropy"][-1])
        print(
            f"steps {steps} ({steps/(time.time()-t0):.0f}/s) "
            f"train_succ {train_succ:.2f} eval_succ {float(ev_succ):.2f} | "
            f"Q_pos {float(q_pos):.3f} Q_early {float(q_early):.3f} "
            f"alpha {temp:.4f} H {ent:.2f} | "
            f"err xyz {ev_err[0]:.3f},{ev_err[1]:.3f},{ev_err[2]:.3f} "
            f"rpy {ev_err[3]:.3f},{ev_err[4]:.3f},{ev_err[5]:.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
