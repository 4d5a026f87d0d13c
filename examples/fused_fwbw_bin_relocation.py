"""Forward/backward bin relocation with dual policies — fully fused.

Workload parity: reference `examples/async_bin_relocation_fwbw_drq` (E6):
two policies (fw, bw), each with its own replay buffer and learner, trained
while the robot alternates moving the cube between bins. Here both
agent+buffer pairs and the env batch run in ONE jit program
(serl_tpu/training/fwbw.py); the reference's sequential task handoff is
preserved in evaluation (`evaluate_chained`: fw rollout -> physical state
handed to bw with no reset -> round-trip success).

Proven recipe (results/RESULTS.md; fresh-seed round-trip 0.42 from pixels,
0.44 from state):
    python examples/fused_fwbw_bin_relocation.py --sparse \
        --demo_reset_prob 0.5 --bc_weight 0.3 --num_demos 100 \
        --handoff_aug --discount 0.98 --intervention_decay_steps 300000 \
        --intervention_min_prob 0.05 --total_steps 2500000
    # DrQ from front+wrist cameras (the reference's E6 class): add
    # --pixels --num_demos 20 --total_steps 600000 --intervention_decay_steps 150000
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
from serl_tpu.envs.scripted_expert import relocation_expert_action
from serl_tpu.envs.tasks import BinRelocationEnv
from serl_tpu.training.fwbw import (
    FwBwConfig,
    evaluate_chained,
    make_fwbw_loop,
)
from serl_tpu.training.launcher import (
    make_drq_agent,
    make_pixel_replay_buffer,
    make_sac_agent,
)

OBS_DIM = 13  # tcp_pose(6) + tcp_vel(3) + gripper(1) + block_pos(3)
PIXEL_STATE_DIM = 10  # pixel mode proprio (no block_pos: the cameras see it)
ACT_DIM = 7
IMAGE_KEYS = ("front", "wrist")


def collect_handoff_states(env, num_states, seed):
    """States where the task's expert just delivered the cube — the exact
    distribution the NEXT policy faces at the task-graph switch (arm low
    over the delivery bin, gripper just opened, cube settling wherever it
    was dropped, incl. near walls). Chained-eval's bw|fw stays far below
    bw-solo unless bw TRAINS on this distribution."""
    from serl_tpu.envs.scripted_expert import relocation_expert_action

    n = max(num_states // 2, 8)
    tgt = env.FW_BIN if env.task_id == 0 else env.BW_BIN
    expert = lambda s: relocation_expert_action(
        s, tgt, jnp.asarray(env.config.action_scale)
    )

    @jax.jit
    def rollout(keys):
        states, _ = jax.vmap(env.reset)(keys)

        def body(carry, _):
            states, succ = carry
            a = jax.vmap(expert)(states)
            new_states, _, r, d, info = jax.vmap(env.step)(states, a)
            frozen = succ > 0.5
            sel = lambda x, y: jnp.where(
                frozen.reshape((-1,) + (1,) * (x.ndim - 1)), x, y
            )
            states = jax.tree.map(sel, states, new_states)
            succ = jnp.maximum(succ, info["success"])
            return (states, succ), None

        (states, succ), _ = jax.lax.scan(
            body, (states, jnp.zeros(n)), None, length=100
        )
        return states._replace(t=jnp.zeros_like(states.t)), succ

    banks, keep = [], []
    for i in range(2):
        keys = jax.random.split(jax.random.PRNGKey(seed + i), n)
        states, succ = rollout(keys)
        banks.append(states)
        keep.append(succ > 0.5)
    import numpy as np

    bank = jax.tree.map(lambda a, b: jnp.concatenate([a, b]), *banks)
    mask = np.asarray(jnp.concatenate(keep))
    # keep only successful deliveries; wrap to num_states (bank sampling is
    # uniform so duplicates are harmless)
    idx = jnp.asarray(np.resize(np.nonzero(mask)[0], num_states))
    return jax.tree.map(lambda x: x[idx], bank), float(mask.mean())


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--envs_per_task", type=int, default=16)
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--utd_ratio", type=int, default=4)
    p.add_argument("--training_starts", type=int, default=2000)
    p.add_argument("--random_steps", type=int, default=2000)
    # annealed-intervention recipe proven on peg insert (RESULTS.md)
    p.add_argument("--intervention_prob", type=float, default=0.5)
    p.add_argument("--intervention_mode", default="episode",
                   choices=["step", "episode", "rescue"])
    p.add_argument("--intervention_decay_steps", type=int, default=100_000)
    p.add_argument("--intervention_min_prob", type=float, default=0.0)
    p.add_argument("--discount", type=float, default=0.97)
    p.add_argument("--num_demos", type=int, default=20)
    p.add_argument("--sparse", action="store_true",
                   help="sparse success reward + early termination "
                        "(reference classifier-reward semantics) instead of "
                        "reach/lift/carry shaping")
    # reverse curriculum: fraction of episodes that start from a random
    # expert-visited state (mid-grasp / mid-carry / over-bin), making sparse
    # reward reachable from late-phase states first
    p.add_argument("--demo_reset_prob", type=float, default=0.0)
    # Q-filtered BC auxiliary on the actor (SACfD shape) — demo-heavy sparse
    # recipes benefit; self-anneals once the policy's Q beats the demos'
    p.add_argument("--bc_weight", type=float, default=0.0)
    # make half of bw's demos/reset states start from fw-expert handoff
    # states (the chained-eval switch distribution)
    p.add_argument("--handoff_aug", action="store_true")
    # DrQ from front+wrist cameras (the reference E6 workload class)
    p.add_argument("--pixels", action="store_true")
    p.add_argument("--image_size", type=int, default=128)
    p.add_argument("--total_steps", type=int, default=200_000)
    p.add_argument("--eval_period", type=int, default=8000)
    p.add_argument("--log", type=str, default=None)
    args = p.parse_args()

    env_kwargs = dict(
        dense_shaping=not args.sparse,
        image_obs=args.pixels,
        render_size=args.image_size,
    )
    fw_env = BinRelocationEnv(task_id=0, **env_kwargs)
    bw_env = BinRelocationEnv(task_id=1, **env_kwargs)

    config = FwBwConfig(
        envs_per_task=args.envs_per_task,
        batch_size=args.batch_size,
        utd_ratio=args.utd_ratio,
        training_starts=args.training_starts,
        random_steps=args.random_steps,
        buffer_capacity=(
            (20_000 if args.pixels else 200_000) // args.envs_per_task
        ) * args.envs_per_task,
        demo_fraction=0.5 if args.num_demos > 0 else 0.0,
        intervention_prob=args.intervention_prob,
        intervention_mode=args.intervention_mode,
        intervention_decay_steps=args.intervention_decay_steps,
        intervention_min_prob=args.intervention_min_prob,
    )
    example = {
        "observations": jnp.zeros((OBS_DIM,)),
        "actions": jnp.zeros((ACT_DIM,)),
        "next_observations": jnp.zeros((OBS_DIM,)),
        "rewards": jnp.zeros(()),
        "masks": jnp.zeros(()),
        "dones": jnp.zeros(()),
    }
    if args.pixels:
        from serl_tpu.envs.wrappers import add_stack_axis, serl_obs

        rb = make_pixel_replay_buffer(
            capacity=config.buffer_capacity,
            image_keys=IMAGE_KEYS,
            image_size=args.image_size,
            state_dim=PIXEL_STATE_DIM,
            action_dim=ACT_DIM,
        )
        shapes = jax.eval_shape(
            lambda k: jax.tree.map(
                lambda x: x[None],
                add_stack_axis(serl_obs(fw_env.reset(k)[1]), rb.image_keys),
            ),
            jax.random.PRNGKey(0),
        )
        sample = jax.tree.map(lambda sh: jnp.zeros(sh.shape, sh.dtype), shapes)

        def _make_pixel_agent(seed):
            agent = make_drq_agent(
                seed, sample, jnp.zeros((1, ACT_DIM)),
                image_keys=rb.image_keys, encoder_type="small",
                discount=args.discount,
            )
            if args.bc_weight > 0:
                agent = agent.replace(config=agent.config._replace(
                    bc_regularization=args.bc_weight))
            return agent

        fw_agent = _make_pixel_agent(args.seed)
        bw_agent = _make_pixel_agent(args.seed + 1)
    else:
        rb = ReplayBuffer(example, capacity=config.buffer_capacity)
        fw_agent = make_sac_agent(args.seed, obs_dim=OBS_DIM,
                                  action_dim=ACT_DIM,
                                  discount=args.discount,
                                  bc_regularization=args.bc_weight)
        bw_agent = make_sac_agent(args.seed + 1, obs_dim=OBS_DIM,
                                  action_dim=ACT_DIM, discount=args.discount,
                                  bc_regularization=args.bc_weight)

    out = open(args.log, "a") if args.log else sys.stdout

    # handoff-state bank: the chained eval hands bw the state where fw just
    # delivered — a distribution bw's clean resets never cover (lower arm,
    # freshly-opened gripper, settling cube, possibly near a wall, rotated
    # yaw). Collecting fw-expert deliveries and making HALF of bw's demos
    # and reset states start there closes the bw|fw << bw-solo gap.
    handoff_banks = {}
    handoff_envs = {}
    if args.handoff_aug:
        for task_id in (0, 1):
            # task task_id's handoff bank = states the OTHER task's expert
            # delivers into (bw starts where fw ended and vice versa)
            # state-bank collection never renders (EnvState is shared
            # across obs modes) — keep the fast state env here
            other = BinRelocationEnv(
                task_id=1 - task_id, dense_shaping=not args.sparse
            )
            bank, dfrac = collect_handoff_states(
                other, num_states=256, seed=args.seed + 9000 + task_id,
            )
            handoff_banks[task_id] = bank
            print(
                f"task {task_id} handoff bank: 256 states "
                f"(delivery rate {dfrac:.2f})",
                file=out, flush=True,
            )
            henv = BinRelocationEnv(task_id=task_id, **env_kwargs)
            henv.set_demo_reset_bank(bank, 0.5)
            handoff_envs[task_id] = henv

    # per-task RLPD demos: auto-reset scripted relocation episodes (every
    # row an approach/carry step — see the peg recipe, RESULTS.md)
    fw_demo = bw_demo = None
    if args.num_demos > 0:
        demos = {}
        for name, env in (("fw", fw_env), ("bw", bw_env)):
            tgt = env.FW_BIN if env.task_id == 0 else env.BW_BIN
            expert = lambda s, _tgt=tgt, _env=env: relocation_expert_action(
                s, _tgt, jnp.asarray(_env.config.action_scale)
            )
            demo_env = env
            if handoff_envs:
                demo_env = handoff_envs[env.task_id]  # half-handoff resets
            trans = demo_lib.collect_episodes(
                demo_env,
                lambda states, rng, _e=expert: jax.vmap(_e)(states),
                jax.random.PRNGKey(args.seed + 1000 + env.task_id),
                num_episodes=args.num_demos,
                episode_len=env.time_limit_steps,
                pixel_obs=args.pixels,
                auto_reset=True,
            )
            succ = float(jnp.mean(trans.pop("success")))
            episodes = float(jnp.sum(trans["dones"]))
            if args.pixels:
                trans.pop("next_observations", None)  # mem-efficient buffer
                demo_rb = make_pixel_replay_buffer(
                    capacity=args.num_demos * env.time_limit_steps,
                    image_keys=IMAGE_KEYS,
                    image_size=args.image_size,
                    state_dim=PIXEL_STATE_DIM,
                    action_dim=ACT_DIM,
                )
            else:
                ex = {k: jax.tree.map(lambda x: x[0], v)
                      for k, v in trans.items() if k != "ep_ids"}
                demo_rb = ReplayBuffer(
                    ex, capacity=args.num_demos * env.time_limit_steps
                )
            demos[name] = demo_lib.demos_to_buffer(
                demo_rb, trans, episode_len=env.time_limit_steps
            )
            print(
                f"{name} demos: {args.num_demos * env.time_limit_steps} rows, "
                f"{episodes:.0f} episodes, success-step frac {succ:.2f}",
                file=out, flush=True,
            )
        fw_demo, bw_demo = demos["fw"], demos["bw"]

    # reverse-curriculum reset banks from expert-visited states
    if args.demo_reset_prob > 0.0:
        for env in (fw_env, bw_env):
            tgt = env.FW_BIN if env.task_id == 0 else env.BW_BIN
            expert = lambda s, _tgt=tgt, _env=env: relocation_expert_action(
                s, _tgt, jnp.asarray(_env.config.action_scale)
            )
            bank_env = env
            if handoff_envs:
                bank_env = handoff_envs[env.task_id]
            bank = demo_lib.collect_state_bank(
                bank_env,
                lambda states, rng, _e=expert: jax.vmap(_e)(states),
                jax.random.PRNGKey(args.seed + 5000 + env.task_id),
                num_streams=8,
                steps=env.time_limit_steps,
            )
            if handoff_banks:
                # training resets draw from expert states AND raw handoff
                # states
                bank = jax.tree.map(
                    lambda a, b: jnp.concatenate([a, b]),
                    bank, handoff_banks[env.task_id],
                )
            env.set_demo_reset_bank(bank, args.demo_reset_prob)
            print(
                f"task {env.task_id}: demo-reset bank of "
                f"{jax.tree.leaves(bank)[0].shape[0]} states "
                f"(p={args.demo_reset_prob})",
                file=out, flush=True,
            )

    # eval must see the true task distribution: clean envs, no reset bank
    eval_fw_env = BinRelocationEnv(task_id=0, **env_kwargs)
    eval_bw_env = BinRelocationEnv(task_id=1, **env_kwargs)

    init_fn, run_chunk = make_fwbw_loop(fw_env, bw_env, rb, config)
    carry = init_fn(
        fw_agent, bw_agent, jax.random.PRNGKey(args.seed),
        fw_demo=fw_demo, bw_demo=bw_demo,
    )
    chunk = max(args.eval_period // (2 * config.envs_per_task), 1)
    t0 = time.time()
    prev = {"fw": (0, 0.0, 0.0), "bw": (0, 0.0, 0.0)}
    # checkpoint selection: SAC on sparse long-horizon tasks oscillates
    # between evals; keep the TOP-K fw/bw snapshots (the reference's human
    # effectively does this by watching the run and stopping at a good
    # policy). bw snapshots are ranked by bw|fw (the handoff metric — a
    # bw that excels from clean resets can still fail the chained switch);
    # the final pair is picked by a round-trip TOURNAMENT and the winner is
    # re-evaluated on FRESH seeds to avoid selection bias.
    TOP_K = 3
    top = {"fw": [], "bw": []}  # lists of (score, agent-snapshot)

    def _push(lst, score, agent):
        lst.append((score, agent))
        lst.sort(key=lambda t: -t[0])
        del lst[TOP_K:]
    while int(carry.env_steps) < args.total_steps:
        carry, m = run_chunk(carry, chunk)
        steps = int(carry.env_steps)
        line = f"steps {steps} ({steps/(time.time()-t0):.0f}/s)"
        for task in ("fw", "bw"):
            ep = int(m[f"{task}/ep_count"][-1])
            ret = float(m[f"{task}/ret_sum"][-1])
            suc = float(m[f"{task}/succ_sum"][-1])
            p_ep, p_ret, p_suc = prev[task]
            d_ep = max(ep - p_ep, 1)
            line += (
                f" {task}[succ {(suc-p_suc)/d_ep:.2f} ret {(ret-p_ret)/d_ep:.1f}]"
            )
            prev[task] = (ep, ret, suc)
        ev = evaluate_chained(
            eval_fw_env, eval_bw_env, carry.fw.agent, carry.bw.agent,
            jax.random.PRNGKey(steps), num_episodes=32,
            pixel_keys=rb.image_keys,
        )
        line += (
            f" eval_fw {ev['eval/fw_success']:.2f}"
            f" eval_bw {ev['eval/bw_success']:.2f}"
            f" eval_bw|fw {ev['eval/bw_success_given_fw']:.2f}"
            f" round_trip {ev['eval/round_trip_success']:.2f}"
        )
        # run_chunk donates the carry: keep COPIES or the saved agent's
        # arrays are deleted by the next chunk
        snap = lambda a: jax.tree.map(lambda x: jnp.array(x, copy=True), a)
        _push(top["fw"], ev["eval/fw_success"], snap(carry.fw.agent))
        _push(
            top["bw"],
            # rank bw by the handoff metric, tie-broken by solo success
            ev["eval/bw_success_given_fw"] + 0.01 * ev["eval/bw_success"],
            snap(carry.bw.agent),
        )
        print(line, file=out, flush=True)
        if ev["eval/round_trip_success"] >= 0.8:
            print(
                f"SOLVED (round-trip >= 0.8) at {steps} env steps "
                f"({time.time()-t0:.0f}s)",
                file=out,
                flush=True,
            )
            break

    if top["fw"] and top["bw"]:
        # tournament: pick the pair with the best chained round-trip ...
        best_pair, best_rt = None, -1.0
        for i, (fs, fa) in enumerate(top["fw"]):
            for j, (bs, ba) in enumerate(top["bw"]):
                t = evaluate_chained(
                    eval_fw_env, eval_bw_env, fa, ba,
                    jax.random.PRNGKey(777), num_episodes=64,
                    pixel_keys=rb.image_keys,
                )
                print(
                    f"tournament fw#{i}(sel {fs:.2f}) x bw#{j}(sel {bs:.2f}):"
                    f" round_trip {t['eval/round_trip_success']:.2f}",
                    file=out, flush=True,
                )
                if t["eval/round_trip_success"] > best_rt:
                    best_rt = t["eval/round_trip_success"]
                    best_pair = (fa, ba)
        # ... then re-evaluate the winner on FRESH seeds (honest estimate)
        final = evaluate_chained(
            eval_fw_env, eval_bw_env, best_pair[0], best_pair[1],
            jax.random.PRNGKey(999331), num_episodes=64,
            pixel_keys=rb.image_keys,
        )
        print(
            f"TOURNAMENT-WINNER final (fresh 64 episodes): "
            f"eval_fw {final['eval/fw_success']:.2f} "
            f"eval_bw {final['eval/bw_success']:.2f} "
            f"eval_bw|fw {final['eval/bw_success_given_fw']:.2f} "
            f"round_trip {final['eval/round_trip_success']:.2f}",
            file=out, flush=True,
        )


if __name__ == "__main__":
    main()
