"""Roll random actions in an env and dump the video + rewards
(reference: notebooks/visualize_env.ipynb).

    python scripts/visualize_env.py stickman_walk [steps] [out.mp4]
"""

import sys

import numpy as np


def main():
    task = sys.argv[1] if len(sys.argv) > 1 else "stickman_walk"
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    out = sys.argv[3] if len(sys.argv) > 3 else f"{task}_random.mp4"
    from demo.t2v import save_video
    from genrl_tpu import envs

    env = envs.make(task, "pixels", action_repeat=2, seed=0)
    ts, obs = env.reset()
    frames, rewards = [], []
    for _ in range(steps):
        a = env.act_space["action"].sample()
        ts, obs = env.step(a)
        frames.append(np.transpose(obs["observation"], (1, 2, 0)))
        rewards.append(obs["reward"])
        if obs["is_last"]:
            break
    save_video(np.asarray(frames, np.float32) / 255.0, out)
    print(f"{task}: {len(frames)} steps, total reward {np.sum(rewards):.2f} -> {out}")


if __name__ == "__main__":
    main()
