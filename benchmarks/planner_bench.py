"""Planner benchmark: batched wavefront planner vs serial host A*.

The stated purpose of `wavefront_distances` (data/astar.py) is replacing
thousands of serial A* runs in trajectory generation; this measures that
claim on a realistic nav grid. Prints one JSON line.

Run: python benchmarks/planner_bench.py  (CPU or TPU; the wavefront relaxation
is a jitted VPU program either way).
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from sage3d_tpu.data.astar import astar_pixel, plan_many  # noqa: E402


def make_grid(size=240, seed=0):
    """Indoor-like occupancy grid: boundary walls + rooms + door gaps."""
    rng = np.random.default_rng(seed)
    g = np.zeros((size, size), np.int8)
    g[:2], g[-2:], g[:, :2], g[:, -2:] = 1, 1, 1, 1
    for _ in range(6):  # inner walls with doors
        if rng.random() < 0.5:
            r = rng.integers(20, size - 20)
            g[r:r + 2, :] = 1
            for _ in range(3):
                c = rng.integers(5, size - 15)
                g[r:r + 2, c:c + 10] = 0
        else:
            c = rng.integers(20, size - 20)
            g[:, c:c + 2] = 1
            for _ in range(3):
                r = rng.integers(5, size - 15)
                g[r:r + 10, c:c + 2] = 0
    return g


def sample_free(g, n, seed=1):
    free = np.argwhere(g == 0)
    rng = np.random.default_rng(seed)
    return free[rng.choice(len(free), n * 2, replace=False)].reshape(n, 2, 2)


def main(n_pairs=64):
    g = make_grid()
    pairs = sample_free(g, n_pairs)
    starts, goals = pairs[:, 0], pairs[:, 1]

    t0 = time.time()
    astar_paths = [astar_pixel(g, (int(s[1]), int(s[0])),
                               (int(e[1]), int(e[0])))
                   for s, e in zip(starts, goals)]
    t_astar = time.time() - t0

    plan_many(g == 0, starts[:2], goals[:2])   # compile outside timing
    t0 = time.time()
    wf_paths = plan_many(g == 0, starts, goals)
    t_wf = time.time() - t0

    agree = reach_a = reach_w = 0
    for pa, pw in zip(astar_paths, wf_paths):
        reach_a += pa is not None
        reach_w += pw is not None
        if (pa is None) == (pw is None):
            if pa is None or abs(len(pa) - len(pw)) <= max(
                    2, int(0.02 * len(pa))):
                agree += 1

    print(json.dumps({
        "metric": "planner_pairs_per_s",
        "n_pairs": n_pairs,
        "astar_s": round(t_astar, 3),
        "wavefront_s": round(t_wf, 3),
        "speedup": round(t_astar / max(t_wf, 1e-9), 2),
        "astar_pairs_per_s": round(n_pairs / t_astar, 1),
        "wavefront_pairs_per_s": round(n_pairs / t_wf, 1),
        "reachability_agree": agree, "reach_astar": reach_a,
        "reach_wavefront": reach_w,
    }))


if __name__ == "__main__":
    main()
