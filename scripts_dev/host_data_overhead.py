"""Measure the per-step cost of host-staged training data (--host_data).

The host-resident TrajectoryData path gathers each batch in numpy on the
host and ships only the batch to the device per step (the price of training
ensembles larger than HBM). This probe times the SAME training config with
the dataset device-resident vs host-resident and reports steps/s + the
overhead, at the flagship recipe's step shape (KS 8x, batch 512).

Usage:  python scripts_dev/host_data_overhead.py [--steps=60] [--traj=2048]
Writes: artifacts/r4_host_data_overhead.json
"""

import json
import sys
import time

import jax
import numpy as np

from pde_superresolution_tpu import equations
from pde_superresolution_tpu.grids import Grid
from pde_superresolution_tpu.training import config as config_lib
from pde_superresolution_tpu.training import data as data_lib
from pde_superresolution_tpu.training import loop as loop_lib


def parse_flag(name, default):
    for a in sys.argv[1:]:
        if a.startswith(f"--{name}="):
            return int(a.split("=", 1)[1])
    return default


def timed_train(cfg, dataset, steps):
    """steps/s over the tail of a short train() run (compile excluded by
    timing only after a warmup fraction via the metrics-free fast path)."""
    import dataclasses

    # warmup run: 4 steps to compile
    warm = dataclasses.replace(cfg, learning_stops=(4,), eval_interval=10**6)
    loop_lib.train(warm, dataset=dataset)
    t0 = time.perf_counter()
    run = dataclasses.replace(
        cfg, learning_stops=(steps,), eval_interval=10**6
    )
    loop_lib.train(run, dataset=dataset)
    wall = time.perf_counter() - t0
    return steps / wall, wall


def main():
    steps = parse_flag("steps", 60)
    traj = parse_flag("traj", 2048)
    cfg = config_lib.parse_hparams(
        "equation=ks,conservative=true,resample_factor=8,fine_size=1024,"
        "num_times=64,time_delta=0.1,warmup_time=44,stencil_size=8,"
        "num_time_steps=16,batch_size=512,learning_rates=1e-3,"
        f"learning_stops={steps},num_trajectories={traj}"
    )
    eq = equations.from_name(cfg.equation, conservative=cfg.conservative)
    fine = Grid(cfg.fine_size, eq.period)

    results = {"config": {"traj": traj, "steps": steps,
                          "batch": cfg.batch_size,
                          "unroll": cfg.num_time_steps}}
    for host in (False, True):
        t0 = time.perf_counter()
        dataset = data_lib.build_trajectory_data(
            eq, fine, jax.random.PRNGKey(cfg.data_seed),
            num_trajectories=traj, num_times=cfg.num_times,
            time_delta=cfg.time_delta, resample_factor=cfg.resample_factor,
            unroll_steps=cfg.num_time_steps, warmup_time=cfg.warmup_time,
            host_resident=host,
        )
        jax.block_until_ready(dataset.series) if not host else None
        gen_s = time.perf_counter() - t0
        sps, wall = timed_train(cfg, dataset, steps)
        key = "host" if host else "device"
        results[key] = {
            "steps_per_s": round(sps, 2),
            "ms_per_step": round(1e3 / sps, 1),
            "train_wall_s": round(wall, 1),
            "gen_wall_s": round(gen_s, 1),
            "dataset_gb": round(dataset.nbytes() / 1024**3, 3),
        }
        print(key, results[key], file=sys.stderr)
        del dataset
    results["host_overhead_pct"] = round(
        100.0 * (results["device"]["steps_per_s"] / results["host"]["steps_per_s"] - 1.0),
        1,
    )
    with open("artifacts/r4_host_data_overhead.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
