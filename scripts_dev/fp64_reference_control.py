"""fp32-vs-fp64 control for the exact ETDRK4 reference (round-4 item #1).

Every survival/MAE number in RESULTS.md is measured against the fp32
on-device ETDRK4 solve (`integrate.exact_solve_sampled`). SURVEY.md §7-3
deferred the "does the fine-grid spectral reference need x64?" decision;
this script makes it empirically, per flagship protocol:

  stage fp32  — run the PRODUCTION reference path (fp32, TPU by default):
                draw the protocol's ICs + forcing exactly as `evaluate()`
                does, solve warmup + horizon, save the coarse-grained
                trajectory and the raw IC/forcing bits.
  stage fp64  — in a fresh process with x64 enabled (CPU): load the SAME
                IC/forcing bits, cast to float64, run the identical ETDRK4
                (same contour coefficients, same dt arithmetic) through the
                same warmup + horizon.
  stage compare — Pearson correlation over x between the fp32 and fp64
                coarse trajectories per (protocol, resample factor);
                report the first time the worst ensemble member drops
                below {0.999, 0.99, 0.9} and below the survival rule's 0.8,
                plus MAE growth. Writes artifacts/fp64_reference_control.json.

If the agreement window exceeds every quoted horizon, the fp32 reference is
validated and the survival numbers stand; otherwise RESULTS.md must restate
them against the fp64 twin.

Run (TPU leg first, CPU x64 leg second — never concurrently with other TPU
work):
    python scripts_dev/fp64_reference_control.py --stage=fp32 --protocol=ks
    python scripts_dev/fp64_reference_control.py --stage=fp64 --protocol=ks
    python scripts_dev/fp64_reference_control.py --stage=compare
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# Flagship evaluation protocols (RESULTS.md checkpoint-zoo table). The
# coarse factors listed share ONE fine solve; the saved trajectory is
# coarse-grained at the smallest factor and further block-meaned in the
# compare stage (block means compose exactly).
PROTOCOLS = {
    "ks": dict(equation="ks", fine_size=1024, time_delta=0.1, time_max=50.0,
               warmup_time=44.0, ic_scale=1.0, seed=0, factors=(8, 16, 32)),
    "kdv": dict(equation="kdv", fine_size=512, time_delta=0.05, time_max=10.0,
                warmup_time=0.0, ic_scale=0.5, seed=12345, factors=(8, 16)),
    "burgers": dict(equation="burgers", fine_size=1024, time_delta=0.1,
                    time_max=3.0, warmup_time=0.0, ic_scale=1.0, seed=0,
                    factors=(8, 64)),
}
NUM_SAMPLES = 32  # matches every run_evaluation ensemble in RESULTS.md
THRESHOLDS = (0.999, 0.99, 0.9, 0.8)


def solve(protocol: str, out_path: str, dtype) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pde_superresolution_tpu import equations, integrate
    from pde_superresolution_tpu.grids import Grid
    from pde_superresolution_tpu.ops import resample

    p = PROTOCOLS[protocol]
    eq = equations.from_name(p["equation"], conservative=True)
    fine = Grid(p["fine_size"], eq.period)
    num_times = int(round(p["time_max"] / p["time_delta"])) + 1
    min_factor = min(p["factors"])

    ic_path = os.path.join(os.path.dirname(out_path), f"{protocol}_ic.npz")
    if dtype == "fp32":
        # the production draw, bit-identical to evaluate()
        k_ic, k_f = jax.random.split(jax.random.PRNGKey(p["seed"]))
        u0 = p["ic_scale"] * eq.initial_conditions(k_ic, fine, (NUM_SAMPLES,))
        forcing = eq.sample_forcing(k_f, (NUM_SAMPLES,))
        np.savez(
            ic_path,
            u0=np.asarray(u0),
            **({} if forcing is None else
               {f"forcing_{k}": np.asarray(v)
                for k, v in forcing._asdict().items()}),
        )
    else:
        want = jnp.float64 if dtype == "fp64" else jnp.float32
        blob = np.load(ic_path)
        u0 = jnp.asarray(blob["u0"], dtype=want)
        if any(k.startswith("forcing_") for k in blob):
            forcing = equations.ForcingParams(
                **{k[len("forcing_"):]: jnp.asarray(blob[k], want)
                   for k in blob if k.startswith("forcing_")})
        else:
            forcing = None
        assert u0.dtype == want, u0.dtype

    t_start = time.time()
    if dtype == "fp64branch":
        # eval-window-only control: branch the fp64 twin AT THE WARMED
        # fp32 STATE, so both references share the exact eval-start state
        # and the measured divergence is eval-window reference error only
        # (the full-IC branch conflates it with warmup drift).
        if p["warmup_time"] <= 0:
            print(f"{protocol}: no warmup, fp64branch == fp64; skipping")
            return
        blob32 = np.load(out_path.replace("_fp64branch.npz", "_fp32.npz"))
        u0 = jnp.asarray(blob32["u_warm"], dtype=jnp.float64)
        times, traj = integrate.exact_solve_sampled(
            eq, fine, u0, p["time_delta"], num_times,
            warmup_time=0.0, forcing=forcing,
        )
    else:
        times, traj = integrate.exact_solve_sampled(
            eq, fine, u0, p["time_delta"], num_times,
            warmup_time=p["warmup_time"], forcing=forcing,
        )  # [T, batch, nx_fine]
    coarse = resample.resample_mean(traj, min_factor)  # conservative family
    coarse = np.asarray(jax.block_until_ready(coarse))
    wall = time.time() - t_start
    np.savez(out_path, times=np.asarray(times), coarse=coarse,
             min_factor=min_factor,
             u_warm=np.asarray(traj[0]))  # fine eval-start state
    print(f"{protocol} {dtype}: solved {coarse.shape} on "
          f"{jax.devices()[0].platform} in {wall:.1f}s -> {out_path}")


def compare(out_dir: str, json_path: str) -> None:
    import numpy as np

    def block_mean(a, f):
        if f == 1:
            return a
        return a.reshape(a.shape[:-1] + (a.shape[-1] // f, f)).mean(-1)

    def pearson(a, b):
        a = a - a.mean(-1, keepdims=True)
        b = b - b.mean(-1, keepdims=True)
        den = np.sqrt((a * a).sum(-1) * (b * b).sum(-1))
        return (a * b).sum(-1) / np.maximum(den, 1e-300)

    PAIRS = (  # (leg_a, leg_b, what the pair attributes)
        ("fp32", "fp64", "production fp32-TPU vs fp64 truth (full pipeline)"),
        ("fp32cpu", "fp64", "intrinsic fp32 rounding (same CPU arithmetic)"),
        ("fp32", "fp32cpu", "TPU-vs-CPU arithmetic at equal precision"),
        ("fp32", "fp64branch",
         "eval-window reference quality (fp64 branched at the warmed state)"),
    )

    report = {}
    for name, p in PROTOCOLS.items():
        legs = {}
        for leg in ("fp32", "fp64", "fp32cpu", "fp64branch"):
            path = os.path.join(out_dir, f"{name}_{leg}.npz")
            if os.path.exists(path):
                legs[leg] = np.load(path)
        if "fp32" not in legs or "fp64" not in legs:
            print(f"{name}: missing fp32/fp64 legs, skipping")
            continue
        times = legs["fp32"]["times"]
        rel_t = times - times[0]
        min_factor = int(legs["fp32"]["min_factor"])
        entry = {"horizon": p["time_max"], "num_samples": NUM_SAMPLES,
                 "seed": p["seed"], "fine_size": p["fine_size"],
                 "warmup_time": p["warmup_time"], "pairs": {}}
        for leg_a, leg_b, label in PAIRS:
            if leg_a not in legs or leg_b not in legs:
                continue
            pair_key = f"{leg_a}_vs_{leg_b}"
            entry["pairs"][pair_key] = {"label": label, "factors": {}}
            for factor in p["factors"]:
                ratio = factor // min_factor
                ca = block_mean(legs[leg_a]["coarse"].astype(np.float64), ratio)
                cb = block_mean(legs[leg_b]["coarse"].astype(np.float64), ratio)
                corr = pearson(np.swapaxes(ca, 0, 1), np.swapaxes(cb, 0, 1))
                worst = corr.min(0)  # worst member per time
                mae = np.abs(ca - cb).mean(-1)  # [T, batch]
                first_below = {}
                for th in THRESHOLDS:
                    # monotone "once dead" rule, matching survival_time
                    alive = np.cumprod((worst >= th).astype(int))
                    n_alive = int(alive.sum())
                    first_below[str(th)] = (
                        None if n_alive == len(rel_t)
                        else float(rel_t[min(n_alive, len(rel_t) - 1)])
                    )
                # per-member survival-style decorrelation times (0.8 rule)
                alive_m = np.cumprod((corr >= 0.8).astype(int), axis=1)
                n_alive_m = alive_m.sum(1)
                decorr = rel_t[np.clip(n_alive_m - 1, 0, len(rel_t) - 1)]
                entry["pairs"][pair_key]["factors"][str(factor)] = {
                    "first_below_worst_member": first_below,
                    "final_worst_corr": float(worst[-1]),
                    "final_median_corr": float(np.median(corr[:, -1])),
                    "decorr08_median": float(np.median(decorr)),
                    "decorr08_min": float(decorr.min()),
                    "n_members_below08_at_horizon": int((n_alive_m < len(rel_t)).sum()),
                    "max_mae": float(mae.max()),
                    "final_mean_mae": float(mae[-1].mean()),
                    "rms_scale": float(np.sqrt((cb**2).mean())),
                }
                e = entry["pairs"][pair_key]["factors"][str(factor)]
                print(f"{name} {factor}x [{pair_key}]: final corr "
                      f"worst {e['final_worst_corr']:.6f} / median "
                      f"{e['final_median_corr']:.6f}, decorr@0.8 median "
                      f"{e['decorr08_median']} min {e['decorr08_min']} "
                      f"({e['n_members_below08_at_horizon']}/{NUM_SAMPLES} "
                      f"members dead), max MAE {e['max_mae']:.3e} "
                      f"(rms {e['rms_scale']:.3f})")
        report[name] = entry
    with open(json_path, "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {json_path}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", required=True,
                    choices=["fp32", "fp64", "fp32cpu", "fp64branch",
                             "compare"])
    ap.add_argument("--protocol", default=None,
                    choices=[*PROTOCOLS, None])
    ap.add_argument("--out_dir", default="/root/repo/artifacts/fp64_control")
    ap.add_argument("--json_path",
                    default="/root/repo/artifacts/fp64_reference_control.json")
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)

    if args.stage == "compare":
        compare(args.out_dir, args.json_path)
        return

    import jax

    if args.stage in ("fp64", "fp64branch"):
        # the control legs: CPU + x64, configured before any computation
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    elif args.stage == "fp32cpu":
        # attribution leg: same precision as production, CPU arithmetic —
        # separates intrinsic-fp32 chaos amplification from TPU-FFT error
        jax.config.update("jax_platforms", "cpu")
    protocols = [args.protocol] if args.protocol else list(PROTOCOLS)
    for name in protocols:
        out = os.path.join(args.out_dir, f"{name}_{args.stage}.npz")
        solve(name, out, args.stage)


if __name__ == "__main__":
    main()
