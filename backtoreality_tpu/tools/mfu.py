"""Roofline accounting: FLOPs AND HBM bytes vs achieved vs chip peak.

Answers "is the next 2x available in the matmuls?" for the ~75% of
the train step that is MXU work (the round-2 per-op trace accounted
FPS/ball-query precisely but gave the MXU share no %-of-peak figure),
and "is the step bandwidth-bound?" via the memory roofline.

FLOPs and bytes come from XLA's own cost analysis of the compiled
train step (`compiled.cost_analysis()` keys "flops" and
"bytes accessed"), so fusions/rematerialisation are included;
achieved rates = counts / measured device-loop step time; peaks are
looked up by `jax.devices()[0].device_kind`. Caveat: "bytes accessed"
is XLA's logical operand-traffic estimate — intra-fusion reuse is
excluded but VMEM-resident re-reads are not modelled, so treat the
bandwidth percentage as an upper-bound estimate of HBM pressure.

Usage:  python -m backtoreality_tpu.tools.mfu [--model gf] [--iters 30]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

# f32 peak TFLOP/s per chip by device kind (MXU natively computes
# bf16xbf16->f32; f32 matmuls run at ~1/2-1/3 of bf16 rate depending
# on generation — we report against BOTH peaks).
PEAKS_TFLOPS = {
    # kind-substring: (bf16 peak, f32 peak)
    "v2": (45.0, 22.5),
    "v3": (123.0, 61.5),
    "v4": (275.0, 137.5),
    "v5 lite": (197.0, 98.5),
    "v5litepod": (197.0, 98.5),
    "v5e": (197.0, 98.5),
    "v5p": (459.0, 229.5),
    "v6 lite": (918.0, 459.0),
    "v6e": (918.0, 459.0),
    "cpu": (0.1, 0.05),  # placeholder so the tool runs hermetically
}

# HBM bandwidth GB/s per chip by device kind (public chip specs).
PEAKS_HBM_GBS = {
    "v2": 700.0,
    "v3": 900.0,
    "v4": 1228.0,
    "v5 lite": 819.0,
    "v5litepod": 819.0,
    "v5e": 819.0,
    "v5p": 2765.0,
    "v6 lite": 1640.0,
    "v6e": 1640.0,
    "cpu": 50.0,  # placeholder so the tool runs hermetically
}


def _peaks(kind: str):
    k = kind.lower()
    for sub, peaks in PEAKS_TFLOPS.items():
        if sub in k:
            return peaks
    return (None, None)


def _hbm_peak(kind: str):
    k = kind.lower()
    for sub, peak in PEAKS_HBM_GBS.items():
        if sub in k:
            return peak
    return None


def measure(model_name: str, iters: int = 30,
            fps_candidates: int | None = 8192):
    import jax
    import jax.numpy as jnp

    from backtoreality_tpu.data import scannet_md40_config
    from backtoreality_tpu.parallel import make_mesh, replicate, \
        shard_batch
    from backtoreality_tpu.train import common
    from __graft_entry__ import (
        _example_batch,
        _flags,
        _gf_example_batch,
        _gf_flags,
    )

    cfg = scannet_md40_config()
    mesh = make_mesh(1)
    rng = jax.random.PRNGKey(0)
    rng_np = np.random.default_rng(0)

    if model_name == "votenet":
        from backtoreality_tpu.losses import votenet as vote_losses
        from backtoreality_tpu.train.votenet import (
            build_model,
            init_state,
            make_train_step,
        )

        b, n = 8, 40000
        model = build_model(_flags(num_target=256,
                                   fps_candidates=fps_candidates), cfg)
        optimizer = common.make_optimizer("adam", lr0=1e-3)
        batch = _example_batch(cfg, b, n, rng_np)
        state = init_state(
            model, optimizer,
            (jnp.asarray(batch["point_clouds"][:1]),), rng)
        step = make_train_step(model, optimizer, vote_losses.get_loss,
                               cfg)
        hyper = (jnp.asarray(0.5, jnp.float32),)
    else:
        from backtoreality_tpu.losses import groupfree as gf_losses
        from backtoreality_tpu.train import groupfree as gf

        b, n = 8, 50000
        flags = _gf_flags()
        flags.num_target = 256
        flags.num_decoder_layers = 6
        flags.dim_feedforward = 2048
        flags.fps_candidates = fps_candidates
        model = gf.build_model(flags, cfg)
        optimizer = common.make_gf_optimizer(4e-3, 4e-4, 5e-4, 0.1)
        batch = _gf_example_batch(cfg, b, n, rng_np)
        state = gf.init_state(
            model, optimizer,
            (jnp.asarray(batch["point_clouds"][:1]),), rng)
        step = gf.make_train_step(model, optimizer, gf_losses.get_loss,
                                  cfg, gf._loss_kwargs(flags))
        hyper = (jnp.asarray(0.1, jnp.float32),)

    state = replicate(state, mesh)
    dev_batch = shard_batch(batch, mesh)

    # compile + extract XLA's flop count for the whole train step
    lowered = step.lower(state, dev_batch, rng, *hyper)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns [dict]
        ca = ca[0]
    flops = float(ca.get("flops", float("nan")))
    bytes_accessed = float(ca.get("bytes accessed", float("nan")))

    # warmup then iteration-slope timing ending in a value fetch
    state, aux = step(state, dev_batch, rng, *hyper)
    float(aux["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, aux = step(state, dev_batch, rng, *hyper)
    assert np.isfinite(float(aux["loss"]))
    dt = (time.perf_counter() - t0) / iters

    kind = jax.devices()[0].device_kind
    peak_bf16, peak_f32 = _peaks(kind)
    hbm_peak = _hbm_peak(kind)
    achieved = flops / dt / 1e12
    achieved_gbs = bytes_accessed / dt / 1e9
    out = {
        "model": model_name,
        "device_kind": kind,
        "batch": b,
        "num_points": n,
        "step_ms": round(dt * 1e3, 2),
        "xla_flops_per_step": flops,
        "achieved_tflops": round(achieved, 2),
        "xla_bytes_per_step": bytes_accessed,
        "achieved_gbs": round(achieved_gbs, 1),
    }
    if peak_f32:
        out["pct_of_f32_peak"] = round(100 * achieved / peak_f32, 1)
        out["pct_of_bf16_peak"] = round(100 * achieved / peak_bf16, 1)
    if hbm_peak:
        out["pct_of_hbm_peak"] = round(100 * achieved_gbs / hbm_peak, 1)
    print(json.dumps(out))
    return out


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="votenet",
                        choices=["votenet", "gf", "both"])
    parser.add_argument("--iters", type=int, default=30)
    parser.add_argument("--fps_candidates", type=int, default=8192,
                        help="subset-FPS candidate count; 0 = exact "
                        "full-cloud FPS")
    args = parser.parse_args(argv)
    models = (["votenet", "gf"] if args.model == "both"
              else [args.model])
    for m in models:
        measure(m, args.iters, args.fps_candidates or None)


if __name__ == "__main__":
    main()
