"""Benchmark: VoteNet fwd+bwd training throughput (scenes/sec/chip).

The BASELINE.json north-star metric: 40k-point VoteNet train step
(forward + loss + backward + optimizer), batch 8, on one chip. The
baseline row is the 2080Ti PyTorch reference (~16 scenes/s measured
class of hardware for this model/batch in the reference configuration).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import time

import numpy as np

BASELINE_SCENES_PER_SEC = 16.0  # 2080Ti PyTorch reference class
BATCH = 8
NUM_POINTS = 40000


def _scene_point_clouds(cfg, b, n, rng):
    """Clustered scene-like clouds (floor plane + box-surface objects)
    from the synthetic-scene generator: FPS and the stratified ball
    query are distribution-dependent (hit rates, bucket occupancy), so
    the headline is measured on realistic geometry, not uniform noise."""
    from backtoreality_tpu.data.synthetic import generate_scene

    clouds = np.empty((b, n, 3), np.float32)
    for i in range(b):
        verts, _, _, _ = generate_scene(
            cfg, rng, num_objects=12, room_size=6.0,
            points_per_object=3000, floor_points=8000)
        xyz = verts[:, :3]
        idx = rng.choice(len(xyz), size=n, replace=len(xyz) < n)
        clouds[i] = xyz[idx]
    return clouds


def main():
    import jax
    import jax.numpy as jnp

    from backtoreality_tpu.data import scannet_md40_config
    from backtoreality_tpu.losses import votenet as vote_losses
    from backtoreality_tpu.parallel import make_mesh, replicate, shard_batch
    from backtoreality_tpu.train import common
    from backtoreality_tpu.train.votenet import (
        build_model,
        init_state,
        make_train_step,
    )
    from __graft_entry__ import _example_batch, _flags

    cfg = scannet_md40_config()
    # the recommended production config: subset-FPS at SA1 over 8192
    # candidates of the pipeline-shuffled cloud. Quality-validated
    # end-to-end (600-epoch fixture: mAP 0.3547/AR 0.811 vs full-FPS
    # 0.3588/0.758 — within run variance; coverage 0.057 vs 0.062,
    # RESULTS.md), ~4 ms/step faster than exact full-cloud FPS.
    model = build_model(_flags(num_target=256, fps_candidates=8192),
                        cfg)
    optimizer = common.make_optimizer("adam", lr0=1e-3)
    mesh = make_mesh(1)

    rng_np = np.random.default_rng(0)
    batch = _example_batch(cfg, BATCH, NUM_POINTS, rng_np)
    # headline batch: scene-like clustered geometry
    batch["point_clouds"] = _scene_point_clouds(cfg, BATCH, NUM_POINTS,
                                                rng_np)
    uniform_clouds = (rng_np.random((BATCH, NUM_POINTS, 3),
                                    dtype=np.float32) * 4 - 2)
    rng = jax.random.PRNGKey(0)
    state = init_state(
        model, optimizer, (jnp.asarray(batch["point_clouds"][:1]),), rng)
    state = replicate(state, mesh)
    dev_batch = shard_batch(batch, mesh)
    uni_batch = shard_batch({**batch, "point_clouds": uniform_clouds},
                            mesh)
    train_step = make_train_step(model, optimizer, vote_losses.get_loss,
                                 cfg)
    bnm = jnp.asarray(0.5, jnp.float32)

    # warmup / compile (the value fetch forces completion — on tunneled
    # devices block_until_ready alone is unreliable)
    state, aux = train_step(state, dev_batch, rng, bnm)
    float(aux["loss"])

    def timed(dbatch, iters=40):
        nonlocal state
        t0 = time.perf_counter()
        for _ in range(iters):
            state, aux = train_step(state, dbatch, rng, bnm)
        assert np.isfinite(float(aux["loss"]))  # sync point
        return BATCH * iters / (time.perf_counter() - t0)

    scenes_per_sec = timed(dev_batch)
    uniform_sps = timed(uni_batch)
    print(json.dumps({
        "metric": "votenet_fsb_train_scenes_per_sec_per_chip",
        "value": round(scenes_per_sec, 3),
        "unit": "scenes/s/chip (B=8, N=40000, fwd+bwd+opt, "
                "scene-geometry clouds)",
        "vs_baseline": round(scenes_per_sec / BASELINE_SCENES_PER_SEC, 3),
        "uniform_random_value": round(uniform_sps, 3),
    }))


if __name__ == "__main__":
    main()
