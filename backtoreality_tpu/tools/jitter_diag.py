"""Does the CenterRefine jitter head recover the injected annotation
error?  Loads a trained CenterRefine checkpoint, forwards train scans
of either domain, and compares `jitter_pred` against the known
injected `center_jitter` label (= size * delta table), per valid
object. The epoch-ramped label refinement
(`detection/Votenet/models/loss_helper.py:698-701`) only helps if
this prediction correlates with the true error — this tool measures
exactly that (RESULTS.md "CenterRefine under 5x annotation error").

Reports: mean |injected| (the error to undo), mean |injected - pred|
(residual after full refinement), mean |pred|, mean cosine, and the
recovered fraction 1 - residual/injected (negative = refinement adds
error).

Usage:
  python -m backtoreality_tpu.tools.jitter_diag \
      --ckpt log/train_BR_CenterRefine.tar --config log/config.json \
      --data_root <target-or-source root> [--cpu]
"""
import argparse
import json

import types

import numpy as np




def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True,
                    help="CenterRefine checkpoint "
                         "(<log_dir>/train_BR_CenterRefine.tar, or a "
                         "reference torch CR checkpoint converted via "
                         "tools/torch_import.py). Regenerate the study "
                         "fixture with `parity_fixture --kind br`")
    ap.add_argument("--config", required=True,
                    help="the training run's <log_dir>/config.json")
    ap.add_argument("--data_root", required=True,
                    help="jittered-domain fixture root (the 'real' "
                         "part of the br fixture)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from backtoreality_tpu.data import get_config
    from backtoreality_tpu.data.dataset import DetectionDataset
    from backtoreality_tpu.data.loader import DetectionDataLoader
    from backtoreality_tpu.train import common
    from backtoreality_tpu.train.votenet import build_model

    flags = types.SimpleNamespace(**json.load(open(args.config)))
    cfg = get_config(flags.dataset)
    model = build_model(flags, cfg, "da_jitter")

    ds = DetectionDataset(
        cfg, args.data_root, split="all", num_points=flags.num_point,
        use_color=flags.use_color, use_height=not flags.no_height,
        augment=False, center_jitter=flags.center_jitter)
    loader = DetectionDataLoader(ds, flags.batch_size, shuffle=False,
                                 drop_last=True)

    sample = next(iter(loader))
    rng = jax.random.PRNGKey(0)
    init_fn = jax.jit(lambda r, *a: model.init(r, *a, train=False))
    variables = init_fn(
        rng, jnp.asarray(sample["point_clouds"][:1]),
        jnp.asarray(sample["center_label"][:1]),
        jnp.asarray(sample["sem_cls_label"][:1]))
    sd, epoch, _ = common.load_checkpoint(args.ckpt)
    params = common.partial_restore(
        jax.device_get(variables["params"]), sd["params"])
    stats = common.partial_restore(
        jax.device_get(variables["batch_stats"]), sd["batch_stats"])
    variables = {"params": params, "batch_stats": stats}
    print(f"loaded {args.ckpt} (epoch {epoch})")

    @jax.jit
    def fwd(pc, cl, scl):
        ep = model.apply(variables, pc, cl, scl, train=False)
        return ep["jitter_pred"]

    inj_n, res_n, pred_n, cos_sum, nobj = [], [], [], 0.0, 0
    for batch in loader:
        pred = np.asarray(fwd(jnp.asarray(batch["point_clouds"]),
                              jnp.asarray(batch["center_label"]),
                              jnp.asarray(batch["sem_cls_label"])))
        inj = batch["center_jitter"]           # (B, K, 3) true injected
        mask = batch["box_label_mask"].astype(bool)
        for b in range(inj.shape[0]):
            m = mask[b]
            if not m.any():
                continue
            i, p = inj[b][m], pred[b][m]
            inj_n += list(np.linalg.norm(i, axis=-1))
            res_n += list(np.linalg.norm(i - p, axis=-1))
            pred_n += list(np.linalg.norm(p, axis=-1))
            denom = (np.linalg.norm(i, axis=-1)
                     * np.linalg.norm(p, axis=-1) + 1e-9)
            cos_sum += float(((i * p).sum(-1) / denom).sum())
            nobj += int(m.sum())

    out = {
        "objects": nobj,
        "mean_injected_norm_m": round(float(np.mean(inj_n)), 4),
        "mean_residual_norm_m": round(float(np.mean(res_n)), 4),
        "mean_pred_norm_m": round(float(np.mean(pred_n)), 4),
        "mean_cosine(pred,injected)": round(cos_sum / max(nobj, 1), 4),
        "recovered_frac": round(
            1.0 - float(np.mean(res_n)) / float(np.mean(inj_n)), 4),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
