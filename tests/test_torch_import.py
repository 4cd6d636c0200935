"""End-to-end reference-checkpoint import: torch .tar file -> CLI ->
our msgpack checkpoint -> loaded into the flax model -> forward parity.
"""

import pathlib
import sys
import types

import numpy as np
import pytest

REF = pathlib.Path("/root/reference/detection/Votenet")
pytestmark = pytest.mark.skipif(not REF.exists(),
                                reason="reference not mounted")

sys.path.insert(0, str(pathlib.Path(__file__).parent))
from test_model_parity_votenet import ref_model  # noqa: E402,F401


def test_cli_roundtrip(ref_model, tmp_path):  # noqa: F811
    import torch

    import jax.numpy as jnp

    from backtoreality_tpu.data import scannet_md40_config
    from backtoreality_tpu.models.votenet import VoteNet
    from backtoreality_tpu.tools.torch_import import main as import_main
    from backtoreality_tpu.train import common

    # a reference-driver-format checkpoint (train_Votenet_FSB.py:309),
    # with DataParallel-style "module." prefixes to exercise stripping
    src = tmp_path / "checkpoint.tar"
    sd = {f"module.{k}": v for k, v in ref_model.state_dict().items()}
    torch.save({"epoch": 7, "model_state_dict": sd,
                "optimizer_state_dict": {}, "loss": 1.0}, src)

    out = tmp_path / "imported.tar"
    import_main([str(src), "--model", "votenet", "--out", str(out)])

    state_sd, epoch, _ = common.load_checkpoint(out)
    assert epoch == 7

    cfg = scannet_md40_config()
    model = VoteNet(
        num_class=cfg.num_class,
        num_heading_bin=cfg.num_heading_bin,
        num_size_cluster=cfg.num_size_cluster,
        mean_size_arr=tuple(map(tuple, cfg.mean_size_arr.tolist())),
        num_proposal=32,
        query_mode="exact",
    )
    # graft the imported weights exactly like the drivers do with
    # --checkpoint_path
    rng = np.random.default_rng(0)
    cloud = ((rng.random((2, 1024, 3)) * 2 - 1) * 2.5).astype(
        np.float32)
    import jax

    variables = jax.jit(lambda c: model.init(
        jax.random.PRNGKey(0), c, train=False))(jnp.asarray(cloud[:1]))
    params = common.partial_restore(
        jax.device_get(variables["params"]), state_sd["params"])
    stats = common.partial_restore(
        jax.device_get(variables["batch_stats"]),
        state_sd["batch_stats"])

    out_j = model.apply({"params": params, "batch_stats": stats},
                        jnp.asarray(cloud), train=False)
    with torch.no_grad():
        out_t = ref_model({"point_clouds": torch.from_numpy(cloud)})
    np.testing.assert_allclose(
        np.asarray(out_j["center"]), out_t["center"].numpy(),
        rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(out_j["objectness_scores"]),
        out_t["objectness_scores"].numpy(), rtol=2e-3, atol=2e-3)


def test_cli_roundtrip_groupfree(tmp_path):
    """GF `{'model': ..., 'epoch': N}` checkpoint layout
    (`train_GF_FSB.py:121-144`) through the CLI, incl. decoder-depth
    autodetection, then forward parity against the torch model."""
    from test_model_parity_groupfree import (  # noqa: F401
        LAYERS,
        NPROP,
        ref_model as gf_ref_fixture,
    )
    # reuse the fixture body directly (module-scoped fixture functions
    # can't be called across files; re-request via pytest is overkill
    # for one use, so build the model the same way)
    import torch

    import jax
    import jax.numpy as jnp

    from backtoreality_tpu.data import scannet_md40_config
    from backtoreality_tpu.models.groupfree import GroupFreeDetector
    from backtoreality_tpu.tools.torch_import import main as import_main
    from backtoreality_tpu.train import common

    ref = gf_ref_fixture.__wrapped__()

    src = tmp_path / "gf_ckpt.tar"
    torch.save({"model": ref.state_dict(), "epoch": 11,
                "optimizer": {}, "scheduler": {}}, src)

    out = tmp_path / "gf_imported.tar"
    import_main([str(src), "--model", "groupfree", "--out", str(out)])

    state_sd, epoch, _ = common.load_checkpoint(out)
    assert epoch == 11

    cfg = scannet_md40_config()
    model = GroupFreeDetector(
        num_class=cfg.num_class,
        num_heading_bin=cfg.num_heading_bin,
        num_size_cluster=cfg.num_size_cluster,
        mean_size_arr=tuple(map(tuple, cfg.mean_size_arr.tolist())),
        num_proposal=NPROP,
        num_decoder_layers=LAYERS,  # must match the autodetected depth
        self_position_embedding="loc_learned",  # training config of the
        # checkpoint (the reference driver default, train_GF_FSB.py:77)
        query_mode="exact",
    )
    rng = np.random.default_rng(3)
    cloud = ((rng.random((2, 1024, 3)) * 2 - 1) * 2.5).astype(
        np.float32)
    variables = jax.jit(lambda c: model.init(
        jax.random.PRNGKey(0), c, train=False))(jnp.asarray(cloud[:1]))
    params = common.partial_restore(
        jax.device_get(variables["params"]), state_sd["params"])
    stats = common.partial_restore(
        jax.device_get(variables["batch_stats"]),
        state_sd["batch_stats"])

    out_j = model.apply({"params": params, "batch_stats": stats},
                        jnp.asarray(cloud), train=False)
    with torch.no_grad():
        out_t = ref({"point_clouds": torch.from_numpy(cloud)})
    np.testing.assert_allclose(
        np.asarray(out_j["seeds_obj_cls_logits"])[..., 0],
        out_t["seeds_obj_cls_logits"].numpy()[:, 0, :],
        rtol=3e-3, atol=3e-3)
    # per-slot outputs compared slot-order-invariantly: near-equal KPS
    # logits can tie-break differently between torch.topk and XLA
    # top_k, permuting query slots (the detection SET is unchanged and
    # NMS/AP are order-invariant)
    ij = np.asarray(out_j["query_points_sample_inds"])
    it = out_t["query_points_sample_inds"].numpy()
    lc_j = np.asarray(out_j["last_center"])
    lc_t = out_t["last_center"].numpy()
    for b in range(ij.shape[0]):
        assert set(ij[b]) == set(it[b])
        perm = np.array([int(np.nonzero(it[b] == q)[0][0])
                         for q in ij[b]])
        np.testing.assert_allclose(lc_j[b], lc_t[b][perm],
                                   rtol=3e-3, atol=3e-3)
