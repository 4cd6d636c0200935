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
