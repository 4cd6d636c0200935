"""Golden-activation parity: reference torch VoteNet vs JAX VoteNet.

Builds the reference model on CPU (its CUDA op module stubbed with
exact-semantics CPU implementations), transplants its randomly
initialized weights into the flax model, runs both on the same cloud in
eval mode, and compares activations through the whole graph. This is
the SURVEY.md §4(b) golden test: a user's reference checkpoint produces
the same outputs here.
"""

import pathlib
import sys

import numpy as np
import pytest

REF = pathlib.Path("/root/reference/detection/Votenet")
pytestmark = pytest.mark.skipif(not REF.exists(),
                                reason="reference not mounted")

B, N = 2, 1024


@pytest.fixture(scope="module")
def ref_model():
    torch = pytest.importorskip("torch")
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.cuda.FloatTensor = torch.FloatTensor
    # stub optional IO deps pulled in by the reference import chain
    import types

    ply = types.ModuleType("plyfile")
    ply.PlyData = object
    ply.PlyElement = object
    sys.modules.setdefault("plyfile", ply)
    sys.modules.setdefault("trimesh", types.ModuleType("trimesh"))
    mpl = pytest.importorskip("matplotlib")
    mpl.use("Agg")
    sys.path.insert(0, str(pathlib.Path(__file__).parent))
    import torch_ext_stub

    torch_ext_stub.install()
    sys.path.insert(0, str(REF / "pointnet2"))
    sys.path.insert(0, str(REF / "utils"))
    sys.path.insert(0, str(REF / "models"))
    import importlib

    votenet_mod = importlib.import_module("votenet")
    from backtoreality_tpu.data import scannet_md40_config

    cfg = scannet_md40_config()
    torch.manual_seed(0)
    model = votenet_mod.VoteNet(
        num_class=cfg.num_class,
        num_heading_bin=cfg.num_heading_bin,
        num_size_cluster=cfg.num_size_cluster,
        mean_size_arr=cfg.mean_size_arr,
        input_feature_dim=0,
        num_proposal=32,
        vote_factor=1,
        sampling="vote_fps",
    )
    model.eval()
    return model


# weight conversion lives in the package now (the user-facing
# checkpoint importer); these tests are its golden validation
from backtoreality_tpu.tools.torch_import import (  # noqa: E402
    votenet_state_dict as convert_params,
)


def test_full_graph_parity(ref_model):
    import torch

    import jax.numpy as jnp

    from backtoreality_tpu.data import scannet_md40_config
    from backtoreality_tpu.models.votenet import VoteNet

    cfg = scannet_md40_config()
    rng = np.random.default_rng(0)
    cloud = ((rng.random((B, N, 3)) * 2 - 1) * 2.5).astype(np.float32)

    with torch.no_grad():
        ref_out = ref_model({"point_clouds": torch.from_numpy(cloud)})

    params, stats = convert_params(ref_model.state_dict())
    model = VoteNet(
        num_class=cfg.num_class,
        num_heading_bin=cfg.num_heading_bin,
        num_size_cluster=cfg.num_size_cluster,
        mean_size_arr=tuple(map(tuple, cfg.mean_size_arr.tolist())),
        num_proposal=32,
        query_mode="exact",  # CUDA first-k semantics for parity
    )
    out = model.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(cloud), train=False)

    def chk(key, ref_key=None, tol=2e-3, chan_first=False):
        ref = ref_out[ref_key or key].numpy()
        if chan_first:
            ref = np.swapaxes(ref, 1, 2)
        got = np.asarray(out[key])
        np.testing.assert_allclose(got, ref, rtol=tol, atol=tol,
                                   err_msg=key)

    # backbone
    np.testing.assert_array_equal(
        np.asarray(out["sa1_inds"]), ref_out["sa1_inds"].numpy())
    chk("sa1_xyz")
    chk("sa1_features", chan_first=True)
    chk("fp2_features", chan_first=True)
    np.testing.assert_array_equal(
        np.asarray(out["seed_inds"]), ref_out["seed_inds"].numpy())
    # voting
    chk("vote_xyz")
    chk("vote_features", chan_first=True)
    # proposals (vote-FPS indices must agree for the rest to align)
    np.testing.assert_array_equal(
        np.asarray(out["aggregated_vote_inds"]),
        ref_out["aggregated_vote_inds"].numpy())
    chk("aggregated_vote_xyz")
    chk("objectness_scores")
    chk("center")
    chk("heading_scores")
    chk("size_scores")
    chk("sem_cls_scores")
    chk("pred_size")
