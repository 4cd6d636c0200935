"""Golden-activation parity: reference torch GroupFree3D vs JAX.

Same method as the VoteNet golden test: CUDA ops stubbed, weights
transplanted (incl. the vendored torch MultiheadAttention -> flax MHA
projection mapping), activations compared through backbone, KPS
selection, per-layer decoder heads.
"""

import pathlib
import sys
import types

import numpy as np
import pytest

GF = pathlib.Path("/root/reference/detection/GroupFree3D")
pytestmark = pytest.mark.skipif(not GF.exists(),
                                reason="reference not mounted")

B, N, NPROP, LAYERS = 2, 1024, 32, 2
D = 288


@pytest.fixture(scope="module")
def ref_model():
    torch = pytest.importorskip("torch")
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.cuda.FloatTensor = torch.FloatTensor
    sys.modules.setdefault("trimesh", types.ModuleType("trimesh"))
    ply = types.ModuleType("plyfile")
    ply.PlyData = object
    ply.PlyElement = object
    sys.modules.setdefault("plyfile", ply)
    sys.path.insert(0, str(pathlib.Path(__file__).parent))
    import torch_ext_stub

    torch_ext_stub.install()
    # purge reference modules a sibling parity fixture may have cached
    # from the *Votenet* tree (same module names, different content)
    for name in ("backbone_module", "pointnet2_modules",
                 "pointnet2_utils", "pytorch_utils", "pc_util", "nms",
                 "box_util", "eval_det", "metric_util", "transformer",
                 "multi_head_attention", "modules", "detector"):
        sys.modules.pop(name, None)
    for sub in ("pointnet2", "utils", "models"):
        sys.path.insert(0, str(GF / sub))
    sys.path.insert(0, str(GF))
    import importlib

    # detector.py uses relative imports — load it as a package member
    pkg = types.ModuleType("gfmodels_det")
    pkg.__path__ = [str(GF / "models")]
    sys.modules.setdefault("gfmodels_det", pkg)
    detector_mod = importlib.import_module("gfmodels_det.detector")
    from backtoreality_tpu.data import scannet_md40_config

    cfg = scannet_md40_config()
    torch.manual_seed(0)
    model = detector_mod.GroupFreeDetector(
        num_class=cfg.num_class,
        num_heading_bin=cfg.num_heading_bin,
        num_size_cluster=cfg.num_size_cluster,
        mean_size_arr=cfg.mean_size_arr,
        input_feature_dim=0,
        num_proposal=NPROP,
        num_decoder_layers=LAYERS,
        self_position_embedding="loc_learned",
    )
    model.eval()
    return model


# weight conversion lives in the package now (the user-facing
# checkpoint importer); this test is its golden validation
from backtoreality_tpu.tools.torch_import import (  # noqa: E402
    groupfree_state_dict,
)


def convert_params(sd, nhead=8):
    return groupfree_state_dict(sd, nhead=nhead)


def test_gf_full_graph_parity(ref_model):
    import torch

    import jax.numpy as jnp

    from backtoreality_tpu.data import scannet_md40_config
    from backtoreality_tpu.models.groupfree import GroupFreeDetector

    cfg = scannet_md40_config()
    rng = np.random.default_rng(0)
    cloud = ((rng.random((B, N, 3)) * 2 - 1) * 2.5).astype(np.float32)

    with torch.no_grad():
        ref_out = ref_model({"point_clouds": torch.from_numpy(cloud)})

    params, stats = convert_params(ref_model.state_dict())
    model = GroupFreeDetector(
        num_class=cfg.num_class,
        num_heading_bin=cfg.num_heading_bin,
        num_size_cluster=cfg.num_size_cluster,
        mean_size_arr=tuple(map(tuple, cfg.mean_size_arr.tolist())),
        num_proposal=NPROP,
        num_decoder_layers=LAYERS,
        self_position_embedding="loc_learned",
        query_mode="exact",
    )
    out = model.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(cloud), train=False)

    def chk(key, tol=3e-3, chan_first=False, squeeze1=False):
        ref = ref_out[key].numpy()
        if chan_first:
            ref = np.swapaxes(ref, 1, 2)
        got = np.asarray(out[key])
        np.testing.assert_allclose(got, ref, rtol=tol, atol=tol,
                                   err_msg=key)

    chk("fp2_features", chan_first=True)
    chk("seeds_obj_cls_logits", chan_first=True)
    np.testing.assert_array_equal(
        np.asarray(out["query_points_sample_inds"]),
        ref_out["query_points_sample_inds"].numpy())
    for prefix in ("proposal_", "0head_", "last_"):
        chk(f"{prefix}objectness_scores")
        chk(f"{prefix}center")
        chk(f"{prefix}sem_cls_scores")
        chk(f"{prefix}size_scores")
        chk(f"{prefix}pred_size")
