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


def _convert_shared_mlp(dst, prefix, sd, layers):
    """torch SharedMLP 'layerK.conv/bn.bn' -> flax denseK/bnK."""
    params, stats = {}, {}
    for i in range(layers):
        w = sd[f"{prefix}.layer{i}.conv.weight"].numpy()  # (Co,Ci,1,1)
        params[f"dense{i}"] = {
            "kernel": np.transpose(w[:, :, 0, 0], (1, 0))}
        params[f"bn{i}"] = {
            "scale": sd[f"{prefix}.layer{i}.bn.bn.weight"].numpy(),
            "bias": sd[f"{prefix}.layer{i}.bn.bn.bias"].numpy()}
        stats[f"bn{i}"] = {
            "mean": sd[f"{prefix}.layer{i}.bn.bn.running_mean"].numpy(),
            "var": sd[f"{prefix}.layer{i}.bn.bn.running_var"].numpy()}
    dst[0]["mlp"] = params
    dst[1]["mlp"] = stats


def _convert_head(sd, prefix, nlayers=2):
    """torch convK/bnK stacks + final conv -> flax denseK/bnK + out."""
    params, stats = {}, {}
    for i in range(nlayers):
        w = sd[f"{prefix}.conv{i+1}.weight"].numpy()  # (Co, Ci, 1)
        params[f"dense{i}"] = {
            "kernel": np.transpose(w[:, :, 0], (1, 0))}
        params[f"bn{i}"] = {
            "scale": sd[f"{prefix}.bn{i+1}.weight"].numpy(),
            "bias": sd[f"{prefix}.bn{i+1}.bias"].numpy()}
        # the reference's pre-BN conv bias folds exactly into the BN
        # running mean: BN(Wx + b; m, v) == BN(Wx; m - b, v)
        conv_bias = sd[f"{prefix}.conv{i+1}.bias"].numpy()
        stats[f"bn{i}"] = {
            "mean": sd[f"{prefix}.bn{i+1}.running_mean"].numpy()
            - conv_bias,
            "var": sd[f"{prefix}.bn{i+1}.running_var"].numpy()}
    w = sd[f"{prefix}.conv{nlayers+1}.weight"].numpy()
    params["out"] = {
        "kernel": np.transpose(w[:, :, 0], (1, 0)),
        "bias": sd[f"{prefix}.conv{nlayers+1}.bias"].numpy()}
    return params, stats


def convert_params(sd):
    """Reference VoteNet state_dict -> (flax params, batch_stats)."""
    params = {"backbone_net": {}, "vgen": {}, "pnet": {}}
    stats = {"backbone_net": {}, "vgen": {}, "pnet": {}}
    for sa in ("sa1", "sa2", "sa3", "sa4"):
        dst_p, dst_s = {}, {}
        _convert_shared_mlp([dst_p, dst_s],
                            f"backbone_net.{sa}.mlp_module", sd, 3)
        params["backbone_net"][sa] = dst_p
        stats["backbone_net"][sa] = dst_s
    for fp in ("fp1", "fp2"):
        dst_p, dst_s = {}, {}
        _convert_shared_mlp([dst_p, dst_s],
                            f"backbone_net.{fp}.mlp", sd, 2)
        params["backbone_net"][fp] = dst_p
        stats["backbone_net"][fp] = dst_s

    p, s = _convert_head(sd, "vgen")
    params["vgen"], stats["vgen"] = p, s

    dst_p, dst_s = {}, {}
    _convert_shared_mlp([dst_p, dst_s],
                        "pnet.vote_aggregation.mlp_module", sd, 3)
    params["pnet"]["vote_aggregation"] = dst_p
    stats["pnet"]["vote_aggregation"] = dst_s
    p, s = _convert_head(sd, "pnet")
    params["pnet"].update(p)
    stats["pnet"].update(s)
    return params, stats


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
