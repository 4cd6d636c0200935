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


def _shared_mlp(sd, prefix, layers):
    params, stats = {}, {}
    for i in range(layers):
        w = sd[f"{prefix}.layer{i}.conv.weight"].numpy()
        params[f"dense{i}"] = {
            "kernel": np.transpose(w[:, :, 0, 0], (1, 0))}
        params[f"bn{i}"] = {
            "scale": sd[f"{prefix}.layer{i}.bn.bn.weight"].numpy(),
            "bias": sd[f"{prefix}.layer{i}.bn.bn.bias"].numpy()}
        stats[f"bn{i}"] = {
            "mean": sd[f"{prefix}.layer{i}.bn.bn.running_mean"].numpy(),
            "var": sd[f"{prefix}.layer{i}.bn.bn.running_var"].numpy()}
    return {"mlp": params}, {"mlp": stats}


def _conv1d(sd, name):
    w = sd[f"{name}.weight"].numpy()
    out = {"kernel": np.transpose(w[:, :, 0], (1, 0))}
    if f"{name}.bias" in sd:
        out["bias"] = sd[f"{name}.bias"].numpy()
    return out


def _convbn_stack(sd, convs, bns):
    """Plain torch Conv1d+BN1d stacks -> dense{i}/bn{i}; the pre-BN
    conv bias folds into the BN running mean (BN(Wx+b; m, v) ==
    BN(Wx; m-b, v))."""
    params, stats = {}, {}
    for i, (c, bnm) in enumerate(zip(convs, bns)):
        d = _conv1d(sd, c)
        conv_bias = d.pop("bias", 0.0)
        params[f"dense{i}"] = d
        params[f"bn{i}"] = {
            "scale": sd[f"{bnm}.weight"].numpy(),
            "bias": sd[f"{bnm}.bias"].numpy()}
        stats[f"bn{i}"] = {
            "mean": sd[f"{bnm}.running_mean"].numpy() - conv_bias,
            "var": sd[f"{bnm}.running_var"].numpy()}
    return params, stats


def _predict_head(sd, prefix):
    params, stats = _convbn_stack(
        sd, [f"{prefix}.conv1", f"{prefix}.conv2"],
        [f"{prefix}.bn1", f"{prefix}.bn2"])
    heads = {
        "objectness": "objectness_scores_head",
        "center_residual": "center_residual_head",
        "heading_class": "heading_class_head",
        "heading_residual": "heading_residual_head",
        "size_class": "size_class_head",
        "size_residual": "size_residual_head",
        "sem_cls": "sem_cls_scores_head",
    }
    for ours, theirs in heads.items():
        params[ours] = _conv1d(sd, f"{prefix}.{theirs}")
    return params, stats


def _mha(sd, prefix, nhead):
    """Vendored torch MultiheadAttention -> flax MHA params."""
    hd = D // nhead
    inw = sd[f"{prefix}.in_proj_weight"].numpy()  # (3D, D)
    inb = sd[f"{prefix}.in_proj_bias"].numpy()
    out = {}
    for i, name in enumerate(("query", "key", "value")):
        w = inw[i * D:(i + 1) * D]  # (D, D), y = W x
        out[name] = {
            "kernel": np.transpose(w, (1, 0)).reshape(D, nhead, hd),
            "bias": inb[i * D:(i + 1) * D].reshape(nhead, hd)}
    ow = sd[f"{prefix}.out_proj.weight"].numpy()  # (D, D)
    out["out"] = {
        "kernel": np.transpose(ow, (1, 0)).reshape(nhead, hd, D),
        "bias": sd[f"{prefix}.out_proj.bias"].numpy()}
    return out


def _layernorm(sd, prefix):
    return {"scale": sd[f"{prefix}.weight"].numpy(),
            "bias": sd[f"{prefix}.bias"].numpy()}


def _dense(sd, prefix):
    return {"kernel": np.transpose(sd[f"{prefix}.weight"].numpy(),
                                   (1, 0)),
            "bias": sd[f"{prefix}.bias"].numpy()}


def _posembed(sd, prefix):
    d = _conv1d(sd, f"{prefix}.position_embedding_head.0")
    conv_bias = d.pop("bias", 0.0)
    params = {"dense0": d}
    params["bn0"] = {
        "scale": sd[f"{prefix}.position_embedding_head.1.weight"].numpy(),
        "bias": sd[f"{prefix}.position_embedding_head.1.bias"].numpy()}
    stats = {"bn0": {
        "mean": sd[
            f"{prefix}.position_embedding_head.1.running_mean"].numpy()
        - conv_bias,
        "var": sd[
            f"{prefix}.position_embedding_head.1.running_var"].numpy()}}
    params["dense1"] = _conv1d(sd, f"{prefix}.position_embedding_head.3")
    return params, stats


def convert_params(sd, nhead=8):
    params = {"backbone_net": {}}
    stats = {"backbone_net": {}}
    for sa in ("sa1", "sa2", "sa3", "sa4"):
        p, s = _shared_mlp(sd, f"backbone_net.{sa}.mlp_module", 3)
        params["backbone_net"][sa] = p
        stats["backbone_net"][sa] = s
    for fp in ("fp1", "fp2"):
        p, s = _shared_mlp(sd, f"backbone_net.{fp}.mlp", 2)
        params["backbone_net"][fp] = p
        stats["backbone_net"][fp] = s

    p, s = _convbn_stack(sd, ["points_obj_cls.conv1",
                              "points_obj_cls.conv2"],
                         ["points_obj_cls.bn1", "points_obj_cls.bn2"])
    p["out"] = _conv1d(sd, "points_obj_cls.conv3")
    params["points_obj_cls"] = p
    stats["points_obj_cls"] = s

    p, s = _predict_head(sd, "proposal_head")
    params["proposal_head"] = p
    stats["proposal_head"] = s

    params["decoder_key_proj"] = _conv1d(sd, "decoder_key_proj")
    params["decoder_query_proj"] = _conv1d(sd, "decoder_query_proj")

    for i in range(LAYERS):
        layer = {}
        layer["self_attn"] = _mha(sd, f"decoder.{i}.self_attn", nhead)
        layer["cross_attn"] = _mha(sd, f"decoder.{i}.multihead_attn",
                                   nhead)
        layer["linear1"] = _dense(sd, f"decoder.{i}.linear1")
        layer["linear2"] = _dense(sd, f"decoder.{i}.linear2")
        for nrm in ("norm1", "norm2", "norm3"):
            layer[nrm] = _layernorm(sd, f"decoder.{i}.{nrm}")
        params[f"decoder_{i}"] = layer

        p, s = _posembed(sd, f"decoder_self_posembeds.{i}")
        params[f"decoder_self_posembeds_{i}"] = p
        stats[f"decoder_self_posembeds_{i}"] = s
        p, s = _posembed(sd, f"decoder_cross_posembeds.{i}")
        params[f"decoder_cross_posembeds_{i}"] = p
        stats[f"decoder_cross_posembeds_{i}"] = s

        p, s = _predict_head(sd, f"prediction_heads.{i}")
        params[f"prediction_heads_{i}"] = p
        stats[f"prediction_heads_{i}"] = s
    return params, stats


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
