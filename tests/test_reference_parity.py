"""Parity tests against the REFERENCE implementation itself.

Runs the reference's torch loss code (CPU, with `.cuda()` no-op'd) on
the same random end_points as our JAX losses and compares values. This
is the strongest available check that the criterion semantics match —
the reference's CUDA op library can't build here, but its loss stack is
pure torch. Skipped when /root/reference is not mounted.
"""

import pathlib
import sys
import types

import numpy as np
import pytest

REF = pathlib.Path("/root/reference/detection/Votenet")
pytestmark = pytest.mark.skipif(not REF.exists(),
                                reason="reference not mounted")


@pytest.fixture(scope="module")
def ref_losses():
    torch = pytest.importorskip("torch")
    # neutralize CUDA usage in the reference loss code
    torch.Tensor.cuda = lambda self, *a, **k: self
    if not hasattr(torch.cuda, "FloatTensor"):
        torch.cuda.FloatTensor = torch.FloatTensor
    else:
        torch.cuda.FloatTensor = torch.FloatTensor
    sys.path.insert(0, str(REF / "utils"))
    sys.path.insert(0, str(REF / "models"))
    import importlib

    mod = importlib.import_module("loss_helper")
    return mod


def make_end_points(seed=0, b=2, n=64, num_seed=16, k=8, k2=8,
                    num_class=22, nh=1, ns=22):
    rng = np.random.default_rng(seed)
    return {
        "seed_xyz": rng.random((b, num_seed, 3)).astype(np.float32) * 4,
        "seed_inds": rng.integers(0, n, (b, num_seed)).astype(np.int64),
        "vote_xyz": rng.random((b, num_seed, 3)).astype(np.float32) * 4,
        "aggregated_vote_xyz":
            rng.random((b, k, 3)).astype(np.float32) * 4,
        "objectness_scores":
            rng.standard_normal((b, k, 2)).astype(np.float32),
        "center": rng.random((b, k, 3)).astype(np.float32) * 4,
        "heading_scores":
            rng.standard_normal((b, k, nh)).astype(np.float32),
        "heading_residuals_normalized":
            rng.standard_normal((b, k, nh)).astype(np.float32) * 0.1,
        "size_scores":
            rng.standard_normal((b, k, ns)).astype(np.float32),
        "size_residuals_normalized":
            rng.standard_normal((b, k, ns, 3)).astype(np.float32) * 0.1,
        "sem_cls_scores":
            rng.standard_normal((b, k, num_class)).astype(np.float32),
        "center_label": rng.random((b, k2, 3)).astype(np.float32) * 4,
        "box_label_mask":
            (rng.random((b, k2)) > 0.4).astype(np.float32),
        "sem_cls_label":
            rng.integers(0, num_class, (b, k2)).astype(np.int64),
        "heading_class_label": np.zeros((b, k2), np.int64),
        "heading_residual_label": np.zeros((b, k2), np.float32),
        "size_class_label":
            rng.integers(0, ns, (b, k2)).astype(np.int64),
        "size_residual_label":
            rng.standard_normal((b, k2, 3)).astype(np.float32) * 0.05,
        "vote_label":
            rng.standard_normal((b, n, 9)).astype(np.float32) * 0.2,
        "vote_label_mask": (rng.random((b, n)) > 0.5).astype(np.int64),
    }


class _Config:
    """Shim with the fields the reference losses read."""

    def __init__(self, cfg):
        self.num_heading_bin = cfg.num_heading_bin
        self.num_size_cluster = cfg.num_size_cluster
        self.num_class = cfg.num_class
        self.mean_size_arr = cfg.mean_size_arr


def _to_torch(ep):
    import torch

    return {k: torch.from_numpy(np.asarray(v)) for k, v in ep.items()}


def _to_jax(ep):
    import jax.numpy as jnp

    return {k: jnp.asarray(v) for k, v in ep.items()}


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_get_loss_parity(ref_losses, seed):
    from backtoreality_tpu.data import scannet_md40_config
    from backtoreality_tpu.losses import votenet as jl

    cfg = scannet_md40_config()
    ep = make_end_points(seed)
    ref_loss, ref_ep = ref_losses.get_loss(_to_torch(ep), _Config(cfg))
    jax_loss, aux = jl.get_loss(_to_jax(ep), cfg)
    assert float(jax_loss) == pytest.approx(float(ref_loss), rel=2e-4)
    for key in ("vote_loss", "objectness_loss", "center_loss",
                "heading_reg_loss", "size_cls_loss", "size_reg_loss",
                "sem_cls_loss", "obj_acc", "pos_ratio"):
        assert float(aux[key]) == pytest.approx(
            float(ref_ep[key]), rel=2e-3, abs=1e-5), key


@pytest.mark.parametrize("seed", [3, 4])
def test_get_loss_weak_parity(ref_losses, seed):
    from backtoreality_tpu.data import scannet_md40_config
    from backtoreality_tpu.losses import votenet as jl

    cfg = scannet_md40_config()
    ep = make_end_points(seed)
    ref_loss, ref_ep = ref_losses.get_loss_weak(_to_torch(ep),
                                                _Config(cfg))
    jax_loss, aux = jl.get_loss_weak(_to_jax(ep), cfg)
    assert float(jax_loss) == pytest.approx(float(ref_loss), rel=2e-4)
    for key in ("vote_loss", "objectness_loss", "center_loss",
                "size_cls_loss", "sem_cls_loss"):
        assert float(aux[key]) == pytest.approx(
            float(ref_ep[key]), rel=2e-3, abs=1e-5), key


def test_get_loss_da_parity(ref_losses):
    from backtoreality_tpu.data import scannet_md40_config
    from backtoreality_tpu.losses import votenet as jl

    cfg = scannet_md40_config()
    ep_S = make_end_points(10)
    ep_T = make_end_points(11)
    rng = np.random.default_rng(12)
    for ep in (ep_S, ep_T):
        ep["global_d_pred"] = rng.standard_normal((2, 2)).astype(
            np.float32)
        # reference local_d_pred layout is (B, 1, K); ours (B, K, 1)
        ep["local_d_pred"] = rng.random((2, 8, 1)).astype(np.float32)

    t_S, t_T = _to_torch(ep_S), _to_torch(ep_T)
    t_S["local_d_pred"] = t_S["local_d_pred"].permute(0, 2, 1)
    t_T["local_d_pred"] = t_T["local_d_pred"].permute(0, 2, 1)
    ref_loss, _, _ = ref_losses.get_loss_DA(t_S, t_T, _Config(cfg))
    jax_loss, _ = jl.get_loss_DA(_to_jax(ep_S), _to_jax(ep_T), cfg)
    assert float(jax_loss) == pytest.approx(float(ref_loss), rel=3e-4)


def test_nn_distance_parity(ref_losses):
    import torch

    from backtoreality_tpu.ops import nn_distance

    sys.path.insert(0, str(REF / "utils"))
    import importlib

    nd = importlib.import_module("nn_distance")
    rng = np.random.default_rng(20)
    pc1 = rng.random((2, 15, 3)).astype(np.float32)
    pc2 = rng.random((2, 9, 3)).astype(np.float32)
    rd1, ri1, rd2, ri2 = nd.nn_distance(torch.from_numpy(pc1),
                                        torch.from_numpy(pc2), l1=True)
    jd1, ji1, jd2, ji2 = nn_distance(pc1, pc2, l1=True)
    np.testing.assert_allclose(np.asarray(jd1), rd1.numpy(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(jd2), rd2.numpy(), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(ji1), ri1.numpy())


def test_get_loss_da_separate_parity(ref_losses):
    """`loss_helper.py:806-907` (dead experiment variant) vs ours."""
    from backtoreality_tpu.data import scannet_md40_config
    from backtoreality_tpu.losses import votenet as jl

    cfg = scannet_md40_config()
    ep_S = make_end_points(20)
    ep_T = make_end_points(21)
    rng = np.random.default_rng(22)
    for ep in (ep_S, ep_T):
        ep["global_d_pred"] = rng.standard_normal((2, 2)).astype(
            np.float32)
        ep["local_d_pred"] = rng.random((2, 8, 1)).astype(np.float32)

    t_S, t_T = _to_torch(ep_S), _to_torch(ep_T)
    t_S["local_d_pred"] = t_S["local_d_pred"].permute(0, 2, 1)
    t_T["local_d_pred"] = t_T["local_d_pred"].permute(0, 2, 1)
    ref_loss, ref_S, _ = ref_losses.get_loss_DA_separate(
        t_S, t_T, _Config(cfg))
    jax_loss, aux = jl.get_loss_DA_separate(
        _to_jax(ep_S), _to_jax(ep_T), cfg)
    assert float(jax_loss) == pytest.approx(float(ref_loss), rel=3e-4)
    assert float(aux["obj_acc"]) == pytest.approx(
        float(ref_S["obj_acc"]), rel=2e-3, abs=1e-5)


def test_get_loss_cam_parity(ref_losses):
    """`loss_helper.py:910-943` (dead CAM pretext loss) vs ours."""
    from backtoreality_tpu.data import scannet_md40_config
    from backtoreality_tpu.losses import votenet as jl

    cfg = scannet_md40_config()
    rng = np.random.default_rng(23)
    cam = rng.standard_normal((2, 8, cfg.num_class)).astype(np.float32)
    cloud_label = (rng.random((2, cfg.num_class)) > 0.5).astype(
        np.float32)

    import torch

    # reference layout (B, num_class, K); ours channels-last (B, K, C)
    t_ep = {"cam": torch.from_numpy(cam).permute(0, 2, 1),
            "cloud_label": torch.from_numpy(cloud_label)}
    ref_loss, _ = ref_losses.get_loss_cam(t_ep, _Config(cfg))
    jax_loss, _ = jl.get_loss_cam(
        {"cam": cam, "cloud_label": cloud_label}, cfg)
    assert float(jax_loss) == pytest.approx(float(ref_loss), rel=1e-5)


def test_get_loss_da_cam_parity(ref_losses):
    """`loss_helper.py:946-1039` (dead CAM-DA variant) vs ours."""
    from backtoreality_tpu.data import scannet_md40_config
    from backtoreality_tpu.losses import votenet as jl

    cfg = scannet_md40_config()
    ep_S = make_end_points(24)
    ep_T = make_end_points(25)
    rng = np.random.default_rng(26)
    for ep in (ep_S, ep_T):
        ep["global_d_pred"] = rng.standard_normal((2, 2)).astype(
            np.float32)
        ep["vote_feature_d_pred"] = rng.standard_normal((2, 2)).astype(
            np.float32)
        ep["local_d_pred"] = rng.random((2, 8, 1)).astype(np.float32)
        ep["cloud_label"] = (rng.random((2, cfg.num_class)) > 0.5
                             ).astype(np.float32)

    t_S, t_T = _to_torch(ep_S), _to_torch(ep_T)
    t_S["local_d_pred"] = t_S["local_d_pred"].permute(0, 2, 1)
    t_T["local_d_pred"] = t_T["local_d_pred"].permute(0, 2, 1)
    ref_loss, _, _ = ref_losses.get_loss_DA_cam(t_S, t_T, _Config(cfg))
    jax_loss, _ = jl.get_loss_DA_cam(_to_jax(ep_S), _to_jax(ep_T), cfg)
    assert float(jax_loss) == pytest.approx(float(ref_loss), rel=3e-4)
