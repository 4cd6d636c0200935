"""Eval-protocol parity vs the reference ap_helper / eval_det / nms.

Runs the reference GroupFree3D `ap_helper.parse_predictions` /
`parse_groundtruths` (torch CPU, import chain stubbed — the GF copy is
prefix-parameterized and CUDA-free) against ours on identical
end_points, comparing the final (class, corners, score) detection
lists; then full APCalculator metrics.
"""

import pathlib
import sys
import types

import numpy as np
import pytest

GF = pathlib.Path("/root/reference/detection/GroupFree3D")
pytestmark = pytest.mark.skipif(not GF.exists(),
                                reason="reference not mounted")


@pytest.fixture(scope="module")
def ref_ap():
    torch = pytest.importorskip("torch")
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.cuda.FloatTensor = torch.FloatTensor
    sys.modules.setdefault("trimesh", types.ModuleType("trimesh"))
    ply = types.ModuleType("plyfile")
    ply.PlyData = object
    ply.PlyElement = object
    sys.modules.setdefault("plyfile", ply)
    ext = types.ModuleType("pointnet2._ext")
    pn2 = types.ModuleType("pointnet2")
    pn2._ext = ext
    pn2.__path__ = []
    sys.modules.setdefault("pointnet2", pn2)
    sys.modules.setdefault("pointnet2._ext", ext)
    sys.path.insert(0, str(GF))
    sys.path.insert(0, str(GF / "utils"))
    sys.path.insert(0, str(GF / "pointnet2"))
    pkg = types.ModuleType("gfmodels2")
    pkg.__path__ = [str(GF / "models")]
    sys.modules.setdefault("gfmodels2", pkg)
    import importlib

    return importlib.import_module("gfmodels2.ap_helper")


def make_pred_end_points(cfg, seed=0, b=2, k=16, k2=6):
    rng = np.random.default_rng(seed)
    nh, ns = cfg.num_heading_bin, cfg.num_size_cluster
    hr = rng.standard_normal((b, k, nh)).astype(np.float32) * 0.1
    sr = rng.standard_normal((b, k, ns, 3)).astype(np.float32) * 0.05
    return {
        "center": rng.random((b, k, 3)).astype(np.float32) * 6,
        "heading_scores":
            rng.standard_normal((b, k, nh)).astype(np.float32),
        "heading_residuals": hr,
        "size_scores":
            rng.standard_normal((b, k, ns)).astype(np.float32),
        "size_residuals": sr,
        "sem_cls_scores":
            rng.standard_normal(
                (b, k, cfg.num_class)).astype(np.float32),
        "objectness_scores":
            rng.standard_normal((b, k, 1)).astype(np.float32) * 2,
        # labels for parse_groundtruths
        "center_label": rng.random((b, k2, 3)).astype(np.float32) * 6,
        "heading_class_label":
            rng.integers(0, nh, (b, k2)).astype(np.int64),
        "heading_residual_label":
            rng.standard_normal((b, k2)).astype(np.float32) * 0.05,
        "size_class_label":
            rng.integers(0, ns, (b, k2)).astype(np.int64),
        "size_residual_label":
            rng.standard_normal((b, k2, 3)).astype(np.float32) * 0.05,
        "sem_cls_label":
            rng.integers(0, cfg.num_class, (b, k2)).astype(np.int64),
        "box_label_mask":
            (rng.random((b, k2)) > 0.3).astype(np.float32),
    }


class _RefConfigShim:
    """Duck-types the reference DatasetConfig API onto ours."""

    def __init__(self, cfg):
        self._cfg = cfg
        self.num_class = cfg.num_class
        self.num_heading_bin = cfg.num_heading_bin
        self.num_size_cluster = cfg.num_size_cluster
        self.mean_size_arr = cfg.mean_size_arr

    def class2angle(self, cls, residual, to_label_format=True):
        return self._cfg.class2angle(cls, residual, to_label_format)

    def class2size(self, cls, residual, ratio=1.0):
        return self._cfg.class2size(cls, residual, ratio)


@pytest.mark.parametrize("cfg_name", ["scannet_md40", "matterport_md40"])
def test_parse_predictions_parity(ref_ap, cfg_name):
    import torch

    from backtoreality_tpu.data import get_config
    from backtoreality_tpu.eval import parse_predictions

    cfg = get_config(cfg_name)
    ep = make_pred_end_points(cfg)
    config_dict = dict(
        remove_empty_box=False, use_3d_nms=True, nms_iou=0.25,
        use_old_type_nms=False, cls_nms=True, per_class_proposal=True,
        conf_thresh=0.05)
    ref_preds = ref_ap.parse_predictions(
        {k: torch.from_numpy(np.asarray(v)) for k, v in ep.items()},
        dict(config_dict, dataset_config=_RefConfigShim(cfg)))
    got_preds = parse_predictions(
        ep, dict(config_dict, dataset_config=cfg))

    assert len(got_preds) == len(ref_preds)
    for got, ref in zip(got_preds, ref_preds):
        assert len(got) == len(ref)
        for (gc, gbox, gs), (rc, rbox, rs) in zip(got, ref):
            assert gc == rc
            np.testing.assert_allclose(gbox, rbox, atol=1e-4)
            assert gs == pytest.approx(float(rs), rel=1e-4)


@pytest.fixture(scope="module")
def ref_matterport_cfg():
    """The reference's own MatterportDatasetConfig_md40 (real 12-bin
    heading codec, `model_util_matterport.py:32-62`) — pure numpy."""
    vn = pathlib.Path("/root/reference/detection/Votenet")
    for sub in ("utils", "matterport"):
        p = str(vn / sub)
        if p not in sys.path:
            sys.path.insert(0, p)
    import importlib

    mod = importlib.import_module("model_util_matterport")
    return mod.MatterportDatasetConfig_md40()


class TestMatterportCodecGolden:
    """Golden parity of the 12-heading-bin codec against the reference
    config itself (not a shim around ours)."""

    def test_mean_sizes_match(self, ref_matterport_cfg):
        from backtoreality_tpu.data import matterport_md40_config

        np.testing.assert_allclose(
            matterport_md40_config().mean_size_arr,
            ref_matterport_cfg.mean_size_arr, rtol=1e-6)

    def test_angle2class_sweep(self, ref_matterport_cfg):
        from backtoreality_tpu.data import matterport_md40_config

        cfg = matterport_md40_config()
        for angle in np.linspace(0.0, 2 * np.pi - 1e-6, 97):
            rc, rr = ref_matterport_cfg.angle2class(angle)
            gc, gr = cfg.angle2class(float(angle))
            assert gc == rc, angle
            assert gr == pytest.approx(rr, abs=1e-9), angle

    def test_class2angle_sweep(self, ref_matterport_cfg):
        from backtoreality_tpu.data import matterport_md40_config

        cfg = matterport_md40_config()
        for cls in range(12):
            for res in (-0.2, 0.0, 0.13):
                ra = ref_matterport_cfg.class2angle(cls, res)
                ga = cfg.class2angle(cls, res)
                assert float(ga) == pytest.approx(float(ra), abs=1e-6)

    def test_parse_predictions_vs_reference_codec(self, ref_ap,
                                                  ref_matterport_cfg):
        """End-to-end decode -> NMS -> per-class expansion where the
        REFERENCE side uses its own matterport config object."""
        import torch

        from backtoreality_tpu.data import matterport_md40_config
        from backtoreality_tpu.eval import parse_predictions

        cfg = matterport_md40_config()
        config_dict = dict(
            remove_empty_box=False, use_3d_nms=True, nms_iou=0.25,
            use_old_type_nms=False, cls_nms=True,
            per_class_proposal=True, conf_thresh=0.05)
        for seed in range(3):
            ep = make_pred_end_points(cfg, seed=seed)
            ref_preds = ref_ap.parse_predictions(
                {k: torch.from_numpy(np.asarray(v))
                 for k, v in ep.items()},
                dict(config_dict, dataset_config=ref_matterport_cfg))
            got_preds = parse_predictions(
                ep, dict(config_dict, dataset_config=cfg))
            assert len(got_preds) == len(ref_preds)
            for got, ref in zip(got_preds, ref_preds):
                assert len(got) == len(ref)
                for (gc, gbox, gs), (rc, rbox, rs) in zip(got, ref):
                    assert gc == rc
                    np.testing.assert_allclose(gbox, rbox, atol=1e-4)
                    assert gs == pytest.approx(float(rs), rel=1e-4)


def test_full_ap_metrics_parity(ref_ap):
    import torch

    from backtoreality_tpu.data import scannet_md40_config
    from backtoreality_tpu.eval import (
        APCalculator,
        parse_groundtruths,
        parse_predictions,
    )

    cfg = scannet_md40_config()
    config_dict = dict(
        remove_empty_box=False, use_3d_nms=True, nms_iou=0.25,
        use_old_type_nms=False, cls_nms=True, per_class_proposal=True,
        conf_thresh=0.05)
    calc_ref = ref_ap.APCalculator(0.25, cfg.class2type)
    calc_got = APCalculator(0.25, cfg.class2type)
    for seed in range(3):
        ep = make_pred_end_points(cfg, seed=seed)
        t_ep = {k: torch.from_numpy(np.asarray(v))
                for k, v in ep.items()}
        ref_cd = dict(config_dict, dataset_config=_RefConfigShim(cfg))
        calc_ref.step(ref_ap.parse_predictions(t_ep, ref_cd),
                      ref_ap.parse_groundtruths(t_ep, ref_cd))
        got_cd = dict(config_dict, dataset_config=cfg)
        calc_got.step(parse_predictions(ep, got_cd),
                      parse_groundtruths(ep, got_cd))
    ref_metrics = calc_ref.compute_metrics()
    got_metrics = calc_got.compute_metrics()
    # Compare per-class AP/Recall where the reference is finite (its
    # eval emits nan for classes with no positives under these random
    # inputs; ours defines those as 0).
    compared = 0
    for key, rv in ref_metrics.items():
        if key in ("mAP", "AR"):
            continue
        if np.isfinite(rv):
            assert got_metrics[key] == pytest.approx(rv, abs=1e-6), key
            compared += 1
    assert compared >= 10
