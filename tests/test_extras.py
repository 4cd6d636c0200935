"""Tests for the auxiliary components: BoxNet, MSG module, GroupAll,
PLY writers, dump helper."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from backtoreality_tpu.data import scannet_md40_config
from backtoreality_tpu.losses import votenet as L
from backtoreality_tpu.models.votenet.boxnet import BoxNet
from backtoreality_tpu.nn import SAModuleMSG, group_all
from backtoreality_tpu.utils.pc_util import (
    point_cloud_to_bbox,
    write_bbox,
    write_oriented_bbox,
    write_ply,
    write_ply_rgb,
)

CFG = scannet_md40_config()
B, N = 2, 2500


@pytest.fixture(scope="module")
def cloud():
    rng = np.random.default_rng(0)
    return jnp.asarray(
        ((rng.random((B, N, 3)) * 2 - 1) * 3).astype(np.float32))


class TestBoxNet:
    def test_forward_and_loss(self, cloud):
        model = BoxNet(
            num_class=CFG.num_class,
            num_heading_bin=CFG.num_heading_bin,
            num_size_cluster=CFG.num_size_cluster,
            mean_size_arr=tuple(map(tuple, CFG.mean_size_arr.tolist())),
            num_proposal=32)
        variables = model.init(jax.random.PRNGKey(0), cloud, train=False)
        out = model.apply(variables, cloud, train=False)
        assert out["center"].shape == (B, 32, 3)
        assert "vote_xyz" not in out  # no voting stage

        rng = np.random.default_rng(1)
        k2 = 8
        ep = dict(out)
        ep["center_label"] = jnp.asarray(
            rng.random((B, k2, 3)).astype(np.float32) * 4)
        ep["box_label_mask"] = jnp.ones((B, k2), jnp.float32)
        ep["sem_cls_label"] = jnp.zeros((B, k2), jnp.int32)
        ep["heading_class_label"] = jnp.zeros((B, k2), jnp.int32)
        ep["heading_residual_label"] = jnp.zeros((B, k2), jnp.float32)
        ep["size_class_label"] = jnp.zeros((B, k2), jnp.int32)
        ep["size_residual_label"] = jnp.zeros((B, k2, 3), jnp.float32)
        ep["vote_label_mask"] = jnp.ones((B, N), jnp.int32)
        loss, aux = L.get_loss_boxnet(ep, CFG)
        assert np.isfinite(float(loss))
        assert "vote_loss" not in aux


class TestMSG:
    def test_multi_scale_concat(self, cloud):
        msg = SAModuleMSG(npoint=64, radii=[0.2, 0.4],
                          nsamples=[8, 16], mlps=[[16, 16], [16, 32]])
        variables = msg.init(jax.random.PRNGKey(0), cloud, train=False)
        new_xyz, feats, inds = msg.apply(variables, cloud, train=False)
        assert new_xyz.shape == (B, 64, 3)
        assert feats.shape == (B, 64, 16 + 32)  # concat of branches
        assert inds.shape == (B, 64)

    def test_group_all(self, cloud):
        feats = jnp.ones((B, N, 5))
        grouped, gxyz = group_all(cloud, feats)
        assert grouped.shape == (B, 1, N, 8)
        assert gxyz.shape == (B, 1, N, 3)


class TestPcUtil:
    def test_ply_roundtrip(self, tmp_path):
        pts = np.random.default_rng(0).random((10, 3))
        write_ply(pts, tmp_path / "a.ply")
        txt = (tmp_path / "a.ply").read_text()
        assert "element vertex 10" in txt
        write_ply_rgb(pts, np.full((10, 3), 255), tmp_path / "b.ply")
        assert "property uchar red" in (tmp_path / "b.ply").read_text()

    def test_bbox_writers(self, tmp_path):
        boxes = np.array([[0, 0, 0, 1, 2, 3]])
        write_bbox(boxes, tmp_path / "bb.ply")
        txt = (tmp_path / "bb.ply").read_text()
        assert "element vertex 8" in txt and "element face 12" in txt
        obbs = np.array([[0, 0, 0, 1, 2, 3, 0.5]])
        write_oriented_bbox(obbs, tmp_path / "obb.ply")
        assert "element face 12" in (tmp_path / "obb.ply").read_text()

    def test_point_cloud_to_bbox(self):
        pts = np.array([[0, 0, 0], [2, 4, 6.0]])
        np.testing.assert_allclose(point_cloud_to_bbox(pts),
                                   [1, 2, 3, 2, 4, 6])


def test_dump_results(tmp_path):
    from backtoreality_tpu.eval.dump_helper import dump_results

    rng = np.random.default_rng(0)
    b, k, k2, n = 1, 8, 4, 100
    ep = {
        "point_clouds": rng.random((b, n, 3)),
        "seed_xyz": rng.random((b, 16, 3)),
        "vote_xyz": rng.random((b, 16, 3)),
        "aggregated_vote_xyz": rng.random((b, k, 3)),
        "objectness_scores": np.stack(
            [np.full((b, k), -5.0), np.full((b, k), 5.0)], -1),
        "center": rng.random((b, k, 3)),
        "heading_scores": rng.random((b, k, CFG.num_heading_bin)),
        "heading_residuals": rng.random((b, k, CFG.num_heading_bin)),
        "size_scores": rng.random((b, k, CFG.num_size_cluster)),
        "size_residuals": rng.random(
            (b, k, CFG.num_size_cluster, 3)) * 0.1,
        "center_label": rng.random((b, k2, 3)),
        "heading_class_label": np.zeros((b, k2), int),
        "heading_residual_label": np.zeros((b, k2)),
        "size_class_label": np.zeros((b, k2), int),
        "size_residual_label": np.zeros((b, k2, 3)),
        "box_label_mask": np.ones((b, k2)),
    }
    dump_results(ep, tmp_path, CFG)
    names = {p.name for p in tmp_path.iterdir()}
    assert "000000_pc.ply" in names
    assert "000000_pred_confident_nms_bbox.ply" in names
    assert "000000_gt_bbox.ply" in names
