"""Coverage for the reference's dead/unused components, re-built as
runnable capabilities: the extra pointnet2 modules
(`LFPModuleMSG`, `SAModuleOffset`, `SAModuleVotesRlt`,
Votenet `pointnet2_modules.py:517-595`, GF `pointnet2_modules.py:
274-383,481-578`), `Pointnet2Backbone_cam`
(`backbone_module.py:265-367`), the experimental VoteNet loss variants
(`loss_helper.py:806-1039`), and the GF pseudo-label suite
(`GroupFree3D/models/loss_helper.py:777-1146`).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from backtoreality_tpu import nn as btr_nn
from backtoreality_tpu.data import scannet_md40_config
from backtoreality_tpu.losses import votenet as VL
from backtoreality_tpu.losses import groupfree as GL

from test_losses_votenet import make_end_points
from test_reference_parity_gf import make_gf_end_points, _to_jax

CFG = scannet_md40_config()


class TestExtraModules:
    def test_sa_module_offset_is_centers(self):
        assert btr_nn.SAModuleOffset is btr_nn.SAModuleCenters

    def test_lfp_module_msg_shapes_and_shared_post_mlp(self):
        rng = np.random.default_rng(0)
        b, n1, n2, c1, c2 = 2, 64, 32, 8, 6
        xyz1 = jnp.asarray(rng.random((b, n1, 3)), jnp.float32)
        xyz2 = jnp.asarray(rng.random((b, n2, 3)), jnp.float32)
        f1 = jnp.asarray(rng.random((b, n1, c1)), jnp.float32)
        f2 = jnp.asarray(rng.random((b, n2, c2)), jnp.float32)
        mod = btr_nn.LFPModuleMSG(
            radii=[0.4, 0.8], nsamples=[8, 16],
            mlps=[[16, 16], [16, 16]], post_mlp=[24, 12])
        vars_ = mod.init(jax.random.key(0), xyz2, xyz1, f2, f1,
                         train=False)
        out = mod.apply(vars_, xyz2, xyz1, f2, f1, train=False)
        assert out.shape == (b, n2, 2 * 12)
        assert np.isfinite(np.asarray(out)).all()
        # the post-MLP is one parameter set shared by both scales
        names = set(vars_["params"].keys())
        assert "post_mlp" in names
        assert {"mlp0", "mlp1"} <= names

        # skip-less variant (features2=None)
        mod2 = btr_nn.LFPModuleMSG(
            radii=[0.4], nsamples=[8], mlps=[[16]], post_mlp=[8])
        v2 = mod2.init(jax.random.key(0), xyz2, xyz1, None, f1,
                       train=False)
        out2 = mod2.apply(v2, xyz2, xyz1, None, f1, train=False)
        assert out2.shape == (b, n2, 8)

    def test_sa_module_votes_rlt(self):
        rng = np.random.default_rng(1)
        b, n, c = 2, 64, 8
        xyz = jnp.asarray(rng.random((b, n, 3)) * 2, jnp.float32)
        feats = jnp.asarray(rng.random((b, n, c)), jnp.float32)
        mod = btr_nn.SAModuleVotesRlt(
            npoint=16, radius=0.5, nsample=8, mlp=[16, 16])
        vars_ = mod.init(jax.random.key(0), xyz, feats, train=False)
        new_xyz, new_feats, inds = mod.apply(vars_, xyz, feats,
                                             train=False)
        assert new_xyz.shape == (b, 16, 3)
        assert new_feats.shape == (b, 16, 16)
        assert inds.shape == (b, 16)
        # channel contract 3 + 2C (`pointnet2_modules.py:316-318`):
        # first conv kernel input dim must be 3 + 2*8 = 19
        first = vars_["params"]["mlp"]["dense0"]["kernel"]
        assert first.shape[-2] == 3 + 2 * c

        # external indices are honored
        ext = jnp.tile(jnp.arange(16, dtype=jnp.int32), (b, 1))
        nx, _, out_inds = mod.apply(vars_, xyz, feats, ext, train=False)
        np.testing.assert_array_equal(np.asarray(out_inds),
                                      np.asarray(ext))
        np.testing.assert_allclose(np.asarray(nx),
                                   np.asarray(xyz[:, :16]), rtol=1e-6)

    def test_ca_layer(self):
        """`CALayer` (`detection/GroupFree3D/models/detector_DA.py:
        35-53`, never instantiated): squeeze/excite over channels,
        residual `x*sig(.)+x`, flatten, BatchNorm over the N*C vector.
        Checked against a numpy oracle of that composition."""
        from backtoreality_tpu.models.groupfree import CALayer

        rng = np.random.default_rng(3)
        b, n, c = 4, 64, 32
        x = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
        mod = CALayer(channel=c, reduction=8)
        vars_ = mod.init(jax.random.key(0), x, train=False)
        out, mutated = mod.apply(vars_, x, train=True,
                                 mutable=["batch_stats"])
        assert out.shape == (b, n * c)

        p = jax.tree.map(np.asarray, vars_["params"])
        xe = np.asarray(x)
        h = np.maximum(xe @ p["Dense_0"]["kernel"]
                       + p["Dense_0"]["bias"], 0.0)
        gate = 1.0 / (1.0 + np.exp(-(h @ p["Dense_1"]["kernel"]
                                     + p["Dense_1"]["bias"])))
        y = (xe * gate + xe).reshape(b, -1)
        mean, var = y.mean(0), y.var(0)
        expect = (y - mean) / np.sqrt(var + 1e-5)
        np.testing.assert_allclose(np.asarray(out), expect,
                                   rtol=2e-3, atol=2e-5)
        # squeeze width honors the reduction factor
        assert p["Dense_0"]["kernel"].shape == (c, c // 8)
        # running stats updated with torch momentum semantics
        rm = np.asarray(mutated["batch_stats"]["BatchNorm_0"]["mean"])
        np.testing.assert_allclose(rm, 0.1 * y.mean(0), rtol=2e-3,
                                   atol=2e-5)

    def test_backbone_cam(self):
        from backtoreality_tpu.models.votenet import Pointnet2BackboneCam

        rng = np.random.default_rng(2)
        pc = jnp.asarray(rng.random((1, 4096, 4)), jnp.float32)
        bb = Pointnet2BackboneCam(input_feature_dim=1)
        vars_ = bb.init(jax.random.key(0), pc, train=False)
        ep = bb.apply(vars_, pc, train=False)
        assert ep["sa4_xyz"].shape == (1, 256, 3)
        assert ep["sa4_features"].shape == (1, 256, 256)
        assert "sa1_inds" in ep and "sa2_inds" in ep
        assert "fp2_features" not in ep  # SA-only: no FP stack


class TestDeadVotenetLosses:
    def _da_pair(self):
        ep_S = make_end_points(seed=1)
        ep_T = make_end_points(seed=2)
        for ep in (ep_S, ep_T):
            ep["global_d_pred"] = jnp.zeros((2, 2), jnp.float32)
            ep["local_d_pred"] = jnp.full((2, 8, 1), 0.5, jnp.float32)
            ep["vote_feature_d_pred"] = jnp.zeros((2, 2), jnp.float32)
            ep["cloud_label"] = jnp.asarray(
                (np.random.default_rng(3).random((2, CFG.num_class))
                 > 0.5).astype(np.float32))
        return ep_S, ep_T

    def test_da_separate(self):
        ep_S, ep_T = self._da_pair()
        loss, aux = VL.get_loss_DA_separate(ep_S, ep_T, CFG)
        assert np.isfinite(float(loss))
        # equal-weight skeleton: perfect separation zeroes only the DA
        # term; compare against hand-composed parts
        want = (aux["vote_loss_S"] + aux["vote_loss_T"]
                + 0.5 * (aux["objectness_loss_S"]
                         + aux["objectness_loss_T"])
                + aux["box_loss"] + 0.1 * aux["sem_cls_loss"]
                + aux["da_loss"]) * 10.0
        assert float(loss) == pytest.approx(float(want), rel=1e-6)

    def test_cam(self):
        ep_S, _ = self._da_pair()
        ep_S["cam"] = jnp.zeros((2, 8, CFG.num_class), jnp.float32)
        loss, _ = VL.get_loss_cam(ep_S, CFG)
        # uniform logits: BCE = log 2 regardless of labels
        assert float(loss) == pytest.approx(np.log(2.0), rel=1e-5)

    def test_da_cam(self):
        ep_S, ep_T = self._da_pair()
        loss, aux = VL.get_loss_DA_cam(ep_S, ep_T, CFG)
        assert np.isfinite(float(loss))
        assert "da_loss" in aux and "sem_cls_loss_T" in aux
        # gradient flows through the vote-feature discriminator input
        g = jax.grad(
            lambda v: VL.get_loss_DA_cam(
                dict(ep_S, vote_feature_d_pred=v), ep_T, CFG)[0]
        )(ep_S["vote_feature_d_pred"])
        assert float(jnp.abs(g).sum()) > 0


class TestPseudoSuite:
    def _teacher_preds(self, b=1, k=6, nh=1, ns=CFG.num_size_cluster,
                       nc=CFG.num_class):
        """Hand-built teacher outputs: proposals 0,1 confident (same
        class, overlapping boxes), 2 confident distinct, rest weak."""
        rng = np.random.default_rng(5)
        center = np.zeros((b, k, 3), np.float32)
        center[0, 0] = [0.0, 0.0, 0.0]
        center[0, 1] = [0.05, 0.0, 0.0]  # near-duplicate of 0
        center[0, 2] = [5.0, 5.0, 0.0]
        center[0, 3:] = rng.random((k - 3, 3)) * 10 + 20
        obj = np.full((b, k, 1), -5.0, np.float32)
        obj[0, 0, 0] = 4.0  # sigmoid ~0.982
        obj[0, 1, 0] = 3.0  # ~0.953
        obj[0, 2, 0] = 3.5
        sem = np.zeros((b, k, nc), np.float32)
        sem[0, 0, 2] = sem[0, 1, 2] = 8.0  # same confident class
        sem[0, 2, 4] = 8.0
        heading = np.zeros((b, k, nh), np.float32)
        heading_res = np.zeros((b, k, nh), np.float32)
        size = np.zeros((b, k, ns), np.float32)
        size[..., 1] = 6.0
        size_res = np.zeros((b, k, ns, 3), np.float32)
        return (center, sem, obj, heading, heading_res, size, size_res)

    def test_get_pseudo_labels_thresholds_and_nms(self):
        preds = self._teacher_preds()
        config_dict = {
            "obj_threshold": 0.9, "cls_threshold": 0.9,
            "use_lhs": True, "nms_iou": 0.25,
            "use_old_type_nms": False,
            "dataset_config": CFG,
        }
        (mask, center, sem, heading, heading_res, size, size_res,
         aux) = GL.get_pseudo_labels(*preds, config_dict=config_dict,
                                     max_num_obj=8)
        assert mask.shape == (1, 8)
        # 3 proposals pass the thresholds; NMS then drops the
        # near-duplicate same-class box -> 2 survivors
        assert int(mask.sum()) == 2
        kept_classes = sorted(sem[0][mask[0].astype(bool)].tolist())
        assert kept_classes == [2, 4]
        # suppressed + below-threshold slots are pushed to -1000
        assert (center[0][~mask[0].astype(bool)] == -1000.0).all()
        assert 0 < aux["pseudo_gt_ratio"] <= 1

        # without LHS-NMS the duplicate survives
        config_dict2 = dict(config_dict, use_lhs=False)
        mask2 = GL.get_pseudo_labels(*preds, config_dict=config_dict2,
                                     max_num_obj=8)[0]
        assert int(mask2.sum()) == 3

    def test_get_loss_pseudo_end_to_end(self):
        layers = 6
        ep = _to_jax(make_gf_end_points(seed=7, b=4, layers=layers))
        # teacher = same shapes; add the unnormalized residual keys the
        # pseudo generator consumes and a supervised/unsupervised split
        rng = np.random.default_rng(8)
        teacher = dict(ep)
        nh, ns = 1, CFG.num_size_cluster
        k = ep["4head_center"].shape[1]
        teacher["4head_heading_residuals"] = jnp.asarray(
            rng.standard_normal((4, k, nh)).astype(np.float32) * 0.1)
        teacher["4head_size_residuals"] = jnp.asarray(
            rng.standard_normal((4, k, ns, 3)).astype(np.float32) * 0.1)
        ep = dict(ep, supervised_mask=jnp.asarray([1, 1, 0, 0]))

        config_dict = {
            "obj_threshold": 0.0, "cls_threshold": 0.0,
            "use_lhs": False, "nms_iou": 0.25,
            "use_old_type_nms": False, "dataset_config": CFG,
        }
        loss, aux = GL.get_loss_pseudo(
            ep, teacher, CFG, config_dict, num_decoder_layers=layers,
            box_loss_coef=1.0, sem_cls_loss_coef=0.1)
        assert np.isfinite(float(loss))
        assert "unlabeled_detection_loss" in aux
        assert "pseudo_gt_ratio" in aux
        assert "sum_heads_box_loss" in aux
