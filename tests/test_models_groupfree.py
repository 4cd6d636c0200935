"""GroupFree3D model + loss tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from backtoreality_tpu.data import scannet_md40_config
from backtoreality_tpu.losses import groupfree as gfl
from backtoreality_tpu.models.groupfree import (
    GroupFreeDetector,
    GroupFreeDetectorDA,
    GroupFreeDetectorDAJitter,
)

B, N, NPROP, LAYERS = 2, 2500, 32, 2
CFG = scannet_md40_config()


def _kwargs():
    return dict(
        num_class=CFG.num_class,
        num_heading_bin=CFG.num_heading_bin,
        num_size_cluster=CFG.num_size_cluster,
        mean_size_arr=tuple(map(tuple, CFG.mean_size_arr.tolist())),
        num_proposal=NPROP,
        num_decoder_layers=LAYERS,
    )


@pytest.fixture(scope="module")
def cloud():
    rng = np.random.default_rng(0)
    pc = ((rng.random((B, N, 3)) * 2 - 1) * 3).astype(np.float32)
    return jnp.asarray(pc)


@pytest.fixture(scope="module")
def gf_out(cloud):
    model = GroupFreeDetector(**_kwargs())
    variables = model.init(jax.random.PRNGKey(0), cloud, train=False)
    out = model.apply(variables, cloud, train=False)
    return model, variables, out


class TestGroupFreeDetector:
    def test_per_head_contract(self, gf_out):
        _, _, out = gf_out
        prefixes = ["proposal_", "0head_", "last_"]
        for p in prefixes:
            assert out[f"{p}objectness_scores"].shape == (B, NPROP, 1)
            assert out[f"{p}center"].shape == (B, NPROP, 3)
            assert out[f"{p}sem_cls_scores"].shape == (
                B, NPROP, CFG.num_class)
            assert out[f"{p}size_residuals"].shape == (
                B, NPROP, CFG.num_size_cluster, 3)
        assert out["seeds_obj_cls_logits"].shape == (B, 1024, 1)
        assert out["query_points_sample_inds"].shape == (B, NPROP)
        assert out["seed_features"].shape == (B, 1024, 288)

    def test_kps_picks_top_scores(self, gf_out):
        _, _, out = gf_out
        logits = np.asarray(out["seeds_obj_cls_logits"])[..., 0]
        inds = np.asarray(out["query_points_sample_inds"])
        for b in range(B):
            top = set(np.argsort(-logits[b])[:NPROP])
            assert set(inds[b]) == top

    def test_dropout_rng_used_in_train(self, gf_out, cloud):
        model, variables, _ = gf_out
        out1, _ = model.apply(
            variables, cloud, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)})
        out2, _ = model.apply(
            variables, cloud, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(2)})
        assert not np.allclose(np.asarray(out1["last_center"]),
                               np.asarray(out2["last_center"]))


def _gf_end_points(out, rng, weak=False):
    """Attach synthetic labels to model outputs."""
    k2 = 8
    npts = N
    ep = dict(out)
    ep["center_label"] = jnp.asarray(
        rng.random((B, k2, 3)).astype(np.float32) * 4)
    ep["box_label_mask"] = jnp.asarray(
        (np.arange(k2) < 5).astype(np.float32)[None].repeat(B, 0))
    ep["sem_cls_label"] = jnp.asarray(
        rng.integers(0, CFG.num_class, (B, k2)).astype(np.int32))
    ep["heading_class_label"] = jnp.zeros((B, k2), jnp.int32)
    ep["heading_residual_label"] = jnp.zeros((B, k2), jnp.float32)
    ep["size_class_label"] = jnp.asarray(
        rng.integers(0, CFG.num_size_cluster, (B, k2)).astype(np.int32))
    ep["size_residual_label"] = jnp.asarray(
        rng.standard_normal((B, k2, 3)).astype(np.float32) * 0.05)
    ep["size_gts"] = jnp.asarray(
        CFG.mean_size_arr[np.asarray(ep["size_class_label"])])
    ep["point_obj_mask"] = jnp.asarray(
        (rng.random((B, npts)) > 0.5).astype(np.int32))
    inst = rng.integers(-1, k2, (B, npts)).astype(np.int32)
    ep["point_instance_label"] = jnp.asarray(inst)
    return ep


class TestGroupFreeLosses:
    def test_get_loss_finite(self, gf_out):
        _, _, out = gf_out
        ep = _gf_end_points(out, np.random.default_rng(1))
        loss, aux = gfl.get_loss(ep, CFG, LAYERS, 0.8, 0.1, 1.0, 0.1,
                                 query_points_obj_topk=4)
        assert np.isfinite(float(loss))
        for key in ["query_points_generation_loss",
                    "sum_heads_objectness_loss", "sum_heads_box_loss",
                    "proposal_box_loss", "last_box_loss"]:
            assert key in aux and np.isfinite(float(aux[key])), key

    def test_get_loss_weak_finite(self, gf_out):
        _, _, out = gf_out
        ep = _gf_end_points(out, np.random.default_rng(2), weak=True)
        loss, aux = gfl.get_loss_weak(ep, CFG, LAYERS, 0.8, 0.1, 1.0,
                                      0.1, query_points_obj_topk=4)
        assert np.isfinite(float(loss))

    def test_grad_flows(self, gf_out, cloud):
        model, variables, _ = gf_out
        labels = _gf_end_points({}, np.random.default_rng(3))

        def loss_fn(params):
            out = model.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]},
                cloud, train=False)
            ep = {**labels, **out}
            loss, _ = gfl.get_loss(ep, CFG, LAYERS, 0.8, 0.1, 1.0, 0.1,
                                   query_points_obj_topk=4)
            return loss

        grads = jax.grad(loss_fn)(variables["params"])
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        g = grads["backbone_net"]["sa1"]["mlp"]["dense0"]["kernel"]
        assert np.abs(np.asarray(g)).max() > 0


class TestGroupFreeDA:
    def test_da_outputs(self, cloud):
        model = GroupFreeDetectorDA(**_kwargs())
        variables = model.init(jax.random.PRNGKey(1), cloud, train=False)
        out = model.apply(variables, cloud, train=False)
        assert out["global_d_pred"].shape == (B, 2)
        assert out["last_local_d_pred"].shape == (B, NPROP, 1)

    def test_da_jitter_and_loss(self, cloud):
        model = GroupFreeDetectorDAJitter(**_kwargs())
        k2 = 8
        centers = jnp.zeros((B, k2, 3), jnp.float32) + 0.5
        cls = jnp.zeros((B, k2), jnp.int32)
        variables = model.init(jax.random.PRNGKey(2), cloud, centers,
                               cls, train=False)
        out = model.apply(variables, cloud, centers, cls, train=False)
        assert out["jitter_pred"].shape == (B, k2, 3)
        assert out["center_features"].shape == (B, k2, 128 + CFG.num_class)

        rng = np.random.default_rng(4)
        ep_S = _gf_end_points(out, rng)
        ep_T = _gf_end_points(out, rng)
        for ep in (ep_S, ep_T):
            ep["center_jitter"] = jnp.full((B, k2, 3), 0.05, jnp.float32)
        loss, aux = gfl.get_loss_DA_jitter(
            ep_S, ep_T, 10, CFG, LAYERS, 0.8, 0.1, 1.0, 0.1,
            query_points_obj_topk=4)
        assert np.isfinite(float(loss))
        assert np.isfinite(float(aux["jitter_loss_S"]))


def test_gf_f32_tail_selective_precision():
    """--bf16 --f32_tail on GF: early SA stages bf16, tail + decoder
    inputs f32 (mirrors the VoteNet knob)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from backtoreality_tpu.data import scannet_md40_config
    from backtoreality_tpu.models.groupfree import GroupFreeDetector

    cfg = scannet_md40_config()
    model = GroupFreeDetector(
        num_class=cfg.num_class, num_heading_bin=cfg.num_heading_bin,
        num_size_cluster=cfg.num_size_cluster,
        mean_size_arr=tuple(map(tuple, cfg.mean_size_arr.tolist())),
        num_proposal=16, num_decoder_layers=2, dim_feedforward=64,
        self_position_embedding="loc_learned",
        dtype=jnp.bfloat16, f32_tail=3)
    pc = jnp.asarray((np.random.default_rng(0)
                      .random((1, 1024, 3), np.float32) * 2 - 1) * 2)
    variables = model.init(jax.random.PRNGKey(0), pc, train=False)
    out = model.apply(variables, pc, train=False)
    assert out["sa2_features"].dtype == jnp.bfloat16
    assert out["fp2_features"].dtype == jnp.float32
    assert np.isfinite(
        np.asarray(out["last_center"], np.float32)).all()
