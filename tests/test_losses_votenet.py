"""VoteNet loss tests: hand-constructed scenes with known values."""

import numpy as np
import pytest

import jax.numpy as jnp

from backtoreality_tpu.data import scannet_md40_config
from backtoreality_tpu.losses import votenet as L

CFG = scannet_md40_config()
K2 = 8  # GT slots


def make_end_points(b=2, n=64, num_seed=16, k=8, seed=0):
    """Random but consistent model outputs + labels."""
    rng = np.random.default_rng(seed)
    ep = {
        "seed_xyz": rng.random((b, num_seed, 3)).astype(np.float32) * 4,
        "seed_inds": rng.integers(0, n, (b, num_seed)).astype(np.int32),
        "vote_xyz": rng.random((b, num_seed, 3)).astype(np.float32) * 4,
        "aggregated_vote_xyz":
            rng.random((b, k, 3)).astype(np.float32) * 4,
        "objectness_scores": rng.standard_normal((b, k, 2)).astype(
            np.float32),
        "center": rng.random((b, k, 3)).astype(np.float32) * 4,
        "heading_scores": rng.standard_normal(
            (b, k, CFG.num_heading_bin)).astype(np.float32),
        "heading_residuals_normalized": rng.standard_normal(
            (b, k, CFG.num_heading_bin)).astype(np.float32) * 0.1,
        "size_scores": rng.standard_normal(
            (b, k, CFG.num_size_cluster)).astype(np.float32),
        "size_residuals_normalized": rng.standard_normal(
            (b, k, CFG.num_size_cluster, 3)).astype(np.float32) * 0.1,
        "sem_cls_scores": rng.standard_normal(
            (b, k, CFG.num_class)).astype(np.float32),
        # labels
        "center_label": rng.random((b, K2, 3)).astype(np.float32) * 4,
        "box_label_mask": (rng.random((b, K2)) > 0.4).astype(np.float32),
        "sem_cls_label": rng.integers(0, CFG.num_class, (b, K2)).astype(
            np.int32),
        "heading_class_label": np.zeros((b, K2), np.int32),
        "heading_residual_label": np.zeros((b, K2), np.float32),
        "size_class_label": rng.integers(
            0, CFG.num_size_cluster, (b, K2)).astype(np.int32),
        "size_residual_label": rng.standard_normal(
            (b, K2, 3)).astype(np.float32) * 0.05,
        "vote_label": rng.standard_normal((b, n, 9)).astype(
            np.float32) * 0.2,
        "vote_label_mask": (rng.random((b, n)) > 0.5).astype(np.int32),
    }
    return {key: jnp.asarray(v) for key, v in ep.items()}


class TestVoteLoss:
    def test_perfect_votes_zero_loss(self):
        b, n, num_seed = 1, 8, 4
        seed_xyz = np.arange(b * num_seed * 3, dtype=np.float32).reshape(
            b, num_seed, 3)
        seed_inds = np.arange(num_seed, dtype=np.int32)[None]
        # GT vote offsets: all three GT votes identical = +1 on x
        off = np.zeros((b, n, 9), np.float32)
        off[:, :, 0] = off[:, :, 3] = off[:, :, 6] = 1.0
        vote_xyz = seed_xyz.copy()
        vote_xyz[..., 0] += 1.0  # predicted votes hit GT exactly
        ep = {
            "seed_xyz": jnp.asarray(seed_xyz),
            "seed_inds": jnp.asarray(seed_inds),
            "vote_xyz": jnp.asarray(vote_xyz),
            "vote_label": jnp.asarray(off),
            "vote_label_mask": jnp.ones((b, n), jnp.int32),
        }
        assert float(L.compute_vote_loss(ep)) == pytest.approx(0.0,
                                                               abs=1e-6)

    def test_shifted_votes_l1(self):
        b, n, num_seed = 1, 4, 2
        seed_xyz = np.zeros((b, num_seed, 3), np.float32)
        seed_xyz[0, 1] = 10.0  # separate the seeds
        seed_inds = np.arange(num_seed, dtype=np.int32)[None]
        off = np.zeros((b, n, 9), np.float32)
        vote_xyz = seed_xyz.copy()
        vote_xyz[..., 1] += 0.25  # off by 0.25 in y from all GT votes
        ep = {
            "seed_xyz": jnp.asarray(seed_xyz),
            "seed_inds": jnp.asarray(seed_inds),
            "vote_xyz": jnp.asarray(vote_xyz),
            "vote_label": jnp.asarray(off),
            "vote_label_mask": jnp.ones((b, n), jnp.int32),
        }
        # L1 distance per seed = 0.25; masked mean = 0.25
        assert float(L.compute_vote_loss(ep)) == pytest.approx(0.25,
                                                               rel=1e-5)


class TestObjectness:
    def test_labels_and_mask(self):
        # proposals at distance 0.1 (pos), 0.45 (gray), 1.0 (neg)
        agg = jnp.asarray(
            [[[0.1, 0, 0], [0.45, 0, 0], [1.0, 0, 0]]], jnp.float32)
        gt = jnp.zeros((1, 2, 3), jnp.float32)
        ep = {
            "aggregated_vote_xyz": agg,
            "center_label": gt,
            "objectness_scores": jnp.zeros((1, 3, 2), jnp.float32),
        }
        loss, label, mask, assign = L.compute_objectness_loss(ep)
        np.testing.assert_array_equal(np.asarray(label), [[1, 0, 0]])
        np.testing.assert_array_equal(np.asarray(mask), [[1, 0, 1]])
        # uniform logits: CE = -log(0.5) weighted 0.8 (pos) / 0.2 (neg)
        want = (0.8 * np.log(2) + 0.2 * np.log(2)) / 2
        assert float(loss) == pytest.approx(want, rel=1e-5)


class TestCompositions:
    @pytest.mark.parametrize("fn", ["get_loss", "get_loss_weak"])
    def test_finite_and_logged(self, fn):
        ep = make_end_points()
        loss, aux = getattr(L, fn)(ep, CFG)
        assert np.isfinite(float(loss))
        for key in ["vote_loss", "objectness_loss", "center_loss",
                    "sem_cls_loss", "box_loss", "loss", "pos_ratio",
                    "neg_ratio", "obj_acc"]:
            assert key in aux, key
            assert np.isfinite(np.asarray(aux[key])).all(), key
        assert float(aux["loss"]) == pytest.approx(float(loss))

    def test_da(self):
        ep_S = make_end_points(seed=1)
        ep_T = make_end_points(seed=2)
        for ep in (ep_S, ep_T):
            ep["global_d_pred"] = jnp.zeros((2, 2), jnp.float32)
            ep["local_d_pred"] = jnp.full((2, 8, 1), 0.5, jnp.float32)
        loss, aux = L.get_loss_DA(ep_S, ep_T, CFG)
        assert np.isfinite(float(loss))
        assert "da_loss" in aux and np.isfinite(float(aux["da_loss"]))

    def test_da_jitter_refinement(self):
        ep_S = make_end_points(seed=3)
        ep_T = make_end_points(seed=4)
        for ep in (ep_S, ep_T):
            ep["global_d_pred"] = jnp.zeros((2, 2), jnp.float32)
            ep["local_d_pred"] = jnp.full((2, 8, 1), 0.5, jnp.float32)
            ep["jitter_pred"] = jnp.full((2, K2, 3), 0.1, jnp.float32)
            ep["center_jitter"] = jnp.full((2, K2, 3), 0.05, jnp.float32)
            ep["jitter_d_pred"] = jnp.full((2, K2, 1), 0.5, jnp.float32)
        loss0, aux0 = L.get_loss_DA_jitter(ep_S, ep_T, 0, CFG)
        loss60, aux60 = L.get_loss_DA_jitter(ep_S, ep_T, 60, CFG)
        assert np.isfinite(float(loss0)) and np.isfinite(float(loss60))
        # jitter MSE: pred 0.1 vs gt 0.05 -> 0.0025
        assert float(aux0["jitter_loss_S"]) == pytest.approx(0.0025,
                                                             rel=1e-4)
        # at epoch 0 labels are unrefined; at epoch 60 they differ
        assert float(loss0) != float(loss60)

    def test_refine_ramp(self):
        ep_S = make_end_points(seed=5)
        ep_T = make_end_points(seed=6)
        ep_S["center_jitter"] = jnp.ones((2, K2, 3), jnp.float32)
        ep_T["jitter_pred"] = jnp.ones((2, K2, 3), jnp.float32)
        new_S, new_T = L.refine_center_labels(ep_S, ep_T, 30)
        np.testing.assert_allclose(
            np.asarray(new_S["center_label"]),
            np.asarray(ep_S["center_label"]) - 0.5, rtol=1e-5)
        mask = np.asarray(ep_T["box_label_mask"])[..., None]
        np.testing.assert_allclose(
            np.asarray(new_T["center_label"]),
            np.asarray(ep_T["center_label"]) - 0.5 * mask, rtol=1e-5)
