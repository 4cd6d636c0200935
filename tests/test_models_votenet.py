"""VoteNet model graph tests: shapes, end_points contract, gradients."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from backtoreality_tpu.data import scannet_md40_config
from backtoreality_tpu.models.votenet import VoteNet, VoteNetDA, VoteNetDAJitter

B, N = 2, 2500


def _model_kwargs(cfg):
    return dict(
        num_class=cfg.num_class,
        num_heading_bin=cfg.num_heading_bin,
        num_size_cluster=cfg.num_size_cluster,
        mean_size_arr=tuple(map(tuple, cfg.mean_size_arr.tolist())),
        num_proposal=64,
    )


@pytest.fixture(scope="module")
def cloud():
    rng = np.random.default_rng(0)
    pc = ((rng.random((B, N, 3)) * 2 - 1) * 3).astype(np.float32)
    pc[:, -200:, :] = 0.0
    return jnp.asarray(pc)


@pytest.fixture(scope="module")
def cfg():
    return scannet_md40_config()


class TestVoteNet:
    @pytest.fixture(scope="class")
    def model_and_vars(self, cfg, cloud):
        model = VoteNet(**_model_kwargs(cfg))
        variables = model.init(
            jax.random.PRNGKey(0), cloud, train=False)
        return model, variables

    def test_end_points_contract(self, model_and_vars, cfg, cloud):
        model, variables = model_and_vars
        out = model.apply(variables, cloud, train=False)
        K = 64
        expect = {
            "seed_xyz": (B, 1024, 3),
            "seed_features": (B, 1024, 256),
            "seed_inds": (B, 1024),
            "vote_xyz": (B, 1024, 3),
            "vote_features": (B, 1024, 256),
            "aggregated_vote_xyz": (B, K, 3),
            "objectness_scores": (B, K, 2),
            "center": (B, K, 3),
            "heading_scores": (B, K, cfg.num_heading_bin),
            "heading_residuals": (B, K, cfg.num_heading_bin),
            "size_scores": (B, K, cfg.num_size_cluster),
            "size_residuals": (B, K, cfg.num_size_cluster, 3),
            "pred_size": (B, K, 3),
            "sem_cls_scores": (B, K, cfg.num_class),
        }
        for key, shape in expect.items():
            assert key in out, key
            assert out[key].shape == shape, (key, out[key].shape, shape)
        assert np.isfinite(np.asarray(out["center"])).all()
        # vote features are L2-normalized (`votenet.py:93-94`)
        norms = np.linalg.norm(np.asarray(out["vote_features"]), axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-4)

    def test_train_mode_updates_batch_stats(self, model_and_vars, cloud):
        model, variables = model_and_vars
        out, mutated = model.apply(
            variables, cloud, train=True, bn_momentum=0.5,
            mutable=["batch_stats"])
        old = jax.tree_util.tree_leaves(variables["batch_stats"])
        new = jax.tree_util.tree_leaves(mutated["batch_stats"])
        changed = any(
            not np.allclose(np.asarray(o), np.asarray(n))
            for o, n in zip(old, new)
        )
        assert changed

    def test_gradients_flow(self, model_and_vars, cfg, cloud):
        model, variables = model_and_vars

        def loss_fn(params):
            out = model.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]},
                cloud, train=False)
            return (jnp.mean(jnp.square(out["center"]))
                    + jnp.mean(jnp.square(out["objectness_scores"])))

        grads = jax.grad(loss_fn)(variables["params"])
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        # the backbone must receive gradient through votes/proposals
        g = grads["backbone_net"]["sa1"]["mlp"]["dense0"]["kernel"]
        assert np.abs(np.asarray(g)).max() > 0


class TestVoteNetDA:
    def test_da_outputs_and_reversed_grad(self, cfg, cloud):
        model = VoteNetDA(**_model_kwargs(cfg))
        variables = model.init(jax.random.PRNGKey(1), cloud, train=False)
        out = model.apply(variables, cloud, train=False)
        assert out["global_d_pred"].shape == (B, 2)
        assert out["local_d_pred"].shape == (B, 64, 1)
        lp = np.asarray(out["local_d_pred"])
        assert ((lp >= 0) & (lp <= 1)).all()

    def test_jitter_variant(self, cfg, cloud):
        model = VoteNetDAJitter(**_model_kwargs(cfg))
        k = 8
        centers = jnp.zeros((B, k, 3), jnp.float32) + 0.5
        cls = jnp.zeros((B, k), jnp.int32)
        variables = model.init(
            jax.random.PRNGKey(2), cloud, centers, cls, train=False)
        out = model.apply(variables, cloud, centers, cls, train=False)
        assert out["jitter_pred"].shape == (B, k, 3)
        assert out["jitter_d_pred"].shape == (B, k, 1)
        assert out["center_features"].shape == (B, k, 128 + cfg.num_class)


def test_grad_reverse():
    from backtoreality_tpu.models.votenet.da import grad_reverse

    g = jax.grad(lambda x: jnp.sum(grad_reverse(x) * 3.0))(jnp.ones(4))
    np.testing.assert_allclose(np.asarray(g), -3.0 * np.ones(4))


def test_f32_tail_selective_precision(cfg, cloud):
    """--bf16 --f32_tail: sa1..sa3 compute in bf16 while the tail
    stages (sa4, fp1, fp2) and everything downstream stay f32, so the
    classification heads see full-precision seed features."""
    model = VoteNet(**_model_kwargs(cfg), dtype=jnp.bfloat16,
                    f32_tail=3)
    variables = model.init(jax.random.PRNGKey(0), cloud, train=False)
    out = model.apply(variables, cloud, train=False)
    # early stages emit bf16 features, tail stages f32
    assert out["sa2_features"].dtype == jnp.bfloat16
    assert out["sa3_features"].dtype == jnp.bfloat16
    assert out["sa4_features"].dtype == jnp.float32
    assert out["fp2_features"].dtype == jnp.float32
    assert out["sem_cls_scores"].dtype == jnp.float32
    assert np.isfinite(np.asarray(out["center"], np.float32)).all()
    # params stay f32 regardless of compute dtype
    leaves = jax.tree_util.tree_leaves(variables["params"])
    assert all(l.dtype == jnp.float32 for l in leaves)
