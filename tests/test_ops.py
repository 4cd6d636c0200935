"""Unit tests for the point-cloud op library vs numpy oracles."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import importlib

from backtoreality_tpu import ops

# importlib: the package re-exports functions whose names shadow the
# submodule attributes (ops.ball_query is the function, not the module).
bq = importlib.import_module("backtoreality_tpu.ops.ball_query")
fps_mod = importlib.import_module("backtoreality_tpu.ops.fps")
from backtoreality_tpu.ops.interpolate import interpolation_weights

from oracles import (
    ball_query_oracle,
    ball_query_stratified_oracle,
    fps_oracle,
    nn_distance_oracle,
    three_nn_oracle,
)


def make_cloud(rng, b, n, pad_frac=0.1, scale=3.0):
    """Random cloud with a padded (near-origin) tail, like real batches."""
    xyz = (rng.random((b, n, 3)) * 2 - 1) * scale
    npad = int(n * pad_frac)
    if npad:
        xyz[:, n - npad:, :] = 0.0
    return xyz.astype(np.float32)


def safe_radius(xyz, centers, r, margin=1e-3):
    """Nudge r so no pairwise distance sits within `margin` of the radius.

    The op computes d^2 via the expansion form (an MXU matmul); the oracle
    uses the f64 subtraction form. Points exactly at the boundary could
    classify differently, which is irrelevant in practice but breaks exact
    index comparison — so tests pick a boundary-free radius.
    """
    d2 = np.sum(
        (centers[:, :, None, :].astype(np.float64)
         - xyz[:, None, :, :].astype(np.float64)) ** 2,
        axis=-1,
    ).ravel()
    r2 = r * r
    while np.any(np.abs(d2 - r2) < margin):
        r2 += 2 * margin
    return float(np.sqrt(r2))


class TestFPS:
    @pytest.mark.parametrize("b,n,m", [(2, 128, 16), (3, 257, 33)])
    def test_xla_matches_oracle(self, b, n, m):
        rng = np.random.default_rng(0)
        xyz = make_cloud(rng, b, n)
        got = np.asarray(fps_mod._fps_xla(jnp.asarray(xyz), m))
        want = fps_oracle(xyz, m)
        np.testing.assert_array_equal(got, want)

    def test_pallas_matches_xla(self):
        rng = np.random.default_rng(1)
        xyz = make_cloud(rng, 2, 256, pad_frac=0.2)
        got = np.asarray(fps_mod._fps_pallas(jnp.asarray(xyz), 32))
        want = np.asarray(fps_mod._fps_xla(jnp.asarray(xyz), 32))
        np.testing.assert_array_equal(got, want)

    def test_all_padding_row(self):
        xyz = np.zeros((1, 64, 3), dtype=np.float32)
        got = np.asarray(ops.furthest_point_sample(jnp.asarray(xyz), 8))
        np.testing.assert_array_equal(got, np.zeros((1, 8), np.int32))

    def test_samples_are_spread(self):
        # FPS on a line of points should pick the endpoints early.
        xyz = np.zeros((1, 100, 3), dtype=np.float32)
        xyz[0, :, 0] = np.linspace(1.0, 10.0, 100)
        idx = np.asarray(ops.furthest_point_sample(jnp.asarray(xyz), 3))[0]
        assert idx[0] == 0
        assert idx[1] == 99  # farthest from x=1 is x=10
        assert abs(int(idx[2]) - 49) <= 1  # then the middle

    def test_pallas_capacity_path_matches(self, monkeypatch):
        # Force the per-row capacity kernel (used for clouds whose
        # (B, N) field exceeds scoped VMEM) on a small input and check
        # bit-equality with the whole-batch path.
        rng = np.random.default_rng(7)
        xyz = make_cloud(rng, 3, 2048, pad_frac=0.1)
        want = np.asarray(fps_mod._fps_pallas(jnp.asarray(xyz), 32))
        monkeypatch.setattr(fps_mod, "_FPS_VMEM_BUDGET", 1)
        fps_mod._fps_pallas.clear_cache()
        try:
            got = np.asarray(fps_mod._fps_pallas(jnp.asarray(xyz), 32))
        finally:
            fps_mod._fps_pallas.clear_cache()
        np.testing.assert_array_equal(got, want)

    def test_candidates_subset(self):
        # subset-FPS samples only from the first `candidates` points and
        # equals full FPS run on that prefix.
        rng = np.random.default_rng(5)
        xyz = make_cloud(rng, 2, 256, pad_frac=0.0, scale=2.0)
        got = np.asarray(ops.furthest_point_sample(
            jnp.asarray(xyz), 16, candidates=64))
        want = np.asarray(ops.furthest_point_sample(
            jnp.asarray(xyz[:, :64]), 16))
        np.testing.assert_array_equal(got, want)
        assert got.max() < 64


class TestBallQuery:
    @pytest.mark.parametrize(
        "b,n,m,r,s", [(2, 200, 31, 1.2, 8), (1, 64, 64, 0.7, 16)]
    )
    def test_exact_matches_oracle(self, b, n, m, r, s):
        rng = np.random.default_rng(2)
        xyz = make_cloud(rng, b, n, pad_frac=0.0, scale=2.0)
        centers = xyz[:, :m].copy()
        r = safe_radius(xyz, centers, r)
        got = np.asarray(
            ops.ball_query(jnp.asarray(xyz), jnp.asarray(centers), r, s,
                           chunk=16)
        )
        want = ball_query_oracle(xyz, centers, r, s)
        np.testing.assert_array_equal(got, want)

    def test_no_hits_returns_zero(self):
        xyz = np.ones((1, 32, 3), dtype=np.float32) * 5.0
        centers = -np.ones((1, 4, 3), dtype=np.float32) * 5.0
        got = np.asarray(
            ops.ball_query(jnp.asarray(xyz), jnp.asarray(centers), 0.5, 8)
        )
        np.testing.assert_array_equal(got, np.zeros((1, 4, 8), np.int32))

    @pytest.mark.parametrize("n", [200, 256])
    def test_stratified_matches_oracle(self, n):
        rng = np.random.default_rng(3)
        xyz = make_cloud(rng, 2, n, pad_frac=0.0, scale=1.5)
        centers = xyz[:, :16].copy()
        r = safe_radius(xyz, centers, 0.9)
        want = ball_query_stratified_oracle(xyz, centers, r, 8)
        got_xla, hit_xla = bq._ball_query_stratified_xla(
            jnp.asarray(xyz), jnp.asarray(centers), r, 8
        )
        np.testing.assert_array_equal(np.asarray(got_xla), want)
        got_pl, hit_pl = bq._ball_query_stratified_pallas(
            jnp.asarray(xyz), jnp.asarray(centers), r, 8, 16
        )
        np.testing.assert_array_equal(np.asarray(got_pl), want)
        np.testing.assert_array_equal(np.asarray(hit_pl),
                                      np.asarray(hit_xla))

    def test_stratified_indices_within_radius(self):
        rng = np.random.default_rng(4)
        xyz = make_cloud(rng, 1, 300, pad_frac=0.0)
        centers = xyz[:, :32].copy()
        idx = np.asarray(
            ops.ball_query_stratified(
                jnp.asarray(xyz), jnp.asarray(centers), 1.0, 16
            )
        )
        grouped = np.take_along_axis(
            xyz[:, :, None, :].repeat(32, 2).transpose(0, 2, 1, 3),
            idx[..., None].repeat(3, -1),
            axis=2,
        )  # (1, 32, 16, 3) ... gather per center
        d = np.linalg.norm(grouped - centers[:, :, None, :], axis=-1)
        # every center here has >=1 true hit, so all slots must be hits
        assert (d < 1.0 + 1e-5).all()


class TestInterpolate:
    def test_three_nn_matches_oracle(self):
        rng = np.random.default_rng(5)
        unknown = make_cloud(rng, 2, 50, pad_frac=0.0)
        known = make_cloud(rng, 2, 20, pad_frac=0.0)
        dist, idx = ops.three_nn(jnp.asarray(unknown), jnp.asarray(known))
        wdist, widx = three_nn_oracle(unknown, known)
        np.testing.assert_array_equal(np.asarray(idx), widx)
        np.testing.assert_allclose(np.asarray(dist), wdist, atol=1e-4)

    def test_three_interpolate_forward(self):
        rng = np.random.default_rng(6)
        feats = rng.random((2, 20, 7)).astype(np.float32)
        idx = rng.integers(0, 20, (2, 30, 3)).astype(np.int32)
        w = rng.random((2, 30, 3)).astype(np.float32)
        got = np.asarray(
            ops.three_interpolate(jnp.asarray(feats), jnp.asarray(idx),
                                  jnp.asarray(w))
        )
        want = np.einsum(
            "bnkc,bnk->bnc",
            feats[np.arange(2)[:, None, None], idx],
            w,
        )
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_three_interpolate_grad(self):
        # Mirror of the reference's only assertion test: gradcheck of
        # three_interpolate (`pointnet2/pointnet2_test.py:18-33`).
        rng = np.random.default_rng(7)
        feats = jnp.asarray(rng.random((1, 8, 4)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, 8, (1, 10, 3)), jnp.int32)
        w = jnp.asarray(rng.random((1, 10, 3)), jnp.float32)
        cot = jnp.asarray(rng.random((1, 10, 4)), jnp.float32)

        def f(feats, w):
            return jnp.sum(ops.three_interpolate(feats, idx, w) * cot)

        gf, gw = jax.grad(f, argnums=(0, 1))(feats, w)
        eps = 1e-3
        for args, g in ((0, gf), (1, gw)):
            x = [feats, w][args]
            flat = np.asarray(x).ravel()
            num = np.zeros_like(flat)
            for i in range(flat.size):
                xp, xm = flat.copy(), flat.copy()
                xp[i] += eps
                xm[i] -= eps
                fp = [feats, w]
                fp[args] = jnp.asarray(xp.reshape(x.shape))
                fm = [feats, w]
                fm[args] = jnp.asarray(xm.reshape(x.shape))
                num[i] = (f(*fp) - f(*fm)) / (2 * eps)
            np.testing.assert_allclose(
                np.asarray(g).ravel(), num, atol=5e-2, rtol=5e-2
            )


class TestGrouping:
    def test_gather_points(self):
        rng = np.random.default_rng(8)
        pts = rng.random((2, 10, 5)).astype(np.float32)
        idx = rng.integers(0, 10, (2, 4)).astype(np.int32)
        got = np.asarray(ops.gather_points(jnp.asarray(pts),
                                           jnp.asarray(idx)))
        want = pts[np.arange(2)[:, None], idx]
        np.testing.assert_array_equal(got, want)

    def test_group_points_and_grad(self):
        rng = np.random.default_rng(9)
        pts = rng.random((2, 10, 5)).astype(np.float32)
        idx = rng.integers(0, 10, (2, 4, 3)).astype(np.int32)
        got = np.asarray(ops.group_points(jnp.asarray(pts),
                                          jnp.asarray(idx)))
        want = pts[np.arange(2)[:, None, None], idx]
        np.testing.assert_array_equal(got, want)
        # Gradient = scatter-add of the cotangent (reference
        # group_points_grad, `group_points_gpu.cu:66-68`).
        g = jax.grad(
            lambda p: jnp.sum(ops.group_points(p, jnp.asarray(idx)))
        )(jnp.asarray(pts))
        want_g = np.zeros_like(pts)
        for b in range(2):
            for i in range(4):
                for j in range(3):
                    want_g[b, idx[b, i, j]] += 1.0
        np.testing.assert_allclose(np.asarray(g), want_g, rtol=1e-6)

    @pytest.mark.parametrize("use_pallas", [False, True])
    @pytest.mark.parametrize("radius_frac", [0.9, 0.25])
    def test_group_points_stratified_matches_gather(self, use_pallas,
                                                    radius_frac):
        """Gather-free grouping == group_points(idx) bit-exactly,
        including slot-filled and zero-hit centers; gradient matches
        the scatter-add to reduction-order tolerance. The Pallas
        variant runs in interpret mode on CPU."""
        rng = np.random.default_rng(11)
        xyz = make_cloud(rng, 2, 300, pad_frac=0.0, scale=1.5)
        centers = xyz[:, :24].copy()
        centers[0, 0] = 50.0  # a center with no neighbors at all
        r = safe_radius(xyz, centers, radius_frac)
        feats = rng.random((2, 300, 7)).astype(np.float32)
        idx, hit = ops.ball_query_stratified(
            jnp.asarray(xyz), jnp.asarray(centers), r, 8, return_hit=True
        )
        want = np.asarray(ops.group_points(jnp.asarray(feats), idx))
        got = np.asarray(ops.group_points_stratified(
            jnp.asarray(feats), idx, hit, use_pallas=use_pallas))
        np.testing.assert_array_equal(got, want)
        g_new = jax.grad(lambda p: jnp.sum(jnp.sin(
            ops.group_points_stratified(
                p, idx, hit, use_pallas=use_pallas) * 0.3)))(
            jnp.asarray(feats))
        g_ref = jax.grad(lambda p: jnp.sum(jnp.sin(
            ops.group_points(p, idx) * 0.3)))(jnp.asarray(feats))
        np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                                   rtol=1e-5, atol=1e-6)


class TestChamfer:
    def test_matches_double_loop(self):
        rng = np.random.default_rng(10)
        pc1 = rng.random((2, 15, 3)).astype(np.float32)
        pc2 = rng.random((2, 9, 3)).astype(np.float32)
        d1, i1, d2, i2 = ops.nn_distance(jnp.asarray(pc1), jnp.asarray(pc2))
        wd1, wi1, wd2, wi2 = nn_distance_oracle(pc1, pc2)
        np.testing.assert_allclose(np.asarray(d1), wd1, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(d2), wd2, rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(i1), wi1)
        np.testing.assert_array_equal(np.asarray(i2), wi2)

    def test_huber(self):
        err = jnp.asarray([-2.0, -0.5, 0.0, 0.5, 2.0])
        got = np.asarray(ops.huber_loss(err, delta=1.0))
        want = np.asarray([1.5, 0.125, 0.0, 0.125, 1.5])
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_interpolation_weights_sum_to_one(self):
        d = jnp.asarray(np.random.default_rng(11).random((2, 5, 3)),
                        jnp.float32)
        w = interpolation_weights(d)
        np.testing.assert_allclose(
            np.asarray(jnp.sum(w, -1)), np.ones((2, 5)), rtol=1e-5
        )


def test_sample_uniformly():
    """sample_uniformly spreads fill duplicates uniformly over the
    found neighbors (`pointnet2_utils.py:336-345` contract)."""
    import jax

    from backtoreality_tpu import ops

    # region 0: 3 distinct neighbors (7, 2, 9) then fills of 7
    # region 1: 1 neighbor (4) -> all slots stay 4
    idx = jnp.asarray([[[7, 2, 9, 7, 7, 7], [4, 4, 4, 4, 4, 4]]],
                      jnp.int32)
    out, cnt = ops.sample_uniformly(idx, jax.random.PRNGKey(0))
    assert cnt.tolist() == [[3, 1]]
    # distinct prefix preserved in place
    assert out[0, 0, :3].tolist() == [7, 2, 9]
    assert out[0, 1].tolist() == [4] * 6
    # fill slots draw only from the found neighbors
    assert set(np.asarray(out[0, 0, 3:]).tolist()) <= {7, 2, 9}
    # over many keys, every unique neighbor appears in fill slots
    seen = set()
    for k in range(20):
        o, _ = ops.sample_uniformly(idx, jax.random.PRNGKey(k))
        seen |= set(np.asarray(o[0, 0, 3:]).tolist())
    assert seen == {7, 2, 9}
