"""Set-Abstraction and Feature-Propagation modules.

TPU-native re-design of `pointnet2_modules.py` (PointnetSAModuleVotes
:164-272, PointnetSAModuleCenters :357-451, PointnetFPModule :454-514):

* channels-last (B, N, C) features;
* FPS / ball-query from the Pallas-backed op library;
* grouping -> center-subtract -> (optional /radius) -> concat xyz ->
  SharedMLP -> pool, all fused by XLA into MXU matmuls over the
  (npoint*nsample) position axis;
* pooling modes max / avg / rbf as in the reference.
"""

import typing as tp

import jax.numpy as jnp
from flax import linen as nn

from backtoreality_tpu import ops
from backtoreality_tpu.nn.mlp import SharedMLP


class _GroupMixin:
    def _group(self, xyz, new_xyz, features):
        """Ball-query + group + localize. Returns (grouped, local_xyz)
        with grouped (B, npoint, nsample, C[+3]) and local_xyz the
        center-relative coordinates — radius-normalized when
        normalize_xyz, exactly the tensor the reference's
        `ret_grouped_xyz` returns (`pointnet2_utils.py:348-352`), which
        the rbf pooling consumes."""
        if self.query_mode == "exact":
            idx = ops.ball_query(xyz, new_xyz, self.radius, self.nsample)
            group = lambda p: ops.group_points(p, idx)
        else:
            # Stratified path: gather-free grouping (one-hot MXU
            # contraction) — XLA's TPU gather is scalar-core-bound and
            # dominates the backbone otherwise.
            idx, hit = ops.ball_query_stratified(
                xyz, new_xyz, self.radius, self.nsample, return_hit=True
            )
            group = lambda p: ops.group_points_stratified(p, idx, hit)
        if features is not None:
            both = group(jnp.concatenate([xyz, features], -1))
            grouped_xyz = both[..., :3] - new_xyz[:, :, None, :]
            grouped_feats = both[..., 3:]
        else:
            grouped_xyz = group(xyz) - new_xyz[:, :, None, :]
            grouped_feats = None
        local_xyz = grouped_xyz
        if self.normalize_xyz:
            local_xyz = grouped_xyz / self.radius
        if grouped_feats is not None:
            if self.use_xyz:
                grouped = jnp.concatenate([local_xyz, grouped_feats], -1)
            else:
                grouped = grouped_feats
        else:
            grouped = local_xyz
        return grouped, local_xyz

    def _pool(self, new_features, grouped_xyz):
        """(B, npoint, nsample, C) -> (B, npoint, C)."""
        if self.pooling == "max":
            return jnp.max(new_features, axis=2)
        if self.pooling == "avg":
            return jnp.mean(new_features, axis=2)
        if self.pooling == "rbf":
            # `pointnet2_modules.py:261-266`
            sigma = self.sigma if self.sigma is not None else self.radius / 2
            rbf = jnp.exp(
                -jnp.sum(jnp.square(grouped_xyz), -1) / (sigma**2) / 2
            )  # (B, npoint, nsample)
            return (
                jnp.sum(new_features * rbf[..., None], axis=2)
                / self.nsample
            )
        raise ValueError(f"unknown pooling {self.pooling!r}")


class SAModuleVotes(nn.Module, _GroupMixin):
    """Set abstraction with external-indices support
    (`PointnetSAModuleVotes`, `pointnet2_modules.py:164-272`)."""

    npoint: int
    radius: float
    nsample: int
    mlp: tp.Sequence[int]
    use_xyz: bool = True
    normalize_xyz: bool = False
    pooling: str = "max"
    sigma: float | None = None
    query_mode: str = "stratified"
    fps_candidates: int | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, xyz, features=None, inds=None, *, train: bool,
        bn_momentum=0.1
    ):
        """xyz (B,N,3); features (B,N,C) or None; inds optional (B,npoint).

        Returns (new_xyz (B,npoint,3), new_features (B,npoint,mlp[-1]),
        inds (B,npoint))."""
        if inds is None:
            inds = ops.furthest_point_sample(
                xyz, self.npoint, candidates=self.fps_candidates)
        new_xyz = ops.gather_points(xyz, inds)
        grouped, grouped_xyz = self._group(xyz, new_xyz, features)
        new_features = SharedMLP(self.mlp, dtype=self.dtype, name="mlp")(
            grouped, train=train, bn_momentum=bn_momentum
        )
        return new_xyz, self._pool(new_features, grouped_xyz), inds


class SAModuleCenters(nn.Module, _GroupMixin):
    """Set abstraction around *given* centers — the jitter head
    (`PointnetSAModuleCenters`, `pointnet2_modules.py:357-451`)."""

    radius: float
    nsample: int
    mlp: tp.Sequence[int]
    use_xyz: bool = True
    normalize_xyz: bool = False
    pooling: str = "max"
    sigma: float | None = None
    query_mode: str = "stratified"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz, features, centers, *, train: bool,
                 bn_momentum=0.1):
        """Returns (B, num_centers, mlp[-1]) features grouped at centers."""
        grouped, grouped_xyz = self._group(xyz, centers, features)
        new_features = SharedMLP(self.mlp, dtype=self.dtype, name="mlp")(
            grouped, train=train, bn_momentum=bn_momentum
        )
        return self._pool(new_features, grouped_xyz)


def group_all(xyz, features, use_xyz: bool = True):
    """`GroupAll` (`pointnet2_utils.py:379-427`): the whole cloud as one
    region. Returns (grouped (B, 1, N, C[+3]), grouped_xyz)."""
    grouped_xyz = xyz[:, None, :, :]
    if features is not None:
        grouped = features[:, None, :, :]
        if use_xyz:
            grouped = jnp.concatenate([grouped_xyz, grouped], -1)
    else:
        grouped = grouped_xyz
    return grouped, grouped_xyz


class SAModuleMSG(nn.Module):
    """Multi-scale-grouping set abstraction (`PointnetSAModuleMSG`,
    `pointnet2_modules.py:77-126`; also covers `PointnetSAModuleMSGVotes`
    :275-354): one FPS, several (radius, nsample, mlp) branches whose
    pooled features are concatenated. npoint=None groups the whole
    cloud (GroupAll)."""

    npoint: int | None
    radii: tp.Sequence[float]
    nsamples: tp.Sequence[int]
    mlps: tp.Sequence[tp.Sequence[int]]
    use_xyz: bool = True
    normalize_xyz: bool = False
    query_mode: str = "stratified"
    fps_candidates: int | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz, features=None, inds=None, *, train: bool,
                 bn_momentum=0.1):
        assert len(self.radii) == len(self.nsamples) == len(self.mlps)
        if self.npoint is not None:
            if inds is None:
                inds = ops.furthest_point_sample(
                    xyz, self.npoint, candidates=self.fps_candidates)
            new_xyz = ops.gather_points(xyz, inds)
        else:
            new_xyz = None

        outs = []
        for i, (radius, nsample, mlp) in enumerate(
                zip(self.radii, self.nsamples, self.mlps)):
            if self.npoint is None:
                grouped, _ = group_all(xyz, features, self.use_xyz)
            else:
                if self.query_mode == "exact":
                    idx = ops.ball_query(xyz, new_xyz, radius, nsample)
                    group = lambda p: ops.group_points(p, idx)
                else:
                    idx, hit = ops.ball_query_stratified(
                        xyz, new_xyz, radius, nsample, return_hit=True)
                    group = (lambda p: ops.group_points_stratified(
                        p, idx, hit))
                if features is not None:
                    both = group(jnp.concatenate([xyz, features], -1))
                    grouped_xyz = both[..., :3] - new_xyz[:, :, None, :]
                    gf = both[..., 3:]
                else:
                    grouped_xyz = group(xyz) - new_xyz[:, :, None, :]
                    gf = None
                if self.normalize_xyz:
                    grouped_xyz = grouped_xyz / radius
                if gf is not None:
                    grouped = (jnp.concatenate([grouped_xyz, gf], -1)
                               if self.use_xyz else gf)
                else:
                    grouped = grouped_xyz
            feat = SharedMLP(mlp, dtype=self.dtype,
                             name=f"mlp{i}")(grouped, train=train,
                                             bn_momentum=bn_momentum)
            outs.append(jnp.max(feat, axis=2))
        return new_xyz, jnp.concatenate(outs, axis=-1), inds


class SAModuleVotesRlt(nn.Module, _GroupMixin):
    """Relative-feature set abstraction (GF
    `pointnet2_modules.py:274-383`, dead in the reference: its grouper
    `QueryAndGroupRlt` was never committed). The surviving channel
    arithmetic (`mlp_spec[0] = 3 + 2*mlp_spec[0]`, :316-318) pins the
    intended grouping output to [local_xyz(3), neighbour_feats(C),
    neighbour_feats - center_feats(C)] — each slot carries its feature
    AND its feature relative to the sampled center's own feature; this
    implementation realizes that contract."""

    npoint: int
    radius: float
    nsample: int
    mlp: tp.Sequence[int]
    use_xyz: bool = True
    normalize_xyz: bool = False
    pooling: str = "max"
    sigma: float | None = None
    query_mode: str = "stratified"
    fps_candidates: int | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz, features, inds=None, *, train: bool,
                 bn_momentum=0.1):
        """xyz (B,N,3); features (B,N,C); inds optional (B,npoint).
        Returns (new_xyz, new_features (B,npoint,mlp[-1]), inds)."""
        if inds is None:
            inds = ops.furthest_point_sample(
                xyz, self.npoint, candidates=self.fps_candidates)
        new_xyz = ops.gather_points(xyz, inds)
        grouped, grouped_xyz = self._group(xyz, new_xyz, features)
        # _group returns [local_xyz?, feats]; peel the feature block and
        # append the center-relative difference
        feats = grouped[..., 3:] if self.use_xyz else grouped
        center_feats = ops.gather_points(features, inds)  # (B,npoint,C)
        rel = feats - center_feats[:, :, None, :]
        parts = ([grouped_xyz, feats, rel] if self.use_xyz
                 else [feats, rel])
        grouped = jnp.concatenate(parts, -1)
        new_features = SharedMLP(self.mlp, dtype=self.dtype, name="mlp")(
            grouped, train=train, bn_momentum=bn_momentum
        )
        return new_xyz, self._pool(new_features, grouped_xyz), inds


# `PointnetSAModuleOffset` (GF `pointnet2_modules.py:481-578`, unused by
# the four train paths) is set abstraction grouped at *caller-supplied*
# centers with max/avg/rbf pooling and no FPS — exactly SAModuleCenters'
# contract, so it is the same module here.
SAModuleOffset = SAModuleCenters


class LFPModuleMSG(nn.Module):
    """Learnable multi-scale feature propagation
    (`PointnetLFPModuleMSG`, Votenet `pointnet2_modules.py:517-595`,
    unused by the four train paths): for each (radius, nsample, mlp)
    scale, ball-query-group `features1`@`xyz1` around the `xyz2`
    positions, MLP + max-pool, concat the `features2` skip, then a
    post-MLP that is SHARED across scales; scale outputs concatenate
    on channels. (N.B. the reference docstring says "propagate to
    xyz1" but the code propagates onto xyz2 — we match the code.)"""

    radii: tp.Sequence[float]
    nsamples: tp.Sequence[int]
    mlps: tp.Sequence[tp.Sequence[int]]
    post_mlp: tp.Sequence[int]
    use_xyz: bool = True
    query_mode: str = "stratified"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz2, xyz1, features2, features1, *, train: bool,
                 bn_momentum=0.1):
        """xyz2 (B,N2,3) targets; xyz1 (B,N1,3) sources; features2
        (B,N2,C2) skip or None; features1 (B,N1,C1).
        Returns (B, N2, len(radii)*post_mlp[-1])."""
        assert len(self.radii) == len(self.nsamples) == len(self.mlps)
        post = SharedMLP(self.post_mlp, dtype=self.dtype,
                         name="post_mlp")
        outs = []
        for i, (radius, nsample, mlp) in enumerate(
                zip(self.radii, self.nsamples, self.mlps)):
            if self.query_mode == "exact":
                idx = ops.ball_query(xyz1, xyz2, radius, nsample)
                group = lambda p: ops.group_points(p, idx)
            else:
                idx, hit = ops.ball_query_stratified(
                    xyz1, xyz2, radius, nsample, return_hit=True)
                group = (lambda p: ops.group_points_stratified(
                    p, idx, hit))
            both = group(jnp.concatenate([xyz1, features1], -1))
            grouped_xyz = both[..., :3] - xyz2[:, :, None, :]
            gf = both[..., 3:]
            grouped = (jnp.concatenate([grouped_xyz, gf], -1)
                       if self.use_xyz else gf)
            feat = SharedMLP(mlp, dtype=self.dtype, name=f"mlp{i}")(
                grouped, train=train, bn_momentum=bn_momentum)
            feat = jnp.max(feat, axis=2)  # (B, N2, mlp[-1])
            if features2 is not None:
                feat = jnp.concatenate([feat, features2], -1)
            outs.append(post(feat[:, :, None, :], train=train,
                             bn_momentum=bn_momentum)[:, :, 0, :])
        return jnp.concatenate(outs, axis=-1)


class FPModule(nn.Module):
    """Feature propagation (`PointnetFPModule`,
    `pointnet2_modules.py:454-514`): 3-NN inverse-distance interpolation
    of `known` features onto `unknown` positions, concat skip features,
    SharedMLP."""

    mlp: tp.Sequence[int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, unknown, known, unknown_feats, known_feats, *, train: bool,
        bn_momentum=0.1
    ):
        """unknown (B,n,3); known (B,m,3); unknown_feats (B,n,C1) or None;
        known_feats (B,m,C2). Returns (B,n,mlp[-1])."""
        dist, idx = ops.three_nn(unknown, known)
        weight = 1.0 / (dist + 1e-8)
        weight = weight / jnp.sum(weight, axis=-1, keepdims=True)
        interp = ops.three_interpolate(known_feats, idx, weight)
        if unknown_feats is not None:
            feats = jnp.concatenate([interp, unknown_feats], axis=-1)
        else:
            feats = interp
        return SharedMLP(self.mlp, dtype=self.dtype, name="mlp")(
            feats, train=train, bn_momentum=bn_momentum
        )
