"""Golden-activation parity: reference torch VoteNet_DA_jitter vs JAX.

The CenterRefine model (`votenet_DA.py:179-332`). Round 3 shipped a
divergent ctjt head (an extra 256-wide MLP layer, radius-normalized
grouped xyz, and raw-sa2 instead of FP2-refined input features) that
this test — added in round 4 together with the DA_jitter checkpoint
importer — caught; the jitter-head pipeline is now weight-import
bit-comparable (<5e-4) through center_features, jitter_pred, the
detection heads, and both domain discriminators.
"""

import pathlib
import sys

import numpy as np
import pytest

REF = pathlib.Path("/root/reference/detection/Votenet")
pytestmark = pytest.mark.skipif(not REF.exists(),
                                reason="reference not mounted")

B, N, K, NPROP = 1, 1024, 8, 16


@pytest.fixture(scope="module")
def ref_model():
    torch = pytest.importorskip("torch")
    sys.path.insert(0, "/root/repo")
    from backtoreality_tpu.tools import ref_loop as RL

    torch.manual_seed(0)
    np.random.seed(0)
    RL._import_reference_votenet()
    import importlib

    cfg_mod = importlib.import_module("model_util_scannet")
    mod = importlib.import_module("votenet_DA")
    DC = cfg_mod.ScannetDatasetConfig_md40()
    net = mod.VoteNet_DA_jitter(
        num_class=DC.num_class, num_heading_bin=DC.num_heading_bin,
        num_size_cluster=DC.num_size_cluster,
        mean_size_arr=DC.mean_size_arr, num_proposal=NPROP,
        input_feature_dim=1, vote_factor=1)
    net.eval()
    return net


def test_da_jitter_golden_parity(ref_model):
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    from backtoreality_tpu.data import scannet_md40_config
    from backtoreality_tpu.models.votenet import VoteNetDAJitter
    from backtoreality_tpu.tools.torch_import import (
        votenet_da_jitter_state_dict,
    )

    params, stats = votenet_da_jitter_state_dict(ref_model.state_dict())

    cfg = scannet_md40_config()
    model = VoteNetDAJitter(
        num_class=cfg.num_class, num_heading_bin=cfg.num_heading_bin,
        num_size_cluster=cfg.num_size_cluster,
        mean_size_arr=tuple(map(tuple, cfg.mean_size_arr.tolist())),
        num_proposal=NPROP, input_feature_dim=1, query_mode="exact")

    rng = np.random.default_rng(0)
    pc = (rng.random((B, N, 4), dtype=np.float32) * 2 - 1) * 2
    cl = rng.random((B, K, 3), dtype=np.float32) * 2 - 1
    scl = np.zeros((B, K), np.int32)

    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(pc),
                           jnp.asarray(cl), jnp.asarray(scl),
                           train=False)
    # the imported tree must be structurally identical (no silently
    # dropped/unused tensors)
    import jax.tree_util as jtu

    def paths(t):
        return {jtu.keystr(p) for p, _ in
                jtu.tree_flatten_with_path(t)[0]}

    assert paths(variables["params"]) == paths(params)

    out = model.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(pc), jnp.asarray(cl),
                      jnp.asarray(scl), train=False)
    with torch.no_grad():
        ep = ref_model(
            {"point_clouds": torch.from_numpy(pc)},
            torch.from_numpy(cl),
            torch.from_numpy(scl.astype(np.int64)))

    for key in ("center_features", "jitter_pred", "center",
                "global_d_pred", "local_d_pred"):
        ours = np.asarray(out[key], np.float32)
        ref = ep[key].numpy()
        if ref.shape != ours.shape:  # torch is channels-first
            ref = np.transpose(ref, (0, 2, 1))
        assert np.abs(ours - ref).max() < 5e-4, key
