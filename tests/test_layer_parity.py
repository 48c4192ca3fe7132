"""Golden-activation parity: ACMConv vs the reference layer math.

The reference math (/root/reference/ACM-Pytorch/models/layers.py:94-232) is
re-derived here in pure NumPy from the paper formulas, with explicit
operator matrices (adj_low = D^-1(A+I), adj_high = I - adj_low), and the
flax layer must match it ``allclose`` with *injected* (shared) parameters —
the BASELINE.json activation-parity requirement.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from acmgnn_tpu.models.layers import ACMConv
from acmgnn_tpu.ops.graph import (
    Operators,
    high_pass,
    make_coo_op,
    make_dense_op,
    row_normalized_adjacency,
)


def _np_sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _np_softmax(x, axis):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def _np_layernorm(x, eps=1e-5):
    # torch nn.LayerNorm eps=1e-5 (scale=1, bias=0 at init)
    mu = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps)


def _reference_acm_layer(
    x, adj_low, adj_high, w, model_type, variant, structure_info,
    use_layernorm, adj_unnorm=None,
):
    """NumPy golden model of GraphConvolution.forward (3- and 4-channel)."""
    relu = lambda v: np.maximum(v, 0.0)

    if model_type == "acmsgc":
        h_low = adj_low @ (x @ w["weight_low"])
        h_high = adj_high @ (x @ w["weight_high"])
        h_mlp = x @ w["weight_mlp"]
    elif variant:
        h_low = adj_low @ relu(x @ w["weight_low"])
        h_high = adj_high @ relu(x @ w["weight_high"])
        h_mlp = relu(x @ w["weight_mlp"])
    else:
        h_low = relu(adj_low @ (x @ w["weight_low"]))
        h_high = relu(adj_high @ (x @ w["weight_high"]))
        h_mlp = relu(x @ w["weight_mlp"])

    channels = [h_low, h_high, h_mlp]
    att_vecs = [w["att_vec_low"], w["att_vec_high"], w["att_vec_mlp"]]
    if structure_info:
        h_struc = relu(adj_unnorm @ w["struc_low"])
        channels.append(h_struc)
        att_vecs.append(w["att_vec_struc_low"])

    t = len(channels)
    feats = [_np_layernorm(c) if use_layernorm else c for c in channels]
    scores = np.concatenate(
        [feats[i] @ att_vecs[i] for i in range(t)], axis=1
    )
    logits = (_np_sigmoid(scores) @ w["att_vec"]) / t
    att = _np_softmax(logits, axis=1)
    scale = 3.0 if t == 3 else 1.0
    return scale * sum(att[:, i : i + 1] * channels[i] for i in range(t))


def _random_weights(rng, f_in, f_out, n, structure_info):
    w = {
        "weight_low": rng.normal(size=(f_in, f_out)).astype(np.float32) * 0.3,
        "weight_high": rng.normal(size=(f_in, f_out)).astype(np.float32) * 0.3,
        "weight_mlp": rng.normal(size=(f_in, f_out)).astype(np.float32) * 0.3,
        "att_vec_low": rng.normal(size=(f_out, 1)).astype(np.float32),
        "att_vec_high": rng.normal(size=(f_out, 1)).astype(np.float32),
        "att_vec_mlp": rng.normal(size=(f_out, 1)).astype(np.float32),
    }
    t = 4 if structure_info else 3
    w["att_vec"] = rng.normal(size=(t, t)).astype(np.float32) * 0.5
    if structure_info:
        w["struc_low"] = rng.normal(size=(n, f_out)).astype(np.float32) * 0.3
        w["att_vec_struc_low"] = rng.normal(size=(f_out, 1)).astype(np.float32)
    return w


def _flax_params(w, structure_info, use_layernorm, f_out):
    params = {
        "weight_low": jnp.asarray(w["weight_low"]),
        "weight_high": jnp.asarray(w["weight_high"]),
        "weight_mlp": jnp.asarray(w["weight_mlp"]),
        "att_vec_low": jnp.asarray(w["att_vec_low"]),
        "att_vec_high": jnp.asarray(w["att_vec_high"]),
        "att_vec_mlp": jnp.asarray(w["att_vec_mlp"]),
        "att_vec": jnp.asarray(w["att_vec"]),
    }
    if structure_info:
        params["struc_low"] = jnp.asarray(w["struc_low"])
        params["att_vec_struc_low"] = jnp.asarray(w["att_vec_struc_low"])
    if use_layernorm:
        names = ["low", "high", "mlp"] + (["struc_low"] if structure_info else [])
        for nm in names:
            params[f"layer_norm_{nm}"] = {
                "scale": jnp.ones((f_out,)),
                "bias": jnp.zeros((f_out,)),
            }
    return {"params": params}


CASES = [
    # (model_type, variant, structure_info, use_layernorm)
    ("acmgcn", False, False, False),
    ("acmgcn", True, False, False),       # ACMII
    ("acmsgc", False, False, False),
    ("acmgcnp", False, False, False),     # ACM-Pytorch pipeline (LN dead)
    ("acmgcnp", False, False, True),      # ACM-Geometric pipeline (LN live)
    ("acmgcnp", False, True, False),      # 4-channel structure variant
    ("acmgcnp", True, True, True),
    ("acmgcnpp", False, True, True),
]


@pytest.mark.parametrize("model_type,variant,structure_info,use_layernorm", CASES)
@pytest.mark.parametrize("fmt", ["dense", "coo"])
def test_acmconv_matches_reference_math(
    small_graph, model_type, variant, structure_info, use_layernorm, fmt
):
    adj, features, _ = small_graph
    n = adj.shape[0]
    f_in, f_out = features.shape[1], 16
    rng = np.random.default_rng(7)

    a_low = np.asarray(row_normalized_adjacency(adj).todense())
    a_high = np.asarray(high_pass(row_normalized_adjacency(adj)).todense())
    a_unnorm = np.asarray(adj.todense())

    w = _random_weights(rng, f_in, f_out, n, structure_info)
    want = _reference_acm_layer(
        features.astype(np.float64),
        a_low,
        a_high,
        {k: v.astype(np.float64) for k, v in w.items()},
        model_type,
        variant,
        structure_info,
        use_layernorm,
        adj_unnorm=a_unnorm,
    )

    make = make_dense_op if fmt == "dense" else make_coo_op
    ops = Operators(
        adj_low=make(row_normalized_adjacency(adj)),
        adj_unnorm=make(adj) if structure_info else None,
    )
    layer = ACMConv(
        out_features=f_out,
        model_type=model_type,
        variant=variant,
        structure_info=structure_info,
        use_layernorm=use_layernorm,
        nnodes=n,
    )
    params = _flax_params(w, structure_info, use_layernorm, f_out)
    got = np.asarray(layer.apply(params, jnp.asarray(features), ops))

    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_param_shapes_and_init_ranges(small_graph):
    """Init distribution bounds follow reset_parameters
    (/root/reference/ACM-Pytorch/models/layers.py:70-92)."""
    adj, features, _ = small_graph
    n = adj.shape[0]
    f_out = 32
    ops = Operators(adj_low=make_dense_op(row_normalized_adjacency(adj)),
                    adj_unnorm=make_dense_op(adj))
    layer = ACMConv(
        out_features=f_out, model_type="acmgcnp", structure_info=True, nnodes=n
    )
    params = layer.init(jax.random.key(0), jnp.asarray(features), ops)["params"]

    stdv = 1.0 / np.sqrt(f_out)
    for name in ["weight_low", "weight_high", "weight_mlp", "struc_low"]:
        arr = np.asarray(params[name])
        assert arr.min() >= -stdv and arr.max() <= stdv
        assert arr.std() > 0.3 * stdv  # actually spread out, not degenerate
    for name in ["att_vec_low", "att_vec_high", "att_vec_mlp", "att_vec_struc_low"]:
        arr = np.asarray(params[name])
        assert arr.min() >= -1.0 and arr.max() <= 1.0
    att = np.asarray(params["att_vec"])
    assert att.shape == (4, 4)
    assert att.min() >= -0.5 and att.max() <= 0.5  # 1/sqrt(4)


def test_fused_ln_matches_per_channel_modules(small_graph, monkeypatch):
    """The fused batched LayerNorm (ACMGNN_LN_FUSED=1; default off —
    measured slower on TPU, see layers.py _make_lns) and the
    per-channel nn.LayerNorm modules share one parameter tree and
    produce the same outputs (randomized scale/bias so the affine part
    is exercised, not just the normalization)."""
    adj, features, _ = small_graph
    n = adj.shape[0]
    f_in, f_out = features.shape[1], 16
    rng = np.random.default_rng(3)
    w = _random_weights(rng, f_in, f_out, n, True)
    params = _flax_params(w, True, True, f_out)
    # randomize the LN affine params (init values 1/0 would hide bugs)
    for nm in ("low", "high", "mlp", "struc_low"):
        params["params"][f"layer_norm_{nm}"] = {
            "scale": jnp.asarray(
                rng.normal(1.0, 0.3, size=(f_out,)).astype(np.float32)
            ),
            "bias": jnp.asarray(
                rng.normal(0.0, 0.3, size=(f_out,)).astype(np.float32)
            ),
        }
    ops = Operators(
        adj_low=make_dense_op(row_normalized_adjacency(adj)),
        adj_unnorm=make_dense_op(adj),
    )
    layer = ACMConv(
        out_features=f_out, model_type="acmgcnp", structure_info=True,
        use_layernorm=True, nnodes=n,
    )
    x = jnp.asarray(features)
    monkeypatch.setenv("ACMGNN_LN_MODE", "batched")
    got_fused = np.asarray(layer.apply(params, x, ops))
    monkeypatch.setenv("ACMGNN_LN_MODE", "modules")
    got_mods = np.asarray(layer.apply(params, x, ops))
    np.testing.assert_allclose(got_fused, got_mods, rtol=1e-5, atol=1e-5)
    # projected form (default): LN-then-project == project-then-
    # normalize-scalars — the [N, d] normalized tensor is never built
    monkeypatch.setenv("ACMGNN_LN_MODE", "proj")
    got_proj = np.asarray(layer.apply(params, x, ops))
    np.testing.assert_allclose(got_proj, got_mods, rtol=1e-5, atol=1e-5)
    # gradients agree too (the fused form is on the backward path)
    def loss(fn_params):
        return jnp.sum(jnp.square(layer.apply(fn_params, x, ops)))

    monkeypatch.setenv("ACMGNN_LN_MODE", "batched")
    g_fused = jax.grad(loss)(params)
    monkeypatch.setenv("ACMGNN_LN_MODE", "proj")
    g_proj = jax.grad(loss)(params)
    monkeypatch.setenv("ACMGNN_LN_MODE", "modules")
    g_mods = jax.grad(loss)(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        ),
        g_proj, g_mods,
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        ),
        g_fused, g_mods,
    )
