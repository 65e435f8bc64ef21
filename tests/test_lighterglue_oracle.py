"""LighterGlue numerical cross-oracle (VERDICT r1 item #2).

The reference wraps kornia's LightGlue (reference modules/lighterglue.py:31-48)
which is unavailable here. The HuggingFace `transformers` package ships an
INDEPENDENT port of the official LightGlue (transformers/models/lightglue/
modeling_lightglue.py, converted from the official cvg/LightGlue weights) —
we use its modules as a non-self numerical oracle for our JAX implementation:
positional encoding, rotary application, self/cross attention blocks, the
FFN, the sigmoid-log-double-softmax assignment head, and match filtering.

Weight mapping notes:
  * HF stores separate q/k/v projections (its conversion de-interleaves the
    official fused Wqkv). We build our chunked [q|k|v] pytree directly from
    HF's q/k/v, so this test pins the *forward math*; the kornia fused-Wqkv
    row packing is covered separately by test_qkv_interleave_consistency.
  * HF's cross-attention has independent q_proj/k_proj where the official
    model shares one to_qk for both sides; we tie them here (as the official
    conversion does in reverse).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
lg_mod = pytest.importorskip("transformers.models.lightglue.modeling_lightglue")

from accelerated_features_tpu.models.lighterglue import (  # noqa: E402
    DEFAULT_CONF, _qkv_row_perm, filter_matches_from_scores,
    import_lighterglue_state_dict, lighterglue_forward)

DIM = 96
N_LAYERS = 6


def _make_hf_modules(seed=0):
    from transformers.models.lightglue.configuration_lightglue import (
        LightGlueConfig)
    cfg = LightGlueConfig(descriptor_dim=DIM, num_attention_heads=1,
                          hidden_act="gelu")
    cfg.num_hidden_layers = N_LAYERS
    cfg._attn_implementation = "eager"
    torch.manual_seed(seed)
    layers = [lg_mod.LightGlueTransformerLayer(cfg, layer_idx=i)
              for i in range(N_LAYERS)]
    assignment = lg_mod.LightGlueMatchAssignmentLayer(cfg)
    posenc = lg_mod.LightGluePositionalEncoder(cfg)
    input_proj = torch.nn.Linear(64, DIM)
    for layer in layers:
        # official LightGlue shares to_qk between both cross directions;
        # HF has separate q/k projections — tie them to match
        layer.cross_attention.k_proj.weight.data.copy_(
            layer.cross_attention.q_proj.weight.data)
        layer.cross_attention.k_proj.bias.data.copy_(
            layer.cross_attention.q_proj.bias.data)
    for m in layers + [assignment, posenc, input_proj]:
        m.eval()
    return layers, assignment, posenc, input_proj


def _wt(lin):
    return jnp.asarray(lin.weight.detach().numpy().T)


def _bt(lin):
    return jnp.asarray(lin.bias.detach().numpy())


def _params_from_hf(layers, assignment, posenc, input_proj):
    """Build our pytree directly from the HF modules (chunked q|k|v)."""
    params = {
        "input_proj": {"w": _wt(input_proj), "b": _bt(input_proj)},
        "posenc_wr": _wt(posenc.projector),
        "layers": [],
        "assignments": [],
        "token_confidence": [],
    }
    for layer in layers:
        sa, ca = layer.self_attention, layer.cross_attention
        params["layers"].append({
            "self": {
                "qkv": {
                    "w": jnp.concatenate(
                        [_wt(sa.q_proj), _wt(sa.k_proj), _wt(sa.v_proj)], 1),
                    "b": jnp.concatenate(
                        [_bt(sa.q_proj), _bt(sa.k_proj), _bt(sa.v_proj)]),
                },
                "out": {"w": _wt(sa.o_proj), "b": _bt(sa.o_proj)},
                "ffn0": {"w": _wt(layer.self_mlp.fc1),
                         "b": _bt(layer.self_mlp.fc1)},
                "ln": {"w": jnp.asarray(
                           layer.self_mlp.layer_norm.weight.detach().numpy()),
                       "b": jnp.asarray(
                           layer.self_mlp.layer_norm.bias.detach().numpy())},
                "ffn1": {"w": _wt(layer.self_mlp.fc2),
                         "b": _bt(layer.self_mlp.fc2)},
            },
            "cross": {
                "to_qk": {"w": _wt(ca.q_proj), "b": _bt(ca.q_proj)},
                "to_v": {"w": _wt(ca.v_proj), "b": _bt(ca.v_proj)},
                "to_out": {"w": _wt(ca.o_proj), "b": _bt(ca.o_proj)},
                "ffn0": {"w": _wt(layer.cross_mlp.fc1),
                         "b": _bt(layer.cross_mlp.fc1)},
                "ln": {"w": jnp.asarray(
                           layer.cross_mlp.layer_norm.weight.detach().numpy()),
                       "b": jnp.asarray(
                           layer.cross_mlp.layer_norm.bias.detach().numpy())},
                "ffn1": {"w": _wt(layer.cross_mlp.fc2),
                         "b": _bt(layer.cross_mlp.fc2)},
            },
        })
    params["assignments"] = [{
        "matchability": {"w": _wt(assignment.matchability),
                         "b": _bt(assignment.matchability)},
        "final_proj": {"w": _wt(assignment.final_projection),
                       "b": _bt(assignment.final_projection)},
    }] * N_LAYERS
    return params


def _hf_forward(layers, assignment, posenc, input_proj, k0, k1, d0, d1,
                size_wh):
    """Drive the HF modules the way LightGlueForKeypointMatching does
    (_match_image_pair): pair stacked on the batch axis, [img0, img1]."""
    W, H = size_wh
    with torch.no_grad():
        kn0 = lg_mod.normalize_keypoints(torch.from_numpy(k0)[None], H, W)
        kn1 = lg_mod.normalize_keypoints(torch.from_numpy(k1)[None], H, W)
        desc = input_proj(torch.from_numpy(np.concatenate([d0[None],
                                                           d1[None]])))
        kn = torch.cat([kn0, kn1])
        (pos,) = posenc(kn)
        for layer in layers:
            desc, _, _ = layer(desc, pos, None)
        scores = assignment(desc, None)
    return scores.numpy()


@pytest.mark.reference_parity
def test_forward_matches_hf_lightglue():
    """Full-forward log-assignment parity vs the transformers LightGlue."""
    layers, assignment, posenc, input_proj = _make_hf_modules()
    params = _params_from_hf(layers, assignment, posenc, input_proj)

    rng = np.random.default_rng(7)
    M = 48
    k0 = rng.uniform(0, 128, (M, 2)).astype(np.float32)
    k1 = rng.uniform(0, 128, (M, 2)).astype(np.float32)
    d0 = rng.normal(size=(M, 64)).astype(np.float32)
    d1 = rng.normal(size=(M, 64)).astype(np.float32)
    d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
    d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
    size = np.array([[128.0, 96.0]], np.float32)  # (W, H)

    hf_scores = _hf_forward(layers, assignment, posenc, input_proj,
                            k0, k1, d0, d1, (128, 96))

    out = jax.jit(lambda p, *a: lighterglue_forward(p, *a))(
        params, jnp.asarray(k0)[None], jnp.asarray(k1)[None],
        jnp.asarray(d0)[None], jnp.asarray(d1)[None],
        jnp.asarray(size), jnp.asarray(size))
    ours = np.asarray(out["log_assignment"][0])

    # inner assignment block + both dustbin edges (HF fills the corner with
    # 0, ours with -inf; it is never read)
    np.testing.assert_allclose(ours[:M, :M], hf_scores[0, :M, :M],
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(ours[:M, M], hf_scores[0, :M, M], atol=2e-4)
    np.testing.assert_allclose(ours[M, :M], hf_scores[0, M, :M], atol=2e-4)

    # match filtering parity
    hf_matches, hf_mscores = lg_mod.get_matches_from_scores(
        torch.from_numpy(hf_scores), 0.1)
    m0, ms0 = filter_matches_from_scores(jnp.asarray(ours)[None], M, M)
    ours_m0 = np.where(np.asarray(ms0[0]) > 0.1, np.asarray(m0[0]), -1)
    np.testing.assert_array_equal(ours_m0, hf_matches.numpy()[0])


@pytest.mark.reference_parity
def test_forward_matches_hf_lightglue_masked():
    """Padded keypoint slots must not perturb valid matches (HF oracle run
    at the true sizes; ours padded + masked)."""
    layers, assignment, posenc, input_proj = _make_hf_modules(seed=1)
    params = _params_from_hf(layers, assignment, posenc, input_proj)

    rng = np.random.default_rng(11)
    n0, n1, K = 21, 17, 32
    k0 = rng.uniform(0, 100, (n0, 2)).astype(np.float32)
    k1 = rng.uniform(0, 100, (n1, 2)).astype(np.float32)
    d0 = rng.normal(size=(n0, 64)).astype(np.float32)
    d1 = rng.normal(size=(n1, 64)).astype(np.float32)

    # HF oracle needs equal set sizes for its pair batching -> run each
    # image's self path at its own size by padding the smaller set in BOTH
    # frameworks is not possible for HF; instead compare ours padded vs ours
    # unpadded AND ours unpadded vs HF at a common size.
    hf_scores = _hf_forward(layers, assignment, posenc, input_proj,
                            k0[:17], k1, d0[:17], d1, (100, 100))
    size = np.array([[100.0, 100.0]], np.float32)

    def pad(x, k):
        return np.concatenate(
            [x, np.zeros((k - len(x),) + x.shape[1:], x.dtype)])

    out = jax.jit(lambda p, *a, **kw: lighterglue_forward(p, *a, **kw))(
        params, jnp.asarray(pad(k0[:17], K))[None],
        jnp.asarray(pad(k1, K))[None],
        jnp.asarray(pad(d0[:17], K))[None], jnp.asarray(pad(d1, K))[None],
        jnp.asarray(size), jnp.asarray(size),
        mask0=jnp.asarray(np.arange(K) < 17)[None],
        mask1=jnp.asarray(np.arange(K) < n1)[None])
    ours = np.asarray(out["log_assignment"][0])
    np.testing.assert_allclose(ours[:17, :n1], hf_scores[0, :17, :n1],
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(ours[:17, K], hf_scores[0, :17, n1],
                               atol=2e-4)


def test_qkv_interleave_consistency():
    """The kornia/official fused Wqkv import must de-interleave rows: the
    official SelfBlock unpacks `qkv.unflatten(-1, (heads, -1, 3))`, i.e.
    q/k/v interleaved per feature. Building a fused Wqkv from separate
    q/k/v in that packing and importing it must reproduce the chunked
    layout exactly."""
    rng = np.random.default_rng(3)
    dim, heads = DIM, 1
    hd = dim // heads
    q = rng.normal(size=(dim, dim)).astype(np.float32)
    k = rng.normal(size=(dim, dim)).astype(np.float32)
    v = rng.normal(size=(dim, dim)).astype(np.float32)
    qb = rng.normal(size=(dim,)).astype(np.float32)
    kb = rng.normal(size=(dim,)).astype(np.float32)
    vb = rng.normal(size=(dim,)).astype(np.float32)

    # pack official-style: row h*(3*hd) + d*3 + which
    fused_w = np.zeros((3 * dim, dim), np.float32)
    fused_b = np.zeros((3 * dim,), np.float32)
    for h in range(heads):
        for d in range(hd):
            for which, (m, bvec) in enumerate([(q, qb), (k, kb), (v, vb)]):
                row = h * 3 * hd + d * 3 + which
                fused_w[row] = m[h * hd + d]
                fused_b[row] = bvec[h * hd + d]

    perm = _qkv_row_perm(dim, heads)
    got_w = fused_w.T[:, perm]
    got_b = fused_b[perm]
    want_w = np.concatenate([q.T, k.T, v.T], axis=1)
    want_b = np.concatenate([qb, kb, vb])
    np.testing.assert_array_equal(got_w, want_w)
    np.testing.assert_array_equal(got_b, want_b)


# ---------------------------------------------------------------------------
# width-confidence point pruning (reference lighterglue.py:24 runs 0.95)
# ---------------------------------------------------------------------------

def _gathered_width_pruned_reference(params, k0, k1, d0, d1, size,
                                     width_confidence):
    """Official LightGlue width pruning, gather-based (dynamic shapes),
    executed eagerly with OUR forward blocks (whose math is pinned to the
    HF oracle by the tests above). Mirrors official lightglue.py forward:
    per layer i < n_layers-1, keep points with
    get_matchability(log_assignment[i]) > 1 - width_confidence, gather the
    survivors (descriptors + rotary encodings), never re-admit; final
    assignment over survivors; scatter matches back with pruned = -1/0."""
    from accelerated_features_tpu.models.lighterglue import (
        _apply, _cross_block, _self_block, get_matchability,
        normalize_keypoints, rotary_encoding, sigmoid_log_double_softmax)

    x0 = _apply(params["input_proj"], jnp.asarray(d0)[None])
    x1 = _apply(params["input_proj"], jnp.asarray(d1)[None])
    cos0, sin0 = rotary_encoding(
        normalize_keypoints(jnp.asarray(k0)[None], size), params["posenc_wr"])
    cos1, sin1 = rotary_encoding(
        normalize_keypoints(jnp.asarray(k1)[None], size), params["posenc_wr"])
    ind0 = np.arange(len(k0))
    ind1 = np.arange(len(k1))

    n_layers = len(params["layers"])
    for i, layer in enumerate(params["layers"]):
        full0 = jnp.ones((1, x0.shape[1]), bool)
        full1 = jnp.ones((1, x1.shape[1]), bool)
        x0 = _self_block(layer["self"], x0, cos0, sin0, full0, 1)
        x1 = _self_block(layer["self"], x1, cos1, sin1, full1, 1)
        x0, x1 = _cross_block(layer["cross"], x0, x1, full0, full1, 1)
        if i < n_layers - 1:
            asg_i = params["assignments"][i]
            keep0 = np.asarray(
                get_matchability(asg_i, x0)[0] > 1 - width_confidence)
            keep1 = np.asarray(
                get_matchability(asg_i, x1)[0] > 1 - width_confidence)
            x0, cos0, sin0 = x0[:, keep0], cos0[:, keep0], sin0[:, keep0]
            x1, cos1, sin1 = x1[:, keep1], cos1[:, keep1], sin1[:, keep1]
            ind0, ind1 = ind0[keep0], ind1[keep1]

    asg = params["assignments"][-1]
    dim = x0.shape[-1]
    md0 = _apply(asg["final_proj"], x0) / dim ** 0.25
    md1 = _apply(asg["final_proj"], x1) / dim ** 0.25
    sim = jnp.einsum("bmd,bnd->bmn", md0, md1,
                     precision=jax.lax.Precision.HIGHEST)
    z0 = _apply(asg["matchability"], x0)[..., 0]
    z1 = _apply(asg["matchability"], x1)[..., 0]
    ms, ns = x0.shape[1], x1.shape[1]
    scores = sigmoid_log_double_softmax(
        sim, z0, z1, jnp.ones((1, ms), bool), jnp.ones((1, ns), bool))
    sub_m0, sub_ms0 = filter_matches_from_scores(scores, ms, ns)
    sub_m0 = np.asarray(sub_m0[0])
    sub_ms0 = np.asarray(sub_ms0[0])

    # scatter back to the original index space (official interface)
    m0 = np.full((len(k0),), -1, np.int32)
    ms0 = np.zeros((len(k0),), np.float32)
    matched = sub_m0 >= 0
    m0[ind0[matched]] = ind1[sub_m0[matched]]
    ms0[ind0] = sub_ms0
    ms0[m0 < 0] = 0.0
    return m0, ms0


@pytest.mark.reference_parity
def test_width_pruning_matches_gathered_reference():
    """Masked static-shape pruning == official gather-based pruning."""
    params = _params_from_hf(*_make_hf_modules(seed=2))
    # distinct per-layer assignment heads with biased matchability so the
    # keep rule actually fires (random weights give sigmoid ~ 0.5 and the
    # rule 'matchability > 0.05' would never prune anything); scale/bias
    # tuned so every layer keeps a nonempty survivor set on both sides
    rng = np.random.default_rng(5)
    params["assignments"] = [
        {"matchability": {
            "w": jnp.asarray(rng.normal(0, 0.2, (DIM, 1)).astype(np.float32)),
            "b": jnp.asarray(np.float32([-1.5]))},
         "final_proj": params["assignments"][0]["final_proj"]}
        for i in range(N_LAYERS)]

    M = 64
    k0 = rng.uniform(0, 128, (M, 2)).astype(np.float32)
    k1 = rng.uniform(0, 128, (M, 2)).astype(np.float32)
    d0 = rng.normal(size=(M, 64)).astype(np.float32)
    d1 = rng.normal(size=(M, 64)).astype(np.float32)
    size = jnp.asarray([[128.0, 128.0]], jnp.float32)
    wc = 0.95

    ref_m0, ref_ms0 = _gathered_width_pruned_reference(
        params, k0, k1, d0, d1, size, wc)
    n_pruned = int((ref_ms0 == 0).sum())
    assert 4 <= n_pruned < M, f"test not exercising pruning ({n_pruned})"

    out = jax.jit(lambda p, *a: lighterglue_forward(
        p, *a, width_confidence=wc, pruning_min_kpts=0))(
        params, jnp.asarray(k0)[None], jnp.asarray(k1)[None],
        jnp.asarray(d0)[None], jnp.asarray(d1)[None], size, size)
    np.testing.assert_array_equal(np.asarray(out["matches0"][0]), ref_m0)
    np.testing.assert_allclose(np.asarray(out["mscores0"][0]), ref_ms0,
                               rtol=1e-4, atol=1e-5)

    # below the keypoint-count gate the same call must be unpruned
    out_off = jax.jit(lambda p, *a: lighterglue_forward(
        p, *a, width_confidence=wc, pruning_min_kpts=M))(
        params, jnp.asarray(k0)[None], jnp.asarray(k1)[None],
        jnp.asarray(d0)[None], jnp.asarray(d1)[None], size, size)
    out_plain = jax.jit(lambda p, *a: lighterglue_forward(p, *a))(
        params, jnp.asarray(k0)[None], jnp.asarray(k1)[None],
        jnp.asarray(d0)[None], jnp.asarray(d1)[None], size, size)
    np.testing.assert_array_equal(np.asarray(out_off["matches0"]),
                                  np.asarray(out_plain["matches0"]))
