"""Coverage for utility modules: params npz round trip, profiling helpers,
multi-host wrapper (single-host no-op paths)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_params_npz_roundtrip(tmp_path):
    from accelerated_features_tpu.api import XFeat, load_params, save_params
    from accelerated_features_tpu.models.params import init_xfeat_params

    params = init_xfeat_params(jax.random.key(5))
    path = str(tmp_path / "w.npz")
    save_params(params, path)
    loaded = load_params(path, fold_bn=False)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # engine accepts the file and produces identical outputs to in-memory
    x = np.random.default_rng(0).uniform(0, 1, (64, 64, 3)).astype(np.float32)
    out1 = XFeat(weights=path, top_k=32,
                 detection_threshold=0.012).detectAndCompute(x)[0]
    out2 = XFeat(weights=params, top_k=32,
                 detection_threshold=0.012).detectAndCompute(x)[0]
    np.testing.assert_allclose(out1["keypoints"], out2["keypoints"])


def test_xfeat_loads_train_state_npz(tmp_path):
    """XFeat(weights=...) pointed at a FULL train-state npz checkpoint
    (params/ + opt_state/ + step, utils.checkpoint format) extracts the
    params subtree instead of failing on non-param leaves."""
    from accelerated_features_tpu.api import XFeat
    from accelerated_features_tpu.models.params import init_xfeat_params
    from accelerated_features_tpu.utils.checkpoint import _flatten

    params = init_xfeat_params(jax.random.key(5))
    state = {"params": params, "opt_state": (np.int32(0),
                                             {"m": jnp.zeros(3)}),
             "step": np.int64(7)}
    path = str(tmp_path / "ckpt_00000007.npz")
    np.savez(path, **dict(_flatten(state)))

    x = np.random.default_rng(0).uniform(0, 1, (64, 64, 3)).astype(np.float32)
    out1 = XFeat(weights=path, top_k=32,
                 detection_threshold=0.012).detectAndCompute(x)[0]
    out2 = XFeat(weights=params, top_k=32,
                 detection_threshold=0.012).detectAndCompute(x)[0]
    np.testing.assert_allclose(out1["keypoints"], out2["keypoints"])


def test_parse_input_dtype_scaling():
    """Reference parse_input divides every numpy input by 255
    (xfeat.py:400-401); ours mirrors that for all integer dtypes and for
    0-255-range float numpy arrays, while [0,1] floats pass through."""
    from accelerated_features_tpu.api import XFeat
    xf = XFeat(weights=None)
    img8 = np.arange(64 * 96 * 3, dtype=np.uint8).reshape(64, 96, 3)
    a = np.asarray(xf.parse_input(img8))
    assert a.shape == (1, 64, 96, 3) and a.max() <= 1.0
    # uint16 / int32 pixel data scale like uint8 (0-255 convention)
    np.testing.assert_allclose(
        np.asarray(xf.parse_input(img8.astype(np.uint16))), a)
    np.testing.assert_allclose(
        np.asarray(xf.parse_input(img8.astype(np.int32))), a)
    # float 0-255 numpy (cv2 image cast) scales too
    np.testing.assert_allclose(
        np.asarray(xf.parse_input(img8.astype(np.float64))), a, atol=1e-6)
    # float already in [0,1] passes through unscaled
    np.testing.assert_allclose(
        np.asarray(xf.parse_input(a[0])), a, atol=1e-7)
    # gray (H, W) and gray batch (B, H, W) disambiguation. Integer gray
    # is expanded host-side to the RGB layout — (B,H,W,1) uint8 picks a
    # degenerate XLA tiling through input-norm (measured r4: 4170 vs
    # 5095 FPS); input_norm is a channel mean so the expansion is exact
    # (VERDICT r4 #4).
    g = np.asarray(xf.parse_input(img8[..., 0]))
    assert g.shape == (1, 64, 96, 3)
    np.testing.assert_array_equal(g[..., 0], g[..., 1])
    np.testing.assert_array_equal(g[..., 0], g[..., 2])
    np.testing.assert_array_equal(g[..., 0], a[..., 0])
    assert xf.parse_input(np.zeros((5, 64, 96), np.uint8)).shape \
        == (5, 64, 96, 3)


def test_parse_input_raw_keeps_integer_dtype():
    """_parse_input_raw keeps integer images in their native dtype (the
    /255 runs inside the jitted pipeline via ops.resize.to_unit_float, so
    uint8 frames cross host->device at 1/4 the float32 bytes); float
    handling matches parse_input."""
    from accelerated_features_tpu.api import XFeat
    from accelerated_features_tpu.ops.resize import to_unit_float
    xf = XFeat(weights=None)
    img8 = np.arange(64 * 96 * 3, dtype=np.uint8).reshape(64, 96, 3)
    raw = xf._parse_input_raw(img8)
    assert raw.dtype == jnp.uint8 and raw.shape == (1, 64, 96, 3)
    # device-side normalization == the public parse_input result, exactly
    np.testing.assert_array_equal(np.asarray(to_unit_float(raw)),
                                  np.asarray(xf.parse_input(img8)))
    # 0-255-range float numpy still normalizes host-side
    rawf = xf._parse_input_raw(img8.astype(np.float64))
    assert rawf.dtype == jnp.float32 and float(np.max(np.asarray(rawf))) <= 1.0


def test_detect_and_compute_uint8_equals_float():
    """End-to-end: uint8 input through the device-side /255 selects the
    SAME keypoints as the pre-normalized float path, with descriptors
    equal to float-reassociation tolerance (the in-jit cast+scale fuses
    into neighboring ops, so XLA may reorder reductions — bit-identity
    is not guaranteed under jit, set-identity of the selection is)."""
    from accelerated_features_tpu.api import XFeat
    rng = np.random.default_rng(3)
    img8 = rng.integers(0, 256, (96, 128, 3), np.uint8)
    xf = XFeat(weights=None, top_k=64, detection_threshold=0.012)
    out_u8 = xf.detectAndCompute(img8)[0]
    out_f32 = xf.detectAndCompute(img8.astype(np.float32) / 255.0)[0]

    # compare as SETS: exactly-tied scores may swap top-k order under the
    # ~1e-9 score noise (measured on assets/ref.png: 2/1024 rows swapped,
    # Jaccard of the keypoint sets 1.0)
    def order(out):
        idx = np.lexsort(out["keypoints"].T)
        return idx
    iu, if_ = order(out_u8), order(out_f32)
    np.testing.assert_array_equal(out_u8["keypoints"][iu],
                                  out_f32["keypoints"][if_])
    np.testing.assert_allclose(out_u8["descriptors"][iu],
                               out_f32["descriptors"][if_], atol=2e-3)
    # and the semi-dense front end accepts uint8 too
    dense = xf.detectAndComputeDense(img8, top_k=64)
    assert dense["keypoints"].shape[0] == 1


def test_set_params_swaps_without_recompile():
    """XFeat.set_params replaces weights in place; the cached jitted
    programs take params as call arguments, so the jit cache must not
    grow (checkpoint sweeps rely on this to avoid re-paying compiles)."""
    from accelerated_features_tpu.api import XFeat
    from accelerated_features_tpu.models.params import init_xfeat_params
    xf = XFeat(weights=None, top_k=32, detection_threshold=0.012)
    img = np.random.default_rng(0).integers(0, 256, (64, 96, 3), np.uint8)
    out1 = xf.detectAndCompute(img)[0]
    n_cached = len(xf._jitted)
    xf.set_params(init_xfeat_params(jax.random.key(42)))
    out2 = xf.detectAndCompute(img)[0]
    assert len(xf._jitted) == n_cached
    assert not np.array_equal(out1["descriptors"][:8], out2["descriptors"][:8])


def test_restore_checkpoint_npz_key_pairing(tmp_path):
    """npz restore must pair leaves BY KEY PATH, not by positional zip of
    two differently-ordered flattenings (jax.tree.flatten sorts dict keys;
    _flatten uses insertion order) — the old code could silently load Adam
    moments into params slots on resume. Uses same-shaped subtrees so a
    scramble changes values, and a namedtuple to mimic optax state."""
    import collections
    from accelerated_features_tpu.utils.checkpoint import (_flatten,
                                                           restore_checkpoint)

    Opt = collections.namedtuple("Opt", ["mu", "nu"])
    state = {
        "params": {"w": jnp.arange(3.0)},
        "opt_state": (Opt(mu={"w": jnp.arange(3.0) + 100},
                          nu={"w": jnp.arange(3.0) + 200}),),
        "step": np.int64(5),
    }
    path = str(tmp_path / "ckpt_00000005.npz")
    np.savez(path, **dict(_flatten(state)))

    target = jax.tree.map(lambda x: np.zeros_like(x), state)
    out = restore_checkpoint(path, target)
    np.testing.assert_array_equal(out["params"]["w"], [0, 1, 2])
    np.testing.assert_array_equal(out["opt_state"][0].mu["w"],
                                  [100, 101, 102])
    np.testing.assert_array_equal(out["opt_state"][0].nu["w"],
                                  [200, 201, 202])
    assert int(out["step"]) == 5
    assert isinstance(out["opt_state"][0], Opt)


def test_shipped_artifact_resumable_and_loadable():
    """artifacts/run_tf_ckpt3000.npz (the preserved round-2 training
    state) must keep restoring into the real train-state structure (for
    resume) and into XFeat (for inference) — guards against schema drift
    in either loader."""
    import os
    path = os.path.join(os.path.dirname(__file__), "..",
                        "artifacts", "run_tf_ckpt3000.npz")
    if not os.path.exists(path):
        pytest.skip("artifact not present")
    from accelerated_features_tpu.models.params import init_xfeat_params
    from accelerated_features_tpu.train.trainer import (TrainConfig,
                                                        init_train_state)
    from accelerated_features_tpu.utils.checkpoint import restore_checkpoint

    cfg = TrainConfig(use_distill=False, use_kp_position=True)
    target = init_train_state(init_xfeat_params(jax.random.key(0)), cfg)
    state = restore_checkpoint(path, jax.device_get(target))
    assert int(state["step"]) == 3000

    from accelerated_features_tpu.api import XFeat
    xf = XFeat(weights=path, top_k=32)
    x = np.random.default_rng(0).uniform(0, 1, (64, 64, 3)).astype(np.float32)
    assert len(xf.detectAndCompute(x)[0]["keypoints"]) > 0


def test_profiling_helpers(tmp_path):
    from accelerated_features_tpu.utils.profiling import (FPSMeter,
                                                          speed_of_light,
                                                          time_fn)
    f = jax.jit(lambda x: x * 2 + 1)
    dt = time_fn(f, jnp.ones((128, 128)), iters=3, warmup=1)
    assert dt > 0

    sol = speed_of_light(1e-3, flops=1e9, bytes_moved=1e6)
    assert sol["tflops"] == pytest.approx(1.0)
    assert 0 < sol["sol_frac"] < 1

    m = FPSMeter(window=5)
    assert m.tick() == 0.0
    for _ in range(5):
        fps = m.tick()
    assert fps > 0


def test_distributed_single_host():
    from accelerated_features_tpu.parallel import distributed
    assert distributed.initialize() is False  # no-op single host
    mesh = distributed.make_pod_mesh(model=2)
    assert mesh.shape["model"] == 2
    assert mesh.shape["data"] * 2 == len(jax.devices())
    assert distributed.is_primary()


def test_device_trace(tmp_path):
    from accelerated_features_tpu.utils.profiling import device_trace
    with device_trace(str(tmp_path)):
        jax.block_until_ready(jax.jit(lambda x: x + 1)(jnp.ones((8, 8))))
    import os
    assert any(os.scandir(str(tmp_path)))  # trace files written


def test_scan_time_runs_and_falls_back():
    """scan_time returns a sane positive duration; integer-only args fall
    back to the dispatch-loop timer instead of raising."""
    import jax
    import jax.numpy as jnp

    from accelerated_features_tpu.utils.profiling import scan_time

    a = jnp.ones((64, 64), jnp.float32)
    t = scan_time(lambda x: x * 2.0 + 1.0, a, iters=4)
    assert 0 < t < 10.0

    b = jnp.ones((8,), jnp.int32)
    t2 = scan_time(lambda x: x + 1, b, iters=3)
    assert 0 < t2 < 10.0


def test_per_call_overrides_match_reference_contract():
    """detectAndCompute accepts per-call top_k / detection_threshold
    overrides like the reference (xfeat.py:50): explicit args win over the
    constructor defaults, None falls back to them."""
    from accelerated_features_tpu.api import XFeat
    from accelerated_features_tpu.models.params import init_xfeat_params

    params = init_xfeat_params(jax.random.key(7))
    x = np.random.default_rng(1).uniform(0, 1, (96, 96, 3)).astype(np.float32)
    xf = XFeat(weights=params, top_k=64, detection_threshold=0.012)

    d_default = xf.detectAndCompute(x)[0]
    d_k16 = xf.detectAndCompute(x, top_k=16)[0]
    assert len(d_default["keypoints"]) <= 64
    assert len(d_k16["keypoints"]) <= 16
    # the 16 kept must be the highest-scoring 16 of the default run
    np.testing.assert_allclose(
        np.sort(d_k16["scores"])[::-1],
        np.sort(d_default["scores"])[::-1][:len(d_k16["scores"])],
        rtol=1e-6)
    # a stricter threshold can only shrink the keypoint set
    d_strict = xf.detectAndCompute(x, detection_threshold=0.03)[0]
    assert len(d_strict["keypoints"]) <= len(d_default["keypoints"])


def test_roofline_floor_and_scan_time_window():
    """VERDICT r4 weak #1 regression guards: (a) roofline_floor_s derives
    a positive speed-of-light floor from XLA cost analysis for a
    matmul-heavy jitted fn, and the floor is conservative (below an
    achievable-rate estimate); (b) scan_time refuses noise-dominated
    windows — for a trivially small op it grows the in-scan iteration
    count until (tN - t1) clears both min_window_s and the dispatch
    baseline, so a sub-floor reading cannot come out of the harness."""
    import jax

    from accelerated_features_tpu.utils.profiling import (PEAK_BF16_FLOPS,
                                                          roofline_floor_s,
                                                          scan_time)

    a = jnp.ones((512, 512), jnp.float32)
    f = jax.jit(lambda x: x @ x)
    floor = roofline_floor_s(f, a)
    expected = 2 * 512**3 / PEAK_BF16_FLOPS
    if floor > 0.0:     # 0.0 = backend without cost analysis (no-op guard)
        assert 0.25 * expected <= floor <= 4 * expected

    # a ~microsecond op: with the r4 harness (10 iters, tN-t1 in relay
    # jitter) this could publish ~0; the adaptive window must return a
    # positive, plausible time (>= 10 ns, far above "impossible")
    tiny = jnp.ones((8, 128), jnp.float32)
    t = scan_time(lambda x: x + 1.0, tiny, iters=4, min_window_s=0.02)
    assert t > 0.0


def test_bench_guard_refuses_below_sol():
    """bench.py's guarded_ms publishes an error string, not a number,
    when a measurement lands below the compiled program's SoL floor —
    the exact failure mode of the round-4 0.09 ms LighterGlue entry."""
    import importlib.util as ilu
    import os as _os
    spec = ilu.spec_from_file_location(
        "bench_mod", _os.path.join(_os.path.dirname(_os.path.dirname(
            _os.path.abspath(__file__))), "bench.py"))
    bench_mod = ilu.module_from_spec(spec)
    spec.loader.exec_module(bench_mod)
    # impossible reading (0.09 ms vs 0.6 ms floor) -> error string
    flagged = bench_mod.guarded_ms(0.09e-3, 0.6e-3)
    assert isinstance(flagged, str) and flagged.startswith("error: below")
    # plausible reading -> rounded milliseconds
    assert bench_mod.guarded_ms(0.8e-3, 0.6e-3) == 0.8
    # no cost analysis (floor 0.0) -> guard degrades to a no-op
    assert bench_mod.guarded_ms(0.09e-3, 0.0) == 0.09


def test_restore_checkpoint_accepts_field_named_optax_keys(tmp_path):
    """Some exports (orbax restore -> np.savez round trip) flatten optax
    namedtuple states by FIELD name ('opt_state/1/mu/...') and store
    EmptyState as a pickled None; restore_checkpoint must translate them
    onto the positional schema instead of refusing to resume (the
    round-4 run_md_ckpt13250.npz artifact is this shape)."""
    from accelerated_features_tpu.models.params import init_xfeat_params
    from accelerated_features_tpu.train.trainer import (TrainConfig,
                                                        init_train_state)
    from accelerated_features_tpu.utils.checkpoint import (_flatten,
                                                           restore_checkpoint)

    cfg = TrainConfig(use_distill=False, use_kp_position=True)
    state = jax.device_get(init_train_state(
        init_xfeat_params(jax.random.key(3)), cfg))
    # build the field-named export shape from the canonical one
    flat = _flatten(state)
    renamed = {}
    for k, v in flat.items():
        k2 = k.replace("opt_state/1/0", "opt_state/1/count")
        k2 = k2.replace("opt_state/1/1/", "opt_state/1/mu/")
        k2 = k2.replace("opt_state/1/2/", "opt_state/1/nu/")
        k2 = k2.replace("opt_state/2/0", "opt_state/2/count")
        renamed[k2] = v
    renamed["opt_state/0"] = np.asarray(None, dtype=object)
    path = str(tmp_path / "export.npz")
    np.savez(path, **renamed)

    got = restore_checkpoint(path, state)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(got)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
