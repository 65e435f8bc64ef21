"""Multi-chip scaling paths on a virtual 8-device mesh: data-parallel
extraction, sequence-parallel MNN, sequence-parallel LighterGlue, and the
point-partitioned distributed bundle adjuster (SURVEY §2.3 — all new
capability vs the single-device reference).

Run anywhere (forces an 8-device CPU mesh):
    python examples/06_multichip_scaling.py
On a real pod slice, drop the two env lines and the platform update.
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=8")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp


def main():
    from accelerated_features_tpu.models.lighterglue import (
        init_lighterglue_params)
    from accelerated_features_tpu.models.params import (fold_batchnorm,
                                                        init_xfeat_params)
    from accelerated_features_tpu.parallel import make_mesh
    from accelerated_features_tpu.parallel.lighterglue_sp import (
        lighterglue_forward_sp)
    from accelerated_features_tpu.parallel.matching import (
        mnn_match_sp, sharded_detect_and_compute)

    mesh = make_mesh((2, 4))  # data x model
    print("mesh:", dict(mesh.shape))
    rng = np.random.default_rng(0)

    # 1) data-parallel extraction: batch splits over 'data'
    params = fold_batchnorm(init_xfeat_params(jax.random.key(0)))
    images = jnp.asarray(rng.uniform(0, 1, (4, 96, 128, 1)), jnp.float32)
    out = sharded_detect_and_compute(mesh, params, images, top_k=256,
                                     detection_threshold=0.012)
    print("dp extraction:", out["keypoints"].shape)

    # 2) sequence-parallel MNN: target set sharded over 'model',
    #    O(K) ICI traffic instead of a K x K similarity matrix
    d1 = jnp.asarray(rng.normal(size=(512, 64)), jnp.float32)
    d2 = jnp.asarray(rng.normal(size=(1024, 64)), jnp.float32)
    idx, mask = mnn_match_sp(mesh, d1, d2)
    print("sp MNN:", int(mask.sum()), "mutual matches")

    # 3) sequence-parallel LighterGlue: both keypoint axes sharded
    lg = init_lighterglue_params(jax.random.key(1))
    size = jnp.asarray([[640.0, 480.0]], jnp.float32)
    k0 = jnp.asarray(rng.uniform(0, 600, (1, 256, 2)), jnp.float32)
    k1 = jnp.asarray(rng.uniform(0, 600, (1, 256, 2)), jnp.float32)
    f0 = jnp.asarray(rng.normal(size=(1, 256, 64)), jnp.float32)
    f1 = jnp.asarray(rng.normal(size=(1, 256, 64)), jnp.float32)
    m0, ms0 = lighterglue_forward_sp(mesh, lg, k0, k1, f0, f1, size, size)
    print("sp LighterGlue:", int((np.asarray(m0) >= 0).sum()), "matches")

    # 4) point-partitioned distributed BA (map sharded across devices)
    from accelerated_features_tpu.parallel.ba import (
        bundle_adjust_point_sharded)
    from accelerated_features_tpu.sfm.ba import BAProblem
    n_cams, n_pts = 6, 160
    pts = rng.uniform(-1, 1, (n_pts, 3)).astype(np.float32) + [0, 0, 5]
    cams = np.zeros((n_cams, 6), np.float32)
    cams[:, 3] = np.linspace(0, 0.5, n_cams)
    obs_cam = np.repeat(np.arange(n_cams), n_pts).astype(np.int32)
    obs_pt = np.tile(np.arange(n_pts), n_cams).astype(np.int32)
    uv = pts[obs_pt, :2] / pts[obs_pt, 2:] * 100.0 + 64.0
    prob = BAProblem(
        cams=jnp.asarray(cams), points=jnp.asarray(pts + 0.01),
        K=jnp.asarray([[100.0, 0, 64], [0, 100.0, 64], [0, 0, 1]],
                      jnp.float32),
        obs_cam=jnp.asarray(obs_cam), obs_pt=jnp.asarray(obs_pt),
        obs_uv=jnp.asarray(uv.astype(np.float32)),
        obs_mask=jnp.ones((len(obs_cam),), bool))
    solved, info = bundle_adjust_point_sharded(prob, mesh, iters=3,
                                               cg_iters=20)
    print(f"point-sharded BA: cost {float(info['initial_cost']):.4f} -> "
          f"{float(info['final_cost']):.4f}")


if __name__ == "__main__":
    main()
