"""Retained experiments — measured NEGATIVE results, not production code.

Each module here was built, tested, and measured ON the real TPU chip,
and lost to the XLA path it was meant to replace. They are kept because
the measurement (and the kernel techniques) are part of the design
record — docs/DESIGN.md section 10 has the per-experiment post-mortems:

- `stem`        (section 10a): whole-stem halo-im2col Pallas kernel.
  6.1x SLOWER than the XLA stem at 256x512 b64 bf16, with ~quadratic
  Mosaic compile times in width. Opt-in via XFEAT_FUSED_STEM=1.
- `halo_conv`   (section 10):  column-grouped halo conv, an XLA-graph
  rewrite of the low-channel stem convs. Slower: breaks XLA's stem
  fusion. Only tests import it.
- `bicubic_mxu` (section 10):  bicubic descriptor sampling as one MXU
  matmul per 16-px row band. The fused-gather XLA path is faster at
  product shapes (the sample sits at >150% naive-HBM SoL already).
  Only tests import it.

Nothing in the production import tree depends on this package except
the env-gated stem hook in models/backbone.py.
"""
