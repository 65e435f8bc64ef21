"""Training-step sanity check without datasets (reference xfeat_training
notebook / --dry_run equivalent)."""
import os, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.argv = ["run", "--ckpt_save_path", "/tmp/xfeat_dry", "--dry_run",
            "--batch_size", "4", "--training_res", "64,64",
            "--max_corrs", "64"]
from accelerated_features_tpu.train.run import main
main()
