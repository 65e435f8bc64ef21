"""Dataset downloader CLI — reference modules/dataset/download.py capability:
fetches MegaDepth(-1500), the training indices, and ScanNet-1500 test data.

This environment has no network egress; the script degrades to printing the
required layout when downloads fail.

Usage: python apps/download.py --dataset {megadepth-1500,scannet-1500,
                                          megadepth-train} --out DIR
"""

import argparse
import os
import subprocess
import sys
import tarfile

URLS = {
    # LoFTR/gluefactory-distributed eval archives (same sources the
    # reference's downloader pulls, download.py:14-123)
    "megadepth-1500": [
        ("https://github.com/zju3dv/LoFTR/releases/download/"
         "megadepth_test_1500/megadepth_test_1500.tar", "tar"),
    ],
    "scannet-1500": [
        ("https://github.com/zju3dv/LoFTR/releases/download/"
         "scannet_test_1500/scannet_test_1500.tar", "tar"),
    ],
    "megadepth-train": [
        ("https://www.cs.cornell.edu/projects/megadepth/dataset/"
         "Megadepth_v1/MegaDepth_v1.tar.gz", "tar.gz"),
    ],
}

LAYOUTS = {
    "megadepth-1500": """
expected layout after extraction:
  <out>/megadepth_test_1500/<scene>/<image>.jpg
pair metadata ships with this repo's eval harness (reference asset
megadepth_1500.json).""",
    "scannet-1500": """
expected layout:
  <out>/scannet_test_1500/scene####_##/color/*.jpg
  <out>/scannet_test_1500/scene####_##/pose/*.txt
  <out>/scannet_test_1500/scene####_##/intrinsic/intrinsic_color.txt
  <out>/test.npz  (LoFTR pair list)""",
    "megadepth-train": """
expected layout:
  <out>/MegaDepth_v1/<scene>/dense*/imgs/*.jpg + depths/*.h5
  <out>/train_data/megadepth_indices/scene_info_0.1_0.7/*.npz""",
}


def fetch(url: str, dest: str) -> bool:
    # curl needs -f so HTTP errors fail the command instead of writing the
    # error page to dest (which would then crash tarfile instead of taking
    # the graceful manual-placement path)
    for cmd in (["wget", "-q", "-O", dest, url],
                ["curl", "-sSfL", "-o", dest, url]):
        try:
            subprocess.run(cmd, check=True, timeout=3600)
            return os.path.getsize(dest) > 0
        except Exception:
            continue
    return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", required=True, choices=sorted(URLS))
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    ok = True
    for url, kind in URLS[args.dataset]:
        name = os.path.join(args.out, url.rsplit("/", 1)[-1])
        print(f"fetching {url}")
        if not fetch(url, name):
            print(f"  FAILED (no network?). Place the archive at {name} "
                  f"manually and re-run.")
            ok = False
            continue
        print(f"  extracting {name}")
        mode = "r:gz" if kind == "tar.gz" else "r"
        with tarfile.open(name, mode) as tf:
            tf.extractall(args.out)
    print(LAYOUTS[args.dataset])
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
