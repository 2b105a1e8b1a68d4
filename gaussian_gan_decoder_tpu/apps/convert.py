"""COLMAP photogrammetry convert step.

Equivalent of /root/reference/gaussian_splatting/convert.py: shells out to
the `colmap` binary (feature extraction, matching, mapping, undistortion)
to turn a folder of photos into the sparse/ layout read_colmap_scene
consumes. COLMAP itself is an external tool, exactly as in the reference.
"""
from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys


def run(cmd):
    print("+", " ".join(cmd))
    r = subprocess.run(cmd)
    if r.returncode != 0:
        sys.exit(f"command failed ({r.returncode}): {' '.join(cmd)}")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--source_path", "-s", required=True,
                   help="folder containing input/ images")
    p.add_argument("--camera", default="OPENCV")
    p.add_argument("--colmap_executable", default="colmap")
    p.add_argument("--no_gpu", action="store_true")
    args = p.parse_args(argv)

    colmap = args.colmap_executable
    if shutil.which(colmap) is None:
        sys.exit(
            f"'{colmap}' not found on PATH. Install COLMAP or pass "
            "--colmap_executable. (This step only prepares input data; all "
            "training/rendering in this framework is COLMAP-free.)"
        )

    src = args.source_path
    use_gpu = "0" if args.no_gpu else "1"
    os.makedirs(os.path.join(src, "distorted/sparse"), exist_ok=True)
    run([colmap, "feature_extractor",
         "--database_path", f"{src}/distorted/database.db",
         "--image_path", f"{src}/input",
         "--ImageReader.single_camera", "1",
         "--ImageReader.camera_model", args.camera,
         "--SiftExtraction.use_gpu", use_gpu])
    run([colmap, "exhaustive_matcher",
         "--database_path", f"{src}/distorted/database.db",
         "--SiftMatching.use_gpu", use_gpu])
    run([colmap, "mapper",
         "--database_path", f"{src}/distorted/database.db",
         "--image_path", f"{src}/input",
         "--output_path", f"{src}/distorted/sparse",
         "--Mapper.ba_global_function_tolerance=0.000001"])
    run([colmap, "image_undistorter",
         "--image_path", f"{src}/input",
         "--input_path", f"{src}/distorted/sparse/0",
         "--output_path", src,
         "--output_type", "COLMAP"])
    # move sparse/* -> sparse/0 (ref convert.py tail)
    sparse = os.path.join(src, "sparse")
    os.makedirs(os.path.join(sparse, "0"), exist_ok=True)
    for f in os.listdir(sparse):
        if f != "0":
            shutil.move(os.path.join(sparse, f), os.path.join(sparse, "0", f))
    print("done")


if __name__ == "__main__":
    main()
