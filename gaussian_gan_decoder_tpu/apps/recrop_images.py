"""Recrop in-the-wild head images for PanoHead-style training.

CLI over data/recrop.py — the alignment pipeline of
/root/reference/PanoHead/3DDFA_V2_cropping/recrop_images.py:169-330:

  landmarks -> initial quad -> [detector: 3DMM pose -> quad refinement +
  acceptance gates + EG3D camera label] -> feathered 512^2 crop
  -> out_dir/*.jpg + quads.pkl + dataset.json

The 3DMM detector (FaceBoxes + TDDFA) needs external weights that this
environment cannot fetch; supply one as a python entry point with
`--detector pkg.module:fn` where `fn(img_bgr) -> list of (P_3x4,
roi_box)` — the geometry around it is fully implemented. Without a
detector the tool still produces landmark-aligned crops + quads (no
camera labels), which is the FFHQ-style alignment subset.

Input landmarks: a pickle {image_path: (68|106, 2) array} (the format the
reference's dlib_kps.py writes) or a JSON of lists.
"""
from __future__ import annotations

import argparse
import json
import os
import pickle

import numpy as np


def load_landmarks(path: str):
    if path.endswith(".json"):
        with open(path) as f:
            return {k: np.asarray(v, np.float32) for k, v in json.load(f).items()}
    with open(path, "rb") as f:
        data = pickle.load(f, encoding="latin1")
    return {k: np.asarray(v, np.float32) for k, v in dict(data).items()}


def resolve_detector(spec: str):
    mod_name, _, fn_name = spec.partition(":")
    import importlib

    mod = importlib.import_module(mod_name)
    return getattr(mod, fn_name or "detect")


def main(argv=None):
    from ..data.recrop import (
        crop_bound_from_landmarks, crop_final, crop_quad, find_center_bbox,
        refine_quad_with_pose)

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-i", "--input_path", required=True,
                   help="landmarks pickle/json {path: (N,2)}")
    p.add_argument("-p", "--prefix", default="", help="image path prefix")
    p.add_argument("-o", "--output", default="quads.pkl")
    p.add_argument("-j", "--output_json", default="dataset.json")
    p.add_argument("--out_dir", default="./crop_samples/img")
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--method", default="ffhq", choices=["ffhq", "default"])
    p.add_argument("--detector", default="",
                   help="pkg.module:fn -> [(P_3x4, roi_box), ...] per image")
    p.add_argument("--tddfa_size", type=int, default=120)
    args = p.parse_args(argv)

    import cv2

    detector = resolve_detector(args.detector) if args.detector else None
    landmarks = load_landmarks(args.input_path)
    os.makedirs(args.out_dir, exist_ok=True)

    results_quad, results_meta = {}, {}
    n_skip = 0
    for img_path, lm in landmarks.items():
        full = args.prefix + img_path
        img = cv2.imread(full, flags=cv2.IMREAD_COLOR)
        if img is None:
            print(f"cannot load {full}")
            n_skip += 1
            continue
        quad, c, x, y = crop_bound_from_landmarks(lm, method=args.method)

        if detector is not None:
            work = crop_quad(img, quad, args.size)
            dets = detector(work)
            if not dets:
                print(f"no face: {img_path}")
                n_skip += 1
                continue
            idx = find_center_bbox([d[1] for d in dets], args.size, args.size)
            P, roi_box = dets[idx]
            res = refine_quad_with_pose(
                c, x, y, P, roi_box, crop_size=args.size,
                tddfa_size=args.tddfa_size)
            if not res.accepted:
                print(f"skip {img_path}: {res.reject_reason}")
                n_skip += 1
                continue
            quad = res.quad
            results_meta[img_path] = res.cam_label

        cropped = crop_final(img, quad, size=args.size)
        if cropped is None:
            print(f"skip {img_path}: crop below min size")
            n_skip += 1
            continue
        results_quad[img_path] = quad
        out_name = os.path.basename(img_path)
        out_name = os.path.splitext(out_name)[0] + ".jpg"
        cv2.imwrite(os.path.join(args.out_dir, out_name), cropped)

    with open(args.output, "wb") as f:
        pickle.dump(results_quad, f)
    if results_meta:
        rows = [
            (os.path.basename(k), [format(v, ".6f") for v in P])
            for k, P in results_meta.items()
        ]
        with open(os.path.join(args.out_dir, args.output_json), "w") as f:
            json.dump({"labels": rows}, f, indent="\t")
    print(f"cropped {len(results_quad)}, skipped {n_skip}, "
          f"labels: {len(results_meta)}")


if __name__ == "__main__":
    main()
