"""Dataset builder: image folder (+ labels, + paired seg masks) -> zips.

Equivalent of /root/reference/PanoHead/dataset_tool.py (zip builder with
dataset.json camera labels) and dataset_tool_seg.py:211-372 (paired
image+segmentation zips with matched archive names). Output layout
matches the reference: img{idx:08d}.png under {idx//1000:05d}/ shards,
dataset.json carrying 'labels' (and 'fnames' for provenance), and the
seg zip mirroring the image names so MaskLabeledDataset pairs them.
"""
from __future__ import annotations

import argparse
import json
import os
import zipfile
from io import BytesIO


def _transform(img, resolution: int, transform: str, resample):
    """scale / center-crop to a square resolution (ref dataset_tool_seg
    make_transform, :116-166)."""
    import numpy as np
    from PIL import Image

    arr = np.asarray(img)
    if transform == "center-crop":
        crop = min(arr.shape[:2])
        arr = arr[(arr.shape[0] - crop) // 2:(arr.shape[0] + crop) // 2,
                  (arr.shape[1] - crop) // 2:(arr.shape[1] + crop) // 2]
        img = Image.fromarray(arr)
    if resolution and img.size != (resolution, resolution):
        img = img.resize((resolution, resolution), resample)
    return img


def _iter_images(source: str):
    exts = (".png", ".jpg", ".jpeg", ".webp")
    for root, _dirs, files in sorted(os.walk(source)):
        for n in sorted(files):
            if n.lower().endswith(exts):
                full = os.path.join(root, n)
                yield os.path.relpath(full, source).replace("\\", "/"), full


def main(argv=None):
    from PIL import Image

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--source", required=True, help="folder of images")
    p.add_argument("--dest", required=True, help="output .zip")
    p.add_argument("--labels", default="",
                   help="json {filename: [25 floats]} or a dataset.json")
    p.add_argument("--resolution", type=int, default=0, help="resize (0 = keep)")
    p.add_argument("--transform", default="scale",
                   choices=["scale", "center-crop"])
    p.add_argument("--max_images", type=int, default=0)
    # seg-pair mode (ref dataset_tool_seg.py)
    p.add_argument("--seg_source", default="",
                   help="folder of segmentation masks (paired by basename)")
    p.add_argument("--seg_dest", default="",
                   help="output .zip for the masks")
    p.add_argument("--use_basename", action="store_true",
                   help="pair/label by basename instead of relative path")
    args = p.parse_args(argv)
    if bool(args.seg_source) != bool(args.seg_dest):
        p.error("--seg_source and --seg_dest must be given together")

    labels = {}
    if args.labels:
        with open(args.labels) as f:
            raw = json.load(f)
        if isinstance(raw, dict) and isinstance(raw.get("labels"), list):
            labels = {k: v for k, v in raw["labels"]}   # dataset.json format
        else:
            labels = raw

    seg_index = {}
    if args.seg_source:
        for rel, full in _iter_images(args.seg_source):
            key = os.path.basename(rel) if args.use_basename else rel
            seg_index[os.path.splitext(key)[0]] = full

    rows, fnames = [], []
    n_written = 0
    zimg = zipfile.ZipFile(args.dest, "w", zipfile.ZIP_STORED)
    zseg = (zipfile.ZipFile(args.seg_dest, "w", zipfile.ZIP_STORED)
            if args.seg_dest else None)
    try:
        for rel, full in _iter_images(args.source):
            key = os.path.basename(rel) if args.use_basename else rel
            if labels and key not in labels:
                print(f"label not found: {key}")
                continue
            stem = os.path.splitext(key)[0]
            if zseg is not None and stem not in seg_index:
                print(f"segmentation not found: {stem}")
                continue

            idx_str = f"{n_written:08d}"
            arch = f"{idx_str[:5]}/img{idx_str}.png"

            img = Image.open(full).convert("RGB")
            img = _transform(img, args.resolution, args.transform,
                             Image.LANCZOS)
            buf = BytesIO()
            img.save(buf, format="PNG", compress_level=0, optimize=False)
            zimg.writestr(arch, buf.getvalue())

            if zseg is not None:
                seg = Image.open(seg_index[stem])
                seg = _transform(seg, args.resolution, args.transform,
                                 Image.LANCZOS)
                buf = BytesIO()
                seg.save(buf, format="PNG", compress_level=0, optimize=False)
                zseg.writestr(arch, buf.getvalue())

            if key in labels:
                rows.append([arch, labels[key]])
            fnames.append([arch, rel])
            n_written += 1
            if args.max_images and n_written >= args.max_images:
                break

        meta = {
            "labels": rows if rows and len(rows) == n_written else None,
            "fnames": fnames,
        }
        zimg.writestr("dataset.json", json.dumps(meta))
        if zseg is not None:
            zseg.writestr("dataset.json", json.dumps(meta))
    finally:
        zimg.close()
        if zseg is not None:
            zseg.close()
    print(f"wrote {args.dest}: {n_written} images, {len(rows)} labels"
          + (f" (+ masks -> {args.seg_dest})" if zseg is not None else ""))


if __name__ == "__main__":
    main()
