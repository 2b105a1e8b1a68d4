"""Dataset builder: image folder (+ labels) -> training zip.

Equivalent of /root/reference/PanoHead/dataset_tool.py (zip builder with
dataset.json camera labels) and dataset_tool_seg.py (paired seg zips).
"""
from __future__ import annotations

import argparse
import json
import os
import zipfile


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--source", required=True, help="folder of images")
    p.add_argument("--dest", required=True, help="output .zip")
    p.add_argument("--labels", default="", help="json {filename: [25 floats]}")
    p.add_argument("--resolution", type=int, default=0, help="resize (0 = keep)")
    args = p.parse_args(argv)

    labels = {}
    if args.labels:
        with open(args.labels) as f:
            labels = json.load(f)

    names = sorted(
        n for n in os.listdir(args.source)
        if n.lower().endswith((".png", ".jpg", ".jpeg"))
    )
    rows = []
    with zipfile.ZipFile(args.dest, "w", zipfile.ZIP_STORED) as z:
        for i, n in enumerate(names):
            out_name = f"img{i:08d}.png"
            src = os.path.join(args.source, n)
            if args.resolution:
                from io import BytesIO

                from PIL import Image

                img = Image.open(src).convert("RGB").resize(
                    (args.resolution, args.resolution), Image.LANCZOS)
                buf = BytesIO()
                img.save(buf, format="PNG")
                z.writestr(out_name, buf.getvalue())
            else:
                z.write(src, out_name)
            if n in labels:
                rows.append([out_name, labels[n]])
        if rows:
            z.writestr("dataset.json", json.dumps({"labels": rows}))
    print(f"wrote {args.dest}: {len(names)} images, {len(rows)} labels")


if __name__ == "__main__":
    main()
