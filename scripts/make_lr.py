"""Generate bicubic LR images from an HR folder (dataset preparation).

The reference datasets ship pre-generated '<name>x{s}.png' LR images
(reference README.md:76-92, MATLAB-style bicubic with antialiasing). This
helper synthesizes them with PIL's antialiased BICUBIC resize — the closest
widely-available approximation to MATLAB imresize. NOTE: not bit-identical
to MATLAB-generated LR; models trained/evaluated on the paper's data should
use the original LR files.

Usage:
  python scripts/make_lr.py --hr US1K/US1K_train_HR \
      --out US1K/US1K_train_LR_bicubic --scales 2 3 4
"""

from __future__ import annotations

import argparse
import os


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hr", required=True, help="folder of HR images")
    ap.add_argument("--out", required=True,
                    help="output root (X{s}/ subdirs are created)")
    ap.add_argument("--scales", type=int, nargs="+", default=[2, 3, 4])
    args = ap.parse_args()

    from PIL import Image

    names = sorted(os.listdir(args.hr))
    for s in args.scales:
        os.makedirs(os.path.join(args.out, f"X{s}"), exist_ok=True)
    done = 0
    for name in names:
        base, ext = os.path.splitext(name)
        if ext.lower() not in (".png", ".jpg", ".jpeg", ".bmp"):
            continue
        img = Image.open(os.path.join(args.hr, name)).convert("RGB")
        w, h = img.size
        for s in args.scales:
            lr = img.resize((w // s, h // s), Image.BICUBIC)
            lr.save(os.path.join(args.out, f"X{s}", f"{base}x{s}{ext}"))
        done += 1
        if done % 100 == 0:
            print(f"{done} images done")
    print(f"generated LR for {done} images at scales {args.scales}")


if __name__ == "__main__":
    main()
