"""Generate a CelebA-shaped JPEG tree for the decode-warmup A/B.

The decode A/B (benchmarks/decode_warm_ab.py) needs a real folder of
JPEGs large enough that epoch-1 decode is the bottleneck. CelebA images
are 178x218 JPEGs (reference dataloader/dataset.py resizes them to 64);
we synthesize smooth low-frequency textures so libjpeg does realistic
work (white noise compresses pathologically and decodes unrealistically
fast).

ImageFolderSource mirrors torchvision's ImageFolder (one subdirectory per
class), so the images land under ``<out>/c0/``.

    python -m benchmarks.gen_jpeg_tree --out /tmp/ab_imgs/train --n 20000
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np
from PIL import Image


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/ab_imgs/train")
    ap.add_argument("--n", type=int, default=20000)
    ap.add_argument("--width", type=int, default=178)
    ap.add_argument("--height", type=int, default=218)
    ns = ap.parse_args(argv)

    out = os.path.join(ns.out, "c0")  # ImageFolder-style class subdir
    os.makedirs(out, exist_ok=True)
    # Resume by filling exactly the missing indices (an interrupted run can
    # leave holes mid-range); each image is seeded by its own index so the
    # content at index i is identical regardless of resume history and no
    # two indices ever share a texture.
    present = {f for f in os.listdir(out) if f.endswith(".jpg")}
    missing = [i for i in range(ns.n) if f"{i:06d}.jpg" not in present]
    if not missing:
        print(f"already {ns.n} images at {out}; nothing to do")
        return

    # Low-res noise upsampled = smooth image-like content, cheap to make.
    t0 = time.time()
    for k, i in enumerate(missing):
        rng = np.random.default_rng(i)
        small = rng.integers(0, 256, size=(ns.height // 8, ns.width // 8, 3),
                             dtype=np.uint8)
        img = Image.fromarray(small).resize((ns.width, ns.height),
                                            Image.BILINEAR)
        img.save(os.path.join(out, f"{i:06d}.jpg"), quality=90)
        if (k + 1) % 2000 == 0:
            print(f"{k + 1}/{len(missing)} ({time.time() - t0:.0f}s)",
                  flush=True)
    print(f"done: {len(missing)} new JPEGs at {out} "
          f"({ns.n} total) in {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
