"""Generate a CelebA-shaped JPEG tree for folder-path harnesses.

The decode A/B (benchmarks/decode_warm_ab.py) needs a real folder of
JPEGs large enough that epoch-1 decode is the bottleneck. CelebA images
are 178x218 JPEGs (reference dataloader/dataset.py resizes them to 64);
we synthesize smooth textures so libjpeg does realistic work (white noise
compresses pathologically and decodes unrealistically fast).

Two content bases:

- ``--basis block8`` (legacy, the round-4 tree): 8×-downsampled uint8
  noise bilinearly upsampled. Realistic for DECODE-cost work, but after
  the training transform (resize 218→64) its correlation length is only
  ~2.3 px — far sharper than the σ=6 low-frequency basis that the
  round-4 destabilization study proved necessary for a LEARNABLE
  synthetic task (data/pipeline.py SyntheticSource docstring). Training
  QUALITY runs on this tree partially reproduce the posterior-collapse
  signature (E2E_FOLDER_r4b.json: Eec floors ~1700 and rises, FID
  bounces) — use it only for decode/feed benchmarks.
- ``--basis lf``: the SyntheticSource 16-coefficient σ=6 FFT-blurred
  basis itself, rendered at 64×64, bilinearly upsampled to CelebA shape
  and JPEG-encoded. After the training transform this matches (up to
  resize/JPEG loss) the in-memory synthetic stream that passes the
  reproduce gates (REPRODUCTION_SYNTH_r4.json) — the tree for
  quality-gated folder E2Es (VERDICT r4 #2).

ImageFolderSource mirrors torchvision's ImageFolder (one subdirectory per
class), so the images land under ``<out>/c0/``.

    python -m benchmarks.gen_jpeg_tree --out /tmp/ab_imgs/train --n 20000
    python -m benchmarks.gen_jpeg_tree --out /tmp/lf_imgs/train \
        --n 20000 --basis lf
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
    ap.add_argument("--basis", choices=["block8", "lf"], default="block8",
                    help="block8: legacy decode-benchmark texture; "
                         "lf: SyntheticSource's learnable σ=6 basis "
                         "(use for quality-gated training E2Es)")
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

    lf_source = None
    if ns.basis == "lf":
        # Render the exact in-memory synthetic distribution that passes
        # the reproduce gates; index i here = source index i, so the tree
        # is deterministic and hole-fillable like the block8 path.
        from disentangle_mlp_tpu.data.pipeline import SyntheticSource
        lf_source = SyntheticSource(size=ns.n, img_size=64, seed=0)

    t0 = time.time()
    for k, i in enumerate(missing):
        if lf_source is not None:
            x = lf_source._materialize(np.array([i]))[0]  # 64×64×3 ∈ [-1,1]
            small = ((x + 1.0) * 127.5).clip(0, 255).astype(np.uint8)
        else:
            # Low-res noise upsampled = smooth content, cheap to make.
            rng = np.random.default_rng(i)
            small = rng.integers(0, 256,
                                 size=(ns.height // 8, ns.width // 8, 3),
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
