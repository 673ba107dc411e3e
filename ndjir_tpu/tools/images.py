"""Image preprocessing tools: frame extraction, masks, deblur, renaming.

Parity surface with reference scripts/extract_images.py, create_masks.py,
deblur_images.py, rename_images.sh.  External-model steps (rembg background
matting, NAFNet deblurring) are gated on their packages being installed —
this image has neither, so documented fallbacks are provided (GrabCut-based
matting; pass-through copy for deblur).

Run: python -m ndjir_tpu.tools.images <extract|masks|deblur|rename> ...
"""

from __future__ import annotations

import glob
import os
import shutil


def extract_frames(video_path: str, out_dir: str, num_frames: int = 100):
    """Evenly-spaced frame extraction (reference: extract_images.py)."""
    import cv2

    os.makedirs(out_dir, exist_ok=True)
    cap = cv2.VideoCapture(video_path)
    total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    step = max(1, total // num_frames)
    i = o = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if i % step == 0 and o < num_frames:
            cv2.imwrite(os.path.join(out_dir, f"{o:06d}.png"), frame)
            o += 1
        i += 1
    cap.release()
    print(f"Extracted {o} frames to {out_dir}")
    return o


def create_masks(image_dir: str, mask_dir: str, method: str = "auto"):
    """Background matting.  Uses rembg when installed (reference:
    create_masks.py:21); otherwise GrabCut seeded with a border prior."""
    import cv2
    import numpy as np

    os.makedirs(mask_dir, exist_ok=True)
    files = sorted(glob.glob(os.path.join(image_dir, "*")))

    use_rembg = False
    if method in ("auto", "rembg"):
        try:
            from rembg import remove  # noqa: F401

            use_rembg = True
        except ImportError:
            if method == "rembg":
                raise
            print("rembg not installed; falling back to GrabCut matting")

    for f in files:
        name = os.path.splitext(os.path.basename(f))[0]
        out = os.path.join(mask_dir, f"{name}.png")
        img = cv2.imread(f)
        if use_rembg:
            from rembg import remove

            rgba = remove(cv2.cvtColor(img, cv2.COLOR_BGR2RGB))
            mask = (rgba[..., 3] > 127).astype("uint8") * 255
        else:
            h, w = img.shape[:2]
            gc_mask = np.full((h, w), cv2.GC_PR_FGD, np.uint8)
            b = max(2, min(h, w) // 20)
            gc_mask[:b, :] = gc_mask[-b:, :] = cv2.GC_BGD
            gc_mask[:, :b] = gc_mask[:, -b:] = cv2.GC_BGD
            bgd = np.zeros((1, 65), np.float64)
            fgd = np.zeros((1, 65), np.float64)
            cv2.grabCut(img, gc_mask, None, bgd, fgd, 3,
                        cv2.GC_INIT_WITH_MASK)
            mask = np.where((gc_mask == cv2.GC_FGD)
                            | (gc_mask == cv2.GC_PR_FGD), 255, 0).astype("uint8")
        cv2.imwrite(out, mask)
    print(f"Wrote {len(files)} masks to {mask_dir}")


def deblur_images(image_dir: str, out_dir: str):
    """NAFNet deblurring when basicsr is installed (reference:
    deblur_images.py:22-38); otherwise a documented pass-through copy."""
    os.makedirs(out_dir, exist_ok=True)
    try:
        import basicsr  # noqa: F401

        raise NotImplementedError(
            "NAFNet weights require network download; wire your checkpoint "
            "into ndjir_tpu/tools/images.py:deblur_images")
    except ImportError:
        print("basicsr/NAFNet not installed; copying images unchanged "
              "(deblurring skipped)")
        for f in sorted(glob.glob(os.path.join(image_dir, "*"))):
            shutil.copy(f, os.path.join(out_dir, os.path.basename(f)))


def rename_sequential(dir_path: str, ext: str = "png"):
    """Sequential zero-padded renaming (reference: rename_images.sh)."""
    files = sorted(glob.glob(os.path.join(dir_path, "*")))
    for i, f in enumerate(files):
        os.rename(f, os.path.join(dir_path, f"{i:06d}.{ext}"))
    print(f"Renamed {len(files)} files in {dir_path}")


def apply_mask_to_images(image_dir: str, mask_dir: str, out_dir: str):
    """Multiply masks into images (reference: apply_mask_to_image.py)."""
    import imageio.v2 as imageio
    import numpy as np

    os.makedirs(out_dir, exist_ok=True)
    for fi, fm in zip(sorted(glob.glob(os.path.join(image_dir, "*"))),
                      sorted(glob.glob(os.path.join(mask_dir, "*")))):
        img = np.asarray(imageio.imread(fi))
        m = np.asarray(imageio.imread(fm))
        if m.ndim == 3:
            m = m[..., 0]
        out = (img[..., :3] * (m > 127.5)[..., None]).astype("uint8")
        imageio.imwrite(os.path.join(out_dir, os.path.basename(fi)), out)


def main():
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    e = sub.add_parser("extract")
    e.add_argument("video")
    e.add_argument("out_dir")
    e.add_argument("--num-frames", type=int, default=100)
    m = sub.add_parser("masks")
    m.add_argument("image_dir")
    m.add_argument("mask_dir")
    m.add_argument("--method", default="auto")
    d = sub.add_parser("deblur")
    d.add_argument("image_dir")
    d.add_argument("out_dir")
    r = sub.add_parser("rename")
    r.add_argument("dir")
    a = sub.add_parser("apply-mask")
    a.add_argument("image_dir")
    a.add_argument("mask_dir")
    a.add_argument("out_dir")
    args = p.parse_args()
    if args.cmd == "extract":
        extract_frames(args.video, args.out_dir, args.num_frames)
    elif args.cmd == "masks":
        create_masks(args.image_dir, args.mask_dir, args.method)
    elif args.cmd == "deblur":
        deblur_images(args.image_dir, args.out_dir)
    elif args.cmd == "rename":
        rename_sequential(args.dir)
    elif args.cmd == "apply-mask":
        apply_mask_to_images(args.image_dir, args.mask_dir, args.out_dir)


if __name__ == "__main__":
    main()
