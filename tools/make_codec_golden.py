#!/usr/bin/env python
"""Generate golden DCT-codec outputs FROM THE REFERENCE'S OWN CODE.

Runs the reference eval transform pipeline (Resize -> CenterCrop -> GetDCT
-> UpScaleDCT -> ToTensorDCT -> SubsetDCT -> Aggregate -> NormalizeDCT,
reference data/datamgr.py:193-220) and the raw codec kernels
(``transform_dct_size``, reference data/cvfunctional.py:59-74) on
deterministic fixture images, and stores the results as
``tests/golden/codec_fs{fs}.npz``.  The committed .npz is the parity oracle
for ``tests/test_codec_golden.py`` — our fused on-device codec must
reproduce these numbers, so any drift in the JAX pipeline's numerics fails
CI without needing the reference tree at test time.

The filter_size != 8 path needs only cv2 + torch (both in this sandbox);
``turbojpeg`` / ``jpeg2dct`` are stubbed because the fs==8 JPEG path never
runs here (it would need libjpeg-turbo; the fs==8 numerics note lives in
data/codec.py).

Usage:  python tools/make_codec_golden.py [--ref /root/reference] \
            [--out tests/golden]
"""
import argparse
import os
import sys
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _stub_jpeg_modules():
    """The reference imports turbojpeg/jpeg2dct at module scope; the fs!=8
    path never calls them, so empty stubs keep the import graph happy."""
    tj = types.ModuleType("turbojpeg")

    class _NoTurboJPEG:
        """GetDCT constructs an encoder unconditionally but only calls it
        on the fs==8 path — construction is benign, use raises."""
        def __init__(self, *a, **k):
            pass

        def encode(self, *a, **k):
            raise RuntimeError("turbojpeg unavailable in this sandbox")
    tj.TurboJPEG = _NoTurboJPEG
    sys.modules.setdefault("turbojpeg", tj)

    j2d = types.ModuleType("jpeg2dct")
    j2d_np = types.ModuleType("jpeg2dct.numpy")

    def _no_loads(*a, **k):
        raise RuntimeError("jpeg2dct unavailable in this sandbox")
    j2d_np.loads = _no_loads
    j2d.numpy = j2d_np
    sys.modules.setdefault("jpeg2dct", j2d)
    sys.modules.setdefault("jpeg2dct.numpy", j2d_np)

    # torchvision: imported by datamgr for the RGB (non-DCT) branches only
    tv = types.ModuleType("torchvision")
    tv_t = types.ModuleType("torchvision.transforms")
    tv.transforms = tv_t
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.transforms", tv_t)


def fixture_images(n=6, size=96, seed=1234):
    """Deterministic, natural-ish uint8 RGB fixtures: smooth low-frequency
    color fields + midband texture + a little noise (pure-noise images
    exercise unrealistic AC statistics)."""
    from scipy.ndimage import zoom
    rng = np.random.default_rng(seed)
    imgs = np.empty((n, size, size, 3), np.uint8)
    for i in range(n):
        base = zoom(rng.uniform(40, 215, (4, 4, 3)),
                    (size / 4, size / 4, 1), order=1)
        tex = zoom(rng.normal(0, 25, (12, 12, 3)),
                   (size / 12, size / 12, 1), order=1)
        noise = rng.normal(0, 6, (size, size, 3))
        imgs[i] = np.clip(base + tex + noise, 0, 255).astype(np.uint8)
    return imgs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="/root/reference")
    ap.add_argument("--out", default=os.path.join(REPO, "tests", "golden"))
    ap.add_argument("--filter_size", type=int, default=4)
    ap.add_argument("--image_size_dct", type=int, default=16)
    ap.add_argument("--channels", type=int, default=24)
    args = ap.parse_args()

    _stub_jpeg_modules()
    ref_pkg = os.path.join(args.ref, "dct-cryptonets")
    sys.path.insert(0, ref_pkg)
    # the reference package is named `data` — make sure ours is not shadowing
    for m in [m for m in sys.modules if m == "data" or m.startswith("data.")]:
        del sys.modules[m]
    from data.datamgr import TransformLoader          # reference code
    from data import cvfunctional as F                # reference code

    fs, S, ch = args.filter_size, args.image_size_dct, args.channels
    imgs = fixture_images()
    loader = TransformLoader(image_size=S)
    tf = loader.get_composed_transform_dct_img(
        aug=False, filter_size=fs, channels=ch, dct_pattern="default")

    full = np.stack([tf(im).numpy() for im in imgs])  # (N, C, S, S) torch CHW

    # raw codec kernels on pre-cropped inputs (bypasses Resize/CenterCrop):
    P = fs * S
    cropped = imgs[:, :P, :P, :]
    ys, cbs, crs = [], [], []
    for im in cropped:
        dy, dcb, dcr = F.transform_dct_size(im, None, fs)
        ys.append(dy)
        cbs.append(dcb)
        crs.append(dcr)

    os.makedirs(args.out, exist_ok=True)
    out = os.path.join(args.out, f"codec_fs{fs}.npz")
    np.savez_compressed(
        out, images=imgs, cropped=cropped,
        full_pipeline=full.astype(np.float32),
        dct_y=np.stack(ys).astype(np.float32),
        dct_cb=np.stack(cbs).astype(np.float32),
        dct_cr=np.stack(crs).astype(np.float32),
        filter_size=fs, image_size_dct=S, channels=ch)
    print(f"wrote {out}: full={full.shape} dct_y={np.stack(ys).shape}")


if __name__ == "__main__":
    main()
