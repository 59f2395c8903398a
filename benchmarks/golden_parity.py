"""Golden-image parity check vs the reference's committed renders
(BASELINE configs 1-2).

Renders each geometry at the golden resolution (1024²) with the camera
recovered by golden_recover.py (benchmarks/golden_cameras.json) and a
matcap, then reports silhouette IoU and foreground color statistics vs the
golden PPM, and writes side-by-side comparison images.

Exact pixel equality is not attainable — the goldens' cameras were never
recorded (recovered to ~0.9 IoU at 64², limited by the reference's unlogged
exact pose/zoom) and their matcap is unknown — so parity is structural:
silhouette IoU at full resolution plus shading-statistics agreement.

Usage: python benchmarks/golden_parity.py [--res 1024]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import os as _os

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

import cudaneuralrender_tpu as cnr
from cudaneuralrender_tpu.utils import image_io

HERE = os.path.dirname(os.path.abspath(__file__))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--matcap", default="/root/reference/matcaps/Car Paint Red.png")
    ap.add_argument("--outdir", default="/tmp/golden_parity")
    args = ap.parse_args()

    with open(os.path.join(HERE, "golden_cameras.json")) as fh:
        cameras = {k: v for k, v in json.load(fh).items() if not k.startswith("_")}

    matcap_path = args.matcap
    if not os.path.exists(matcap_path):
        # matcap filenames vary in case; fall back to any red-ish one
        matcap_path = "/root/reference/matcaps/red.png"
    matcap = image_io.load_matcap(matcap_path) if os.path.exists(matcap_path) else None
    shading = "matcap" if matcap is not None else "facing"

    os.makedirs(args.outdir, exist_ok=True)
    ok = True
    for name, cam_info in cameras.items():
        golden = image_io.load_ppm(f"/root/reference/neuralGeometries/{name}.h5.ppm")
        if cam_info["flip"]:
            golden = golden[::-1]
        if golden.shape[0] != args.res:
            k = golden.shape[0] // args.res
            golden = golden[::k, ::k]

        params = cnr.load(f"/root/reference/neuralGeometries/{name}.h5")
        cfg = cnr.RenderConfig(width=args.res, height=args.res, scene="neural_raw",
                               max_steps=args.steps, shading=shading)
        cam = cnr.Camera.from_cli(rx=cam_info["rx"], ry=cam_info["ry"],
                                  zoom=cam_info["zoom"])
        img = np.asarray(cnr.render_staged(params, cam, cfg, matcap=matcap))
        ours = image_io.to_uint8_image(img)

        g_fg = np.any(golden > 10, axis=-1)
        o_fg = ours[..., 3] > 0
        inter = (g_fg & o_fg).sum()
        union = (g_fg | o_fg).sum()
        iou = inter / max(union, 1)

        g_mean = golden[g_fg].mean(axis=0)
        o_mean = ours[..., :3][o_fg].mean(axis=0)
        print(f"{name}: IoU={iou:.4f}  fg_frac ours={o_fg.mean():.4f} "
              f"golden={g_fg.mean():.4f}  mean RGB ours={o_mean.round(1)} "
              f"golden={g_mean.round(1)}", flush=True)
        ok &= iou > 0.8

        side = np.concatenate(
            [np.dstack([golden, np.full(golden.shape[:2], 255, np.uint8)]), ours],
            axis=1,
        )
        out = os.path.join(args.outdir, f"{name}_compare.png")
        image_io.save_png(out, side)
        print(f"  wrote {out}", flush=True)

    print("PARITY OK" if ok else "PARITY BELOW THRESHOLD")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
