"""Image comparison tool: the ImageComparer as a CLI.

TPU-native analog of src/Node/ImageComparer.{hpp,cpp}: snapshot images by
name and compare pairs with MSE / SMAPE / average metrics (computed on
device; the reference uses a GPU kernel with fixed-point atomics,
image_compare.hlsl:14-48). The pan/zoom A/B viewer becomes a side-by-side +
difference image written to disk.

Usage:
    python -m stratum_tpu.tools.compare a.hdr b.hdr [--metric=smape]
        [--diff=out.png] [--quantize=8]
"""

from __future__ import annotations

import sys


def main(argv=None) -> int:
    from stratum_tpu.utils.flags import Options

    opts = Options(sys.argv[1:] if argv is None else argv)
    if len(opts.positional) < 2:
        print(__doc__)
        return 1
    import numpy as np

    from stratum_tpu.io.image import load_image, save_image
    from stratum_tpu.utils import compare as metrics

    a = np.asarray(load_image(opts.positional[0], srgb=False))[..., :3]
    b = np.asarray(load_image(opts.positional[1], srgb=False))[..., :3]
    if a.shape != b.shape:
        print(f"shape mismatch: {a.shape} vs {b.shape}")
        return 1
    # quantize option mirrors the reference's comparer quantization mode
    q = opts.get_int("quantize", 0)
    if q:
        scale = (1 << q) - 1
        a = np.round(np.clip(a, 0, 1) * scale) / scale
        b = np.round(np.clip(b, 0, 1) * scale) / scale
    results = {
        "mse": float(metrics.mse(a, b)),
        "rmse": float(metrics.rmse(a, b)),
        "smape": float(metrics.smape(a, b)),
        "relmse": float(metrics.relative_mse(a, b)),
        "mean_a": float(metrics.average(a)),
        "mean_b": float(metrics.average(b)),
    }
    wanted = opts.get_str("metric", "")
    if wanted:
        print(results[wanted])
    else:
        for k, v in results.items():
            print(f"{k:8s} {v:.6g}")
    diff_out = opts.get_str("diff", "")
    if diff_out:
        d = np.abs(a - b)
        gain = opts.get_float("diffGain", 4.0)
        save_image(diff_out, np.clip(d * gain, 0, 1), tonemapped=True)
        print(f"wrote {diff_out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
