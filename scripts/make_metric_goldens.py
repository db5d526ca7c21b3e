#!/usr/bin/env python
"""Generate depth-metric golden fixtures from the REFERENCE implementation.

Runs the reference ``evaluation/video_depth/tools.py::depth_evaluation`` (torch,
loaded by path from the read-only reference checkout) on seeded synthetic
(pred, gt) arrays for every alignment mode and records the metric dicts to
``tests/fixtures/depth_metric_goldens.json``. The committed fixture pins
``aether_tpu/eval/depth_metrics.py`` to the reference's numeric semantics even
on machines where the reference checkout is absent
(tests/test_reference_metric_parity.py).

Usage: python scripts/make_metric_goldens.py [--reference /root/reference]
"""

import argparse
import importlib.util
import json
import pathlib
import sys

import numpy as np


def load_reference_tools(reference_root: str):
    path = pathlib.Path(reference_root) / "evaluation" / "video_depth" / "tools.py"
    spec = importlib.util.spec_from_file_location("ref_depth_tools", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def make_cases(seed: int = 1234):
    """Seeded synthetic (pred, gt, kwargs) cases covering every align mode."""
    rng = np.random.default_rng(seed)
    f, h, w = 4, 24, 32
    gt = rng.uniform(0.5, 60.0, size=(f, h, w))
    gt[rng.uniform(size=gt.shape) < 0.08] = 0.0       # invalid pixels
    gt[rng.uniform(size=gt.shape) < 0.03] = 120.0     # beyond max_depth
    # pred = affine-warped gt + noise, so every aligner has signal to recover
    pred = 0.7 * gt + 1.3 + rng.normal(0, 0.8, size=gt.shape)
    pred = np.clip(pred, 0.05, None)
    custom = rng.uniform(size=gt.shape) < 0.85

    disp_gt = np.where(gt > 0, 1.0 / np.maximum(gt, 1e-3), 0.0)
    disp_pred = 0.9 * disp_gt + 0.02 + rng.normal(0, 0.01, size=gt.shape)
    disp_pred = np.clip(disp_pred, 1e-4, None)

    cases = []
    for align in ("median", "lstsq", "lad", "lad2", "scale", "metric"):
        cases.append({"name": f"align_{align}", "align": align,
                      "pred": pred, "gt": gt, "kwargs": {}})
    cases.append({"name": "median_custom_mask", "align": "median",
                  "pred": pred, "gt": gt, "kwargs": {"custom_mask": custom}})
    cases.append({"name": "lstsq_clips", "align": "lstsq", "pred": pred,
                  "gt": gt, "kwargs": {"pre_clip_min": 0.2, "pre_clip_max": 70.0,
                                       "post_clip_min": 0.1,
                                       "post_clip_max": 90.0}})
    cases.append({"name": "median_no_max_depth", "align": "median",
                  "pred": pred, "gt": gt, "kwargs": {"max_depth": None}})
    # disparity-space alignment path (tools.py disp_input=True)
    cases.append({"name": "scale_disp_input", "align": "scale",
                  "pred": disp_pred, "gt": gt, "kwargs": {"disp_input": True}})
    return cases


ALIGN_FLAGS = {
    "median": {},
    "lstsq": {"align_with_lstsq": True},
    "lad": {"align_with_lad": True},
    "lad2": {"align_with_lad2": True},
    "scale": {"align_with_scale": True},
    "metric": {"metric_scale": True},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument(
        "--out",
        default=str(pathlib.Path(__file__).resolve().parent.parent
                    / "tests" / "fixtures" / "depth_metric_goldens.json"),
    )
    args = ap.parse_args()

    tools = load_reference_tools(args.reference)
    goldens = {"seed": 1234, "cases": {}}
    for case in make_cases():
        kwargs = dict(case["kwargs"])
        kwargs.update(ALIGN_FLAGS[case["align"]])
        results, parity, aligned, gt_masked = tools.depth_evaluation(
            case["pred"].copy(), case["gt"].copy(), use_gpu=False, **kwargs
        )
        # record the metric dict plus cheap summaries of the returned maps so
        # the parity test also pins the error-parity/aligned-map semantics
        goldens["cases"][case["name"]] = {
            "align": case["align"],
            "kwargs": {k: (v.tolist() if isinstance(v, np.ndarray) else v)
                       for k, v in case["kwargs"].items()
                       if k != "custom_mask"},
            "has_custom_mask": "custom_mask" in case["kwargs"],
            "metrics": {k: float(v) for k, v in results.items()},
            "parity_sum": float(np.asarray(parity).sum()),
            "aligned_mean": float(np.asarray(aligned).mean()),
            "gt_masked_sum": float(np.asarray(gt_masked).sum()),
        }
        print(f"{case['name']}: AbsRel={results['Abs Rel']:.6f} "
              f"valid={results['valid_pixels']}")

    out = pathlib.Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(goldens, indent=1, ensure_ascii=False))
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
