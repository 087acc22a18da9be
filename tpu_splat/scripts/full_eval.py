"""Eval-suite orchestration (role of reference full_eval*.py).

Shells out to train/render/eval_fps/metrics per scene, with per-dataset flag
bundles from scene_args.yaml (same keys as the reference's), timing.json and
collect_results at the end. Variants (envgs/real/specular/materials) are
flag presets selected with --suite.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from argparse import ArgumentParser

SCENE_SETS = {
    # reference full_eval.py:18-22
    "ref_real": ["gardenspheres", "sedan", "toycar"],
    "envgs": ["angel", "bell", "cat", "horse", "luyu", "potion", "tbell", "teapot"],
    "shiny_blender": ["ball", "car", "coffee", "helmet", "teapot", "toaster"],
    "nerf_synthetic": ["chair", "drums", "ficus", "hotdog", "lego", "materials",
                        "mic", "ship"],
    "glossy_synthetic": ["angel", "bell", "cat", "horse", "luyu", "potion",
                          "tbell", "teapot"],
}

SUITE_ARGS = {
    # reference scene_args.yaml:10-21
    "synthetic": ["-w", "--init_until_iter", "20", "--iterations_override", "35000"],
    "real": [
        "--init_until_iter", "3000", "--use_env_scope",
        "--longer_prop_iter", "15000", "--iterations_override", "65000",
    ],
    "specular": ["--iterations_override", "30000"],
    "default": [],
}


def run(cmd: list[str], log_path: str | None = None) -> int:
    print("+", " ".join(cmd))
    if log_path:
        with open(log_path, "a") as log:
            return subprocess.call(cmd, stdout=log, stderr=subprocess.STDOUT)
    return subprocess.call(cmd)


def main(argv=None):
    parser = ArgumentParser()
    parser.add_argument("--base_dir", required=True, help="datasets root")
    parser.add_argument("--output_path", default="./eval")
    parser.add_argument("--scenes", nargs="+", default=None)
    parser.add_argument("--scene_set", choices=sorted(SCENE_SETS), default=None)
    parser.add_argument("--suite", choices=sorted(SUITE_ARGS), default="default")
    parser.add_argument("--skip_training", action="store_true")
    parser.add_argument("--skip_rendering", action="store_true")
    parser.add_argument("--skip_metrics", action="store_true")
    parser.add_argument("--extra_train_args", nargs="*", default=[])
    args = parser.parse_args(argv)

    scenes = args.scenes or SCENE_SETS.get(args.scene_set, [])
    if not scenes:
        print("No scenes selected (pass --scenes or --scene_set)")
        return 1

    os.makedirs(args.output_path, exist_ok=True)
    timing = {}
    py = [sys.executable, "-m"]
    for scene in scenes:
        src = os.path.join(args.base_dir, scene)
        out = os.path.join(args.output_path, scene)
        log = os.path.join(args.output_path, f"{scene}.log")
        if not args.skip_training:
            t0 = time.time()
            rc = run(
                py + ["tpu_splat.scripts.train", "-s", src, "-m", out, "--eval"]
                + SUITE_ARGS[args.suite] + args.extra_train_args,
                log,
            )
            timing[scene] = (time.time() - t0) / 60
            with open(os.path.join(args.output_path, "timing.json"), "w") as f:
                json.dump(timing, f, indent=2)
            if rc:
                print(f"[WARN] training failed for {scene} (rc={rc}); continuing")
                continue
        if not args.skip_rendering:
            run(py + ["tpu_splat.scripts.render", "-m", out, "--skip_train"], log)
            run(py + ["tpu_splat.scripts.eval_fps", "-m", out], log)
        if not args.skip_metrics:
            run(py + ["tpu_splat.scripts.metrics", "-m", out], log)

    run(
        py + ["tpu_splat.scripts.collect_results", "--output_path", args.output_path,
              "--scenes"] + scenes
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
