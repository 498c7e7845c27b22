"""TartanEvent full-scene evaluation entry point.

The reference README advertises `evaluate_tartanevent.py` but its repo omits
it (SURVEY.md §7.8); this is the thin variant of cli.evaluate for full
TartanEvent scene directories:

  python -m rampvo_tpu.cli.evaluate_tartanevent --weights W
      --config_VO config_vo/default.yaml
      --config_eval config_net/MultiScale_TartanEvent.json
      --dataset_path /path/to/TartanEvent [--scenes S1 S2 ...]
"""

from __future__ import annotations

import argparse
import glob
import json
import os.path as osp

from ..vo import VOConfig
from .evaluate import evaluate


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--weights", default="RAMPVO_MultiScale.pth")
    parser.add_argument("--config_VO", default="config_vo/default.yaml")
    parser.add_argument("--config_eval", type=str,
                        default="config_net/MultiScale_TartanEvent.json")
    parser.add_argument("--dataset_path", type=str, required=True)
    parser.add_argument("--scenes", nargs="*", default=None,
                        help="scene subdirs; defaults to the config test_split")
    parser.add_argument("--trials", type=int, default=1)
    parser.add_argument("--downsample_fact", type=int, default=1)
    parser.add_argument("--results_path", type=str, default=None)
    args = parser.parse_args()

    config_VO = VOConfig.from_yaml(args.config_VO)
    eval_cfg = json.load(open(args.config_eval))

    if args.scenes:
        scenes = [osp.join(args.dataset_path, s) for s in args.scenes]
    else:
        listed = eval_cfg["data_loader"]["test"]["test_split"]
        scenes = [osp.join(args.dataset_path, s) for s in listed]
        if not scenes:
            scenes = sorted(
                p for p in glob.glob(osp.join(args.dataset_path, "*/*/*"))
                if osp.isdir(osp.join(p, "image_left"))
            )
    eval_cfg["data_loader"]["test"]["test_split"] = scenes
    eval_cfg["data_loader"]["test"].setdefault(
        "dataset_name", "TartanEvent_competition"
    )

    results = evaluate(
        net=args.weights, trials=args.trials,
        downsample_fact=args.downsample_fact, config_VO=config_VO,
        eval_cfg=eval_cfg, results_path=args.results_path,
    )
    for k in results:
        print(k, results[k])


if __name__ == "__main__":
    main()
