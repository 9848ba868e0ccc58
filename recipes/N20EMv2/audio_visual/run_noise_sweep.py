#!/usr/bin/env python3
"""Noise-robustness sweep harness: evaluate the AV fusion model (and the
audio-only control) across noise types and SNRs, reproducing the reference's
``assets/noise_test.png`` protocol (SURVEY.md §6: accompaniment sweep at
SNR −10…+10 dB plus clean; AV ≥ A everywhere).

Usage:
  python run_noise_sweep.py hparams/train_rca_av.yaml --data_folder=... \
      [--noise_types accomp white babble natural] [--snrs -10 -5 0 5 10]

Writes one JSON line per (system, noise_type, snr) to ``noise_sweep.jsonl``
in the output folder and prints a summary table.
"""
import argparse
import json
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import svt_speechbrain_tpu as sb  # noqa: E402
from svt_speechbrain_tpu.config import load_hyperyaml  # noqa: E402
from train_rca_av import dataio_prepare  # noqa: E402
from train_rca_av import AMT as AMT_AV  # noqa: E402
from train_rca_a import AMT as AMT_A  # noqa: E402

logger = logging.getLogger(__name__)


def evaluate_condition(brain_cls, hparams_file, base_overrides, noise_type,
                       snr_db, add_noise):
    overrides = base_overrides + (
        f"\nnoise_type: {noise_type}\nsnr_db: {snr_db}\nadd_noise: {add_noise}\n")
    with open(hparams_file) as fin:
        hparams = load_hyperyaml(fin, overrides)
    _, _, test_datasets = dataio_prepare(hparams)
    brain = brain_cls(modules=hparams["modules"], hparams=hparams,
                      run_opts={"noprogressbar": True},
                      checkpointer=hparams["checkpointer"])
    brain.init_optimizers()
    brain.evaluate(list(test_datasets.values())[0], max_key="COnPOff_f1",
                   test_loader_kwargs=hparams["test_dataloader_opts"])
    return {name: getattr(brain, f"{name}_f1").avg
            for name in brain.metric_names}


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("hparams_file")
    parser.add_argument("--data_folder", required=True)
    parser.add_argument("--noise_types", nargs="*", default=["accomp"])
    parser.add_argument("--snrs", nargs="*", type=int, default=[-10, -5, 0, 5, 10])
    parser.add_argument("--systems", nargs="*", default=["av", "a"],
                        choices=["av", "a"])
    parser.add_argument("--out", default="noise_sweep.jsonl")
    args, extra = parser.parse_known_args()

    base_overrides = f"data_folder: {args.data_folder}\n" + "\n".join(
        e.lstrip("-").replace("=", ": ", 1) for e in extra)
    systems = {"av": AMT_AV, "a": AMT_A}

    results = []
    for system in args.systems:
        cls = systems[system]
        # clean condition first
        metrics = evaluate_condition(cls, args.hparams_file, base_overrides,
                                     "accomp", 0, False)
        results.append({"system": system, "noise_type": "clean", "snr_db": None,
                        **metrics})
        for noise_type in args.noise_types:
            for snr in args.snrs:
                metrics = evaluate_condition(cls, args.hparams_file,
                                             base_overrides, noise_type, snr, True)
                results.append({"system": system, "noise_type": noise_type,
                                "snr_db": snr, **metrics})

    with open(args.out, "w") as f:
        for row in results:
            f.write(json.dumps(row) + "\n")
    print(f"{'system':>6} {'noise':>8} {'snr':>5} {'COn_f1':>8} {'COnPOff_f1':>11}")
    for row in results:
        print(f"{row['system']:>6} {row['noise_type']:>8} "
              f"{str(row['snr_db']):>5} {row['COn']:>8.3f} {row['COnPOff']:>11.3f}")
