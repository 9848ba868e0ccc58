#!/usr/bin/env python3
"""Recipe: extract per-song AV-HuBERT visual features for stage-2 fusion.

Twin of ``/root/reference/N20EMv2/video_only/extract_ssl_feats.py``: dumps
per-song visual features to ``noise_data/video_feats.npy`` (``:108-111``).
"""
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))  # sibling recipe imports

import svt_speechbrain_tpu as sb  # noqa: E402
from svt_speechbrain_tpu.config import load_hyperyaml  # noqa: E402
from train_video_ssl import AMT, dataio_prepare  # noqa: E402

logger = logging.getLogger(__name__)

if __name__ == "__main__":
    hparams_file, run_opts, overrides = sb.parse_arguments(sys.argv[1:])
    with open(hparams_file) as fin:
        hparams = load_hyperyaml(fin, overrides)
    sb.create_experiment_directory(
        experiment_directory=hparams["output_folder"],
        hyperparams_to_save=hparams_file, overrides=overrides)

    train_data, valid_data, test_datasets = dataio_prepare(hparams, extract=True)
    amt_brain = AMT(modules=hparams["modules"], hparams=hparams,
                    run_opts=run_opts, checkpointer=hparams["checkpointer"])
    amt_brain.return_feats = True

    for name, data in [("valid", valid_data), *test_datasets.items()]:
        logger.info(f"Extracting visual features for split: {name}")
        amt_brain.evaluate(data, max_key="COnPOff_f1",
                           test_loader_kwargs=hparams["test_dataloader_opts"])
