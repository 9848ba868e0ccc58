#!/usr/bin/env python3
"""Recipe: wav2vec2 audio AMT on N20EMv2 (mix-trainable with MIR-ST500).

Twin of ``/root/reference/N20EMv2/audio_only/train_audio_ssl.py``. Deltas
from the MIR-ST500 recipe: offset BCE pos_weight, COff metrics, zero-metrics
guard, noisy-input switch, ``mix_train`` CSV selection, checkpoint selection
by max valid COnPOff_f1, model export for stage-2 fusion.
"""
import json
import logging
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", ".."))

import svt_speechbrain_tpu as sb  # noqa: E402
from svt_speechbrain_tpu.config import load_hyperyaml  # noqa: E402
from svt_speechbrain_tpu.dataio import dataio, dataset  # noqa: E402
from svt_speechbrain_tpu.tasks.amt import AudioAMT  # noqa: E402

logger = logging.getLogger(__name__)


class AMT(AudioAMT):
    """N20EMv2 audio AMT (reference ``audio_only/train_audio_ssl.py``)."""


def dataio_prepare(hparams, extract=False):
    """Datasets + pipelines (reference ``:387-470``); ``extract`` keeps the
    wav path in the outputs for the feature-dump path."""
    data_folder = hparams["data_folder"]
    train_csv_path = hparams["mix_train_csv"] if hparams.get("mix_train") else hparams["train_csv"]
    train_data = dataset.DynamicItemDataset.from_csv(
        csv_path=train_csv_path, replacements={"data_root": data_folder})

    if hparams["sorting"] in ("ascending", "descending"):
        train_data = train_data.filtered_sorted(
            sort_key="duration", reverse=hparams["sorting"] == "descending")
        hparams["train_dataloader_opts"]["shuffle"] = False
    elif hparams["sorting"] != "random":
        raise NotImplementedError("sorting must be random, ascending or descending")

    valid_data = dataset.DynamicItemDataset.from_csv(
        csv_path=hparams["valid_csv"], replacements={"data_root": data_folder})
    test_datasets = {}
    for csv_file in hparams["test_csv"]:
        name = os.path.splitext(os.path.basename(csv_file))[0]
        test_datasets[name] = dataset.DynamicItemDataset.from_csv(
            csv_path=csv_file, replacements={"data_root": data_folder})
    datasets = [train_data, valid_data] + [i for k, i in test_datasets.items()]

    dur_threshold = hparams["dur_threshold"]
    sample_rate = hparams["sample_rate"]
    frame_rate = hparams["frame_rate"]

    def audio_pipeline(wav, utter_id, utter_num):
        """Read (optionally the synthesized noisy version,
        reference ``extract_ssl_feats.py:471-475``) + utterance slice."""
        if hparams.get("add_noise"):
            folder = os.path.dirname(wav)
            wav = os.path.join(folder, "noise_data", hparams["noise_type"],
                               f"SNR_{hparams['snr_db']}dB.wav")
        sig = dataio.read_audio(wav)
        assert sig.ndim == 1
        utter_id, utter_num = int(utter_id), int(utter_num)
        start = round((utter_id - 1) * sample_rate * dur_threshold)
        if utter_id == utter_num:
            return sig[start:]
        stop = round(utter_id * sample_rate * dur_threshold)
        return sig[start:stop]

    dataset.add_dynamic_item(datasets, audio_pipeline,
                             takes=["wav", "utter_id", "utter_num"], provides="sig")

    def anno_items(frame_anno, song_anno, utter_id, utter_num):
        utter_id, utter_num = int(utter_id), int(utter_num)
        with open(song_anno) as json_data:
            song = json.load(json_data)
        song_np = np.array(song, dtype=np.float64)
        ref_intervals = song_np[:, :2]
        ref_pitchs = song_np[:, 2]
        anno = np.load(frame_anno)
        start = round((utter_id - 1) * frame_rate * dur_threshold)
        if utter_id == utter_num:
            anno = anno[start:]
        else:
            stop = round(utter_id * frame_rate * dur_threshold)
            anno = anno[start:stop]
        return anno, utter_id, utter_num, ref_intervals, ref_pitchs

    dataset.add_dynamic_item(
        datasets, anno_items,
        takes=["frame_anno", "song_anno", "utter_id", "utter_num"],
        provides=["anno", "cur_utter", "all_utter", "ref_intervals", "ref_pitchs"])

    keys = ["id", "sig", "anno", "cur_utter", "all_utter", "ref_intervals", "ref_pitchs"]
    if extract:
        keys.append("wav")
    dataset.set_output_keys(datasets, keys)
    return train_data, valid_data, test_datasets


if __name__ == "__main__":
    hparams_file, run_opts, overrides = sb.parse_arguments(sys.argv[1:])
    from svt_speechbrain_tpu.parallel.distributed import ddp_init_group

    ddp_init_group(run_opts)
    with open(hparams_file) as fin:
        hparams = load_hyperyaml(fin, overrides)
    sb.create_experiment_directory(
        experiment_directory=hparams["output_folder"],
        hyperparams_to_save=hparams_file, overrides=overrides)

    train_data, valid_data, test_datasets = dataio_prepare(hparams)
    amt_brain = AMT(modules=hparams["modules"], hparams=hparams,
                    run_opts=run_opts, checkpointer=hparams["checkpointer"])
    amt_brain.fit(
        amt_brain.hparams.epoch_counter, train_data, valid_data,
        train_loader_kwargs=hparams["train_dataloader_opts"],
        valid_loader_kwargs=hparams["valid_dataloader_opts"])
    for k in test_datasets.keys():
        amt_brain.evaluate(test_datasets[k], max_key="COnPOff_f1",
                           test_loader_kwargs=hparams["test_dataloader_opts"])
