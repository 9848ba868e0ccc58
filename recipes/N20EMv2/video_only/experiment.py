"""SpeechBrain-style `experiment.py params.yaml` entry point: runs the
recipe's trainer (`train_video_ssl.py`) — the contract the reference's
recipes follow (`python <script> <hparams.yaml> [overrides]`)."""
import os
import runpy
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
runpy.run_path(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "train_video_ssl.py"), run_name="__main__")
