"""Forced alignment: Viterbi/HMM alignment and CTC segmentation."""
