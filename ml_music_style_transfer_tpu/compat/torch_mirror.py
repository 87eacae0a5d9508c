"""Reduced-width torch mirror assembled from the reference's own code.

The reference PerformanceNet hard-codes its decoder channel plan
(/root/reference/model/model.py:228-243), so width-reduced parity runs
(CPU-sized training-dynamics checks, tests/test_train_parity.py and
scripts/verify_torch_import.py --train-parity) need its construct_layers
recipe (model.py:185-246) re-run with a ModelConfig's scaled plan. Every
module CLASS (DownConv/UpConv/DenseConcat/MBRBlock, model.py:34-174) and
both forward FUNCTIONS (PerformanceNet.forward model.py:262-300,
Onset_Offset_Encoder.forward model.py:135-141) are imported read-only from
the reference — so gradients in a parity run flow through the reference's
literal block code, and only the layer widths differ. state_dict key names
match the full reference model's, so compat.torch_import / torch_export
translate the mirror unchanged.

At width_mult=1.0 the mirror is layer-for-layer identical to the
reference's own PerformanceNet() (same classes, same plan, same forward).
"""
from __future__ import annotations

import os
import sys

from ..config import ModelConfig

REF_MODEL_DIR = "/root/reference/model"


def reference_available() -> bool:
    return os.path.isdir(REF_MODEL_DIR)


def import_reference():
    """Read-only import of the reference's model.py and train.py modules."""
    sys.path.insert(0, REF_MODEL_DIR)
    try:
        import model as ref_model  # the reference's own model.py
        import train as ref_train  # the reference's own train.py
    finally:
        sys.path.remove(REF_MODEL_DIR)
    return ref_model, ref_train


def build_torch_mirror(cfg: ModelConfig, ref_model=None, dropout: bool = False):
    """Reference blocks + reference forward at ``cfg``'s channel widths.

    ``dropout=False`` zeroes every nn.Dropout rate (the one stochastic op),
    making the mirror deterministic for trajectory-parity runs.
    """
    import torch.nn as nn

    if ref_model is None:
        ref_model, _ = import_reference()

    midi_plan, audio_plan = cfg.midi_channel_plan, cfg.audio_channel_plan
    onoff_ch = [cfg.scaled(cfg.start_channels * 2 ** (i + 1))
                for i in range(cfg.onset_encoder_depth)]

    class _OnsetEncoder(nn.Module):
        depth = cfg.onset_encoder_depth

        def __init__(self):
            super().__init__()
            convs, ins = [], cfg.start_channels
            for i, outs in enumerate(onoff_ch):
                convs.append(ref_model.DownConv(ins, outs, pooling=True,
                                                block_id=i + 9))
                ins = outs
            self.down_convs = nn.ModuleList(convs)

        forward = ref_model.Onset_Offset_Encoder.forward

    class _Mirror(nn.Module):
        def __init__(self):
            super().__init__()
            downs, ins = [], cfg.start_channels
            for i, outs in enumerate(midi_plan):
                downs.append(ref_model.DownConv(
                    ins, outs, pooling=i < cfg.depth - 1, block_id=i))
                ins = outs
            self.down_convs = nn.ModuleList(downs)
            downs, ins = [], cfg.start_audio_channels
            for i, outs in enumerate(audio_plan):
                downs.append(ref_model.DownConv(
                    ins, outs, pooling=i < cfg.depth - 1, block_id=i))
                ins = outs
            self.down_convs_audio = nn.ModuleList(downs)
            dense = []
            for i in range(cfg.depth):  # model.py:216-225
                om, oa = midi_plan[-(i + 1)], audio_plan[-(i + 1)]
                dense.append(ref_model.DenseConcat(om + oa, int(om * 1.5), om))
            self.dense_concats = nn.ModuleList(dense)
            # model.py:228-233 scaled: skip ch = that level's DenseConcat out,
            # cond ch = onset encoder maps deepest-first ([i-1] quirk)
            self.up_convs = nn.ModuleList([
                ref_model.UpConv(midi_plan[4], midi_plan[3], midi_plan[3],
                                 onoff_ch[2], block_id=5, upconv_kernel=6),
                ref_model.UpConv(midi_plan[3], midi_plan[2], midi_plan[2],
                                 onoff_ch[1], block_id=6, upconv_kernel=4),
                ref_model.UpConv(midi_plan[2], midi_plan[2], midi_plan[1],
                                 0, block_id=7, upconv_kernel=3),
                ref_model.UpConv(midi_plan[2], midi_plan[2], midi_plan[0],
                                 0, block_id=8, upconv_kernel=2),
            ])
            self.MBRBlock1 = ref_model.MBRBlock(midi_plan[2], 2)
            self.MBRBlock2 = ref_model.MBRBlock(midi_plan[2], 4)
            self.MBRBlock3 = ref_model.MBRBlock(midi_plan[2], 8)
            self.MBRBlock4 = ref_model.MBRBlock(midi_plan[2], 16)
            self.lastconv = nn.ConvTranspose1d(
                midi_plan[2], cfg.n_out_bins, kernel_size=3, stride=1, padding=1)
            self.lrelu = nn.LeakyReLU(0.01)
            self.onset_offset_encoder = _OnsetEncoder()

        forward = ref_model.PerformanceNet.forward

    mirror = _Mirror()
    if not dropout:
        for m in mirror.modules():
            if isinstance(m, nn.Dropout):
                m.p = 0.0
    return mirror
