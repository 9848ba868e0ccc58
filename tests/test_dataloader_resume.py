"""Loader checkpointing (mid-epoch resume), samplers, converter mapping."""
import numpy as np

import jax


def test_saveable_dataloader_midepoch_resume():
    """The reference fast-forwards the sampler after intra-epoch recovery
    (dataloader.py:144-181); ours must resume at the recorded batch."""
    from svt_speechbrain_tpu.dataio.dataloader import SaveableDataLoader
    from svt_speechbrain_tpu.dataio.dataset import DynamicItemDataset

    data = {f"u{i}": {"value": i} for i in range(10)}
    ds = DynamicItemDataset(data, output_keys=["id", "value"])
    loader = SaveableDataLoader(ds, batch_size=2, non_padded_keys=("value",))

    it = iter(loader)
    first = [next(it), next(it)]  # consume 2 batches
    state = loader.state_dict()
    assert state["iterator_position"] == 2

    # a fresh loader restored mid-epoch continues at batch 2
    loader2 = SaveableDataLoader(ds, batch_size=2, non_padded_keys=("value",))
    loader2.load_state_dict(state, end_of_epoch=False)
    resumed = list(iter(loader2))
    assert len(resumed) == 3  # batches 2..4 of 5
    assert [v for b in resumed for v in b.value] == list(range(4, 10))

    # end-of-epoch restore starts over
    loader3 = SaveableDataLoader(ds, batch_size=2, non_padded_keys=("value",))
    loader3.load_state_dict(state, end_of_epoch=True)
    assert len(list(iter(loader3))) == 5


def test_concat_and_dynamic_batch_samplers():
    from svt_speechbrain_tpu.dataio.sampler import (
        ConcatDatasetBatchSampler, SequentialSampler, DynamicBatchSampler,
    )
    from svt_speechbrain_tpu.dataio.dataset import DynamicItemDataset

    s1 = SequentialSampler(list(range(6)))
    s2 = SequentialSampler(list(range(4)))
    concat = ConcatDatasetBatchSampler([s1, s2], [2, 1])
    batches = list(concat)
    assert len(batches) == len(concat) == 3
    # each batch: 2 from ds1 (offset 0) + 1 from ds2 (offset 6)
    assert batches[0] == [0, 1, 6]
    assert batches[1] == [2, 3, 7]

    rng = np.random.default_rng(0)
    data = {f"u{i}": {"duration": float(rng.uniform(1, 10))} for i in range(50)}
    ds = DynamicItemDataset(data, output_keys=["id"])
    dbs = DynamicBatchSampler(ds, max_batch_length=30, num_buckets=4,
                              shuffle=True, seed=1)
    batches = list(dbs)
    seen = sorted(i for b in batches for i in b)
    assert seen == list(range(50))
    for b in batches:
        durs = [data[ds.data_ids[i]]["duration"] for i in b]
        assert sum(durs) <= 30 + max(durs)  # bucket budget respected


def test_avhubert_converter_name_coverage():
    """Synthetic fairseq-style state dict converts without missing keys and
    the converted model runs."""
    import jax.numpy as jnp
    import torch

    from svt_speechbrain_tpu.models.avhubert import AVHubertConfig, AVHubertModel
    from svt_speechbrain_tpu.models.convert_fairseq import convert_avhubert_state_dict

    cfg = AVHubertConfig(encoder_layers=1, encoder_embed_dim=16,
                         encoder_ffn_embed_dim=32, encoder_attention_heads=4,
                         audio_feat_dim=8, conv_pos=16, conv_pos_groups=4)
    torch.manual_seed(0)
    d = cfg.encoder_embed_dim

    sd = {}
    sd["feature_extractor_audio.proj.weight"] = torch.randn(d, 8)
    sd["feature_extractor_audio.proj.bias"] = torch.randn(d)
    sd["feature_extractor_video.proj.weight"] = torch.randn(d, 512)
    sd["feature_extractor_video.proj.bias"] = torch.randn(d)
    # resnet (reference layout)
    sd["feature_extractor_video.resnet.frontend3D.0.weight"] = torch.randn(64, 1, 5, 7, 7)
    for k, shape in [("weight", (64,)), ("bias", (64,)),
                     ("running_mean", (64,)), ("running_var", (64,))]:
        sd[f"feature_extractor_video.resnet.frontend3D.1.{k}"] = torch.randn(*shape)
    sd["feature_extractor_video.resnet.frontend3D.2.weight"] = torch.randn(64)
    inpl = 64
    for layer, planes in enumerate((64, 128, 256, 512), start=1):
        for b in range(2):
            pre = f"feature_extractor_video.resnet.trunk.layer{layer}.{b}."
            stride_in = inpl if b == 0 else planes
            sd[pre + "conv1.weight"] = torch.randn(planes, stride_in, 3, 3)
            sd[pre + "conv2.weight"] = torch.randn(planes, planes, 3, 3)
            for tag in ("bn1", "bn2"):
                for k, shape in [("weight", (planes,)), ("bias", (planes,)),
                                 ("running_mean", (planes,)), ("running_var", (planes,))]:
                    sd[f"{pre}{tag}.{k}"] = torch.randn(*shape)
            sd[pre + "relu1.weight"] = torch.randn(planes)
            sd[pre + "relu2.weight"] = torch.randn(planes)
            if b == 0 and (stride_in != planes or layer > 1):
                sd[pre + "downsample.0.weight"] = torch.randn(planes, stride_in, 1, 1)
                for k, shape in [("weight", (planes,)), ("bias", (planes,)),
                                 ("running_mean", (planes,)), ("running_var", (planes,))]:
                    sd[f"{pre}downsample.1.{k}"] = torch.randn(*shape)
        inpl = planes
    sd["layer_norm.weight"] = torch.randn(2 * d)
    sd["layer_norm.bias"] = torch.randn(2 * d)
    sd["post_extract_proj.weight"] = torch.randn(d, 2 * d)
    sd["post_extract_proj.bias"] = torch.randn(d)
    sd["mask_emb"] = torch.randn(8)
    sd["encoder.pos_conv.0.weight_g"] = torch.randn(1, 1, cfg.conv_pos)
    sd["encoder.pos_conv.0.weight_v"] = torch.randn(d, d // cfg.conv_pos_groups, cfg.conv_pos)
    sd["encoder.pos_conv.0.bias"] = torch.randn(d)
    sd["encoder.layer_norm.weight"] = torch.randn(d)
    sd["encoder.layer_norm.bias"] = torch.randn(d)
    pre = "encoder.layers.0."
    for name in ("q_proj", "k_proj", "v_proj", "out_proj"):
        sd[pre + f"self_attn.{name}.weight"] = torch.randn(d, d)
        sd[pre + f"self_attn.{name}.bias"] = torch.randn(d)
    for name, shape in [("self_attn_layer_norm", (d,)), ("final_layer_norm", (d,))]:
        sd[pre + name + ".weight"] = torch.randn(*shape)
        sd[pre + name + ".bias"] = torch.randn(*shape)
    sd[pre + "fc1.weight"] = torch.randn(cfg.encoder_ffn_embed_dim, d)
    sd[pre + "fc1.bias"] = torch.randn(cfg.encoder_ffn_embed_dim)
    sd[pre + "fc2.weight"] = torch.randn(d, cfg.encoder_ffn_embed_dim)
    sd[pre + "fc2.bias"] = torch.randn(d)

    sd = {k: v.numpy() for k, v in sd.items()}
    params, state = convert_avhubert_state_dict(sd, cfg)

    model = AVHubertModel(cfg)
    ref_params = model.init(jax.random.PRNGKey(0))
    ref_state = model.init_state()
    # converted trees have the same structure as freshly-initialized ones
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(ref_params))
    assert (jax.tree_util.tree_structure(state)
            == jax.tree_util.tree_structure(ref_state))

    video = jnp.asarray(np.random.default_rng(0).normal(size=(1, 3, 88, 88, 1)),
                        jnp.float32)
    feats, _ = model.extract_finetune(params, state, {"video": video, "audio": None})
    assert feats.shape == (1, 3, 16)
