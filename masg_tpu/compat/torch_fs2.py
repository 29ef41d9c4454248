"""torch FastSpeech2 checkpoint -> masg_tpu flax params conversion.

Lets users of the reference load their trained checkpoints
(torch.save({'model': state_dict, ...}) from train.py:271-285) into this
framework. tests/test_torch_parity.py proves bit-level forward equivalence
between the reference torch model and our flax model under this mapping.

Layout notes:
- torch Linear weight (out, in) -> flax Dense kernel (in, out): transpose;
- torch Conv1d weight (out, in, k) -> flax Conv kernel (k, in, out);
- torch nn.Embedding(padding_idx=0) rows load as-is (our PaddedEmbed masks
  row 0 at lookup, reproducing the frozen-zero row);
- PostNet BatchNorm running stats map into the flax batch_stats collection;
- positional tables and pitch/energy bin buffers are recomputed, not loaded.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _lin(sd, prefix):
    out = {"kernel": np.asarray(sd[prefix + ".weight"]).T}
    if prefix + ".bias" in sd:
        out["bias"] = np.asarray(sd[prefix + ".bias"])
    return out


def _conv(sd, prefix):
    out = {"kernel": np.transpose(np.asarray(sd[prefix + ".weight"]), (2, 1, 0))}
    if prefix + ".bias" in sd:
        out["bias"] = np.asarray(sd[prefix + ".bias"])
    return out


def _ln(sd, prefix):
    return {"scale": np.asarray(sd[prefix + ".weight"]),
            "bias": np.asarray(sd[prefix + ".bias"])}


def _fft_block(sd, prefix):
    return {
        "slf_attn": {
            "w_qs": _lin(sd, prefix + ".slf_attn.w_qs"),
            "w_ks": _lin(sd, prefix + ".slf_attn.w_ks"),
            "w_vs": _lin(sd, prefix + ".slf_attn.w_vs"),
            "fc": _lin(sd, prefix + ".slf_attn.fc"),
            "layer_norm": _ln(sd, prefix + ".slf_attn.layer_norm"),
        },
        "pos_ffn": {
            "w_1": _conv(sd, prefix + ".pos_ffn.w_1"),
            "w_2": _conv(sd, prefix + ".pos_ffn.w_2"),
            "layer_norm": _ln(sd, prefix + ".pos_ffn.layer_norm"),
        },
    }


def _variance_predictor(sd, prefix):
    return {
        "conv1d_1": _conv(sd, prefix + ".conv_layer.conv1d_1.conv"),
        "layer_norm_1": _ln(sd, prefix + ".conv_layer.layer_norm_1"),
        "conv1d_2": _conv(sd, prefix + ".conv_layer.conv1d_2.conv"),
        "layer_norm_2": _ln(sd, prefix + ".conv_layer.layer_norm_2"),
        "linear_layer": _lin(sd, prefix + ".linear_layer"),
    }


def _lstm_cell(sd, prefix, sfx=""):
    """torch nn.LSTMCell / nn.LSTM layer -> flax OptimizedLSTMCell params.
    `sfx` selects an nn.LSTM layer ("_l0", "_l1", ...); empty for LSTMCell.
    The two torch biases fold into one (forward-identical; see train/optim.py
    double_lstm_bias_updates for the matching update-math compat)."""
    wi = np.asarray(sd[f"{prefix}.weight_ih{sfx}"])  # (4H, in)
    wh = np.asarray(sd[f"{prefix}.weight_hh{sfx}"])  # (4H, H)
    b = (np.asarray(sd[f"{prefix}.bias_ih{sfx}"])
         + np.asarray(sd[f"{prefix}.bias_hh{sfx}"]))
    h = wh.shape[1]
    cell: Dict[str, Any] = {}
    for gi, g in enumerate(["i", "f", "g", "o"]):  # torch gate order i,f,g,o
        sl = slice(gi * h, (gi + 1) * h)
        cell[f"i{g}"] = {"kernel": wi[sl].T}
        cell[f"h{g}"] = {"kernel": wh[sl].T, "bias": b[sl]}
    return cell


def convert_torch_jdit(sd) -> Dict[str, Any]:
    """jdit.decoder.* torch keys (reference model/jdit.py:238-520 Tacotron2
    teacher) -> our models/jdit.py param tree (prenet + memory_layer at the
    decoder level, everything per-frame under the scanned 'step' module)."""
    d = "jdit.decoder"
    return {
        "decoder": {
            "prenet": {
                "linear_0": _lin(sd, f"{d}.prenet.layers.0.linear_layer"),
                "linear_1": _lin(sd, f"{d}.prenet.layers.1.linear_layer"),
            },
            "memory_layer": _lin(
                sd, f"{d}.attention_layer.memory_layer.linear_layer"),
            "step": {
                "attention_rnn": _lstm_cell(sd, f"{d}.attention_rnn"),
                "decoder_rnn": _lstm_cell(sd, f"{d}.decoder_rnn"),
                "query_layer": _lin(
                    sd, f"{d}.attention_layer.query_layer.linear_layer"),
                "v": _lin(sd, f"{d}.attention_layer.v.linear_layer"),
                "location_conv": _conv(
                    sd, f"{d}.attention_layer.location_layer.location_conv.conv"),
                "location_dense": _lin(
                    sd,
                    f"{d}.attention_layer.location_layer.location_dense.linear_layer"),
                "linear_projection": _lin(sd, f"{d}.linear_projection.linear_layer"),
                "gate_layer": _lin(sd, f"{d}.gate_layer.linear_layer"),
            },
        }
    }


def convert_torch_fastspeech2(
    state_dict: Dict[str, Any],
    encoder_layers: int,
    decoder_layers: int,
    multi_speaker: bool = True,
    postnet_convs: int = 5,
) -> Tuple[dict, dict]:
    """Reference state_dict -> (params, batch_stats) for our FastSpeech2."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}

    enc = {"src_word_emb": {"table": {"embedding": sd["encoder.src_word_emb.weight"]}}}
    if "encoder.src_accent_emb.weight" in sd:
        enc["src_accent_emb"] = {"table": {"embedding": sd["encoder.src_accent_emb.weight"]}}
    for i in range(encoder_layers):
        enc[f"layer_{i}"] = _fft_block(sd, f"encoder.layer_stack.{i}")
    params["encoder"] = enc

    dec = {}
    for i in range(decoder_layers):
        dec[f"layer_{i}"] = _fft_block(sd, f"decoder.layer_stack.{i}")
    params["decoder"] = dec

    params["variance_adaptor"] = {
        "duration_predictor": _variance_predictor(sd, "variance_adaptor.duration_predictor"),
        "pitch_predictor": _variance_predictor(sd, "variance_adaptor.pitch_predictor"),
        "energy_predictor": _variance_predictor(sd, "variance_adaptor.energy_predictor"),
        "pitch_embedding": {"embedding": sd["variance_adaptor.pitch_embedding.weight"]},
        "energy_embedding": {"embedding": sd["variance_adaptor.energy_embedding.weight"]},
    }

    params["mel_linear"] = _lin(sd, "mel_linear")

    postnet_p: Dict[str, Any] = {}
    postnet_bs: Dict[str, Any] = {}
    for i in range(postnet_convs):
        postnet_p[f"conv_{i}"] = _conv(sd, f"postnet.convolutions.{i}.0.conv")
        postnet_p[f"bn_{i}"] = {
            "scale": sd[f"postnet.convolutions.{i}.1.weight"],
            "bias": sd[f"postnet.convolutions.{i}.1.bias"],
        }
        postnet_bs[f"bn_{i}"] = {
            "mean": sd[f"postnet.convolutions.{i}.1.running_mean"],
            "var": sd[f"postnet.convolutions.{i}.1.running_var"],
        }
    params["postnet"] = postnet_p
    batch_stats["postnet"] = postnet_bs

    if "jdit.decoder.attention_rnn.weight_ih" in sd:
        params["jdit"] = convert_torch_jdit(sd)

    if multi_speaker and "speaker_emb.weight" in sd:
        params["speaker_emb"] = {"embedding": sd["speaker_emb.weight"]}
        params["speaker_enc"] = {
            "pi_linear": _lin(sd, "speaker_enc.pi_linear.0"),
            "sigma_linear": _lin(sd, "speaker_enc.sigma_linear.0"),
            "mu_linear": _lin(sd, "speaker_enc.mu_linear"),
        }

    return params, batch_stats


def load_torch_checkpoint(path: str, encoder_layers: int, decoder_layers: int,
                          multi_speaker: bool = True) -> Tuple[dict, dict]:
    """Load a reference {step}.pth.tar checkpoint file."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    sd = ckpt.get("model", ckpt)
    # strip DataParallel 'module.' prefixes (reference train.py:272-275)
    sd = {k[len("module."):] if k.startswith("module.") else k: v for k, v in sd.items()}
    return convert_torch_fastspeech2(sd, encoder_layers, decoder_layers, multi_speaker)
